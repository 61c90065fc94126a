#!/usr/bin/env python
"""Scaling-efficiency evidence (BASELINE.json north rule: >=0.8 from N
to 4N executors). No real cluster exists in the sandbox, so the same
job runs at two parallelism levels — local[8] and local[32], identical
input and configs otherwise — in separate JVMs, and efficiency is
  eff = (throughput_32 / throughput_8) / 4.

Writes BENCH/BASELINE.md. Run: python jobs/scaling_bench.py
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# 32 first: it generates the corpus, and any OS page-cache carryover
# then benefits the SMALLER level — biasing measured efficiency DOWN
# (conservative).
LEVELS = [32, 8]


SCALING_DOCS = os.environ.get("WMD_SCALING_DOCS", "1500000")


def run_bench(cpus: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        WMD_BENCH_DOCS=SCALING_DOCS,  # CPU-bound corpus: scaling must be
        WMD_BENCH_SKIP_TESTDATA="1",  # measured on compute, not overhead
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=1800,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    results = {}
    for cpus in LEVELS:
        results[cpus] = run_bench(cpus)
        print(f"local[{cpus}]: {json.dumps(results[cpus])}", flush=True)

    lo, hi = min(LEVELS), max(LEVELS)
    rows = []
    effs = {}
    for key, label in [("docs_per_sec_batch", "flagship batch"),
                       ("docs_per_sec_stream", "flagship streaming (exactly-once sink)")]:
        t_lo, t_hi = results[lo][key], results[hi][key]
        eff = (t_hi / t_lo) / (hi / lo)
        effs[key] = eff
        rows.append((label, t_lo, t_hi, eff))

    md = [
        "# BENCH — measured throughput & scaling efficiency",
        "",
        f"Generated {datetime.now(timezone.utc).strftime('%Y-%m-%d %H:%MZ')} by "
        "`jobs/scaling_bench.py` (two separate JVMs, identical input/configs; "
        "local[8] vs local[32] is the sandbox stand-in for N vs 4N executors "
        "per the task brief).",
        "",
        f"Corpus: {results[hi]['n_docs']:,} deterministic pages "
        "(FixtureConfig, 500 Zipf-skewed domains, html payloads); "
        "pipeline = extract(html→text) → detect(25 signatures) → "
        "filter(score>=0.5) → per-domain 1-min tumbling window agg.",
        "",
        "| pipeline | docs/sec @ local[8] (N) | docs/sec @ local[32] (4N) | scaling efficiency | target |",
        "|---|---|---|---|---|",
    ]
    for label, a, b, eff in rows:
        md.append(f"| {label} | {a:,.0f} | {b:,.0f} | **{eff:.2f}** | >=0.8 |")
    md += [
        "",
        "## Per-query wall-clock (sec, sf0.1 testdata + bench corpus)",
        "",
        "| query | local[8] | local[32] |",
        "|---|---|---|",
    ]
    for q in sorted(results[hi]["queries"]):
        md.append(
            f"| {q} | {results[lo]['queries'].get(q, float('nan')):.2f} "
            f"| {results[hi]['queries'][q]:.2f} |"
        )
    md += [
        "",
        "Raw JSON:",
        "```json",
        json.dumps(results[lo]),
        json.dumps(results[hi]),
        "```",
        "",
    ]
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as fh:
        fh.write("\n".join(md))
    print(f"efficiencies: {effs}")


if __name__ == "__main__":
    main()
