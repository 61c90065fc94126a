"""Deterministic fixture generator — the analog of generate_dataset.py.

The reference composites known logos/words onto photos and derives
ground truth from the construction itself (solve_mask,
generate_dataset.py:138-154). Here: known signature phrases are spliced
into synthetic documents at recorded offsets, and the golden tables are
derived from the splice log — NOT by running the detector — so the
pipeline tests are non-tautological.

Every pseudo-random choice is ``stable_hash(seed, doc_id, field)``
(the reference never seeds ``random`` — generate_dataset.py:44-67 — and
is therefore unreproducible; we fix that so golden tests are possible at
any parallelism).

Splice variants mirror the reference's compositing transforms:
- exact   — plain composite (alpha=1 blend, generate_dataset.py:126-133)
- mangle  — digits perturbed (digit-string words p=0.25, generate_dataset.py:53-54)
- trunc   — phrase cut at doc end (border-rotation occlusion, generate_dataset.py:62-71)
- double  — two adjacent copies, gap <= MERGE_GAP (exercises the
            dilation/region-merge analog, train_watermarks.py:65-67)
Docs without splices are the guaranteed negatives (the stitched clean
twin, generate_dataset.py:192-201).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from datetime import datetime, timedelta

import pandas as pd

from .functions.core import (
    MERGE_GAP,
    SCORE_THRESHOLD,
    Signature,
    make_signatures,
    render_html,
    span_score,
    stable_hash,
    stable_unit,
)

# Document vocabulary — alphabetic only, disjoint from SIG_VOCAB and from
# the wm###sig anchor namespace, so matches are unambiguous by construction.
DOC_VOCAB = [
    "lorem", "ipsum", "dolor", "amet", "consectetur", "adipiscing", "elit",
    "sed", "eiusmod", "tempor", "incididunt", "labore", "dolore", "magna",
    "aliqua", "enim", "minim", "veniam", "quis", "nostrud", "exercitation",
    "ullamco", "laboris", "nisi", "aliquip", "commodo", "consequat", "duis",
    "aute", "irure", "reprehenderit", "voluptate", "velit", "esse", "cillum",
    "fugiat", "nulla", "pariatur", "excepteur", "sint", "occaecat",
    "cupidatat", "non", "proident", "sunt", "culpa", "officia", "deserunt",
    "mollit", "anim", "laborum", "vero", "accusamus", "iusto", "odio",
    "dignissimos", "ducimus", "blanditiis", "praesentium", "voluptatum",
]

LANGS = ["en", "es", "de", "fr", "pt"]
BASE_TS = datetime(2025, 2, 17, 0, 0, 0)  # UTC, tz-naive (session TZ=UTC)


@dataclass
class FixtureConfig:
    seed: int = 42
    n_docs: int = 2000
    n_domains: int = 50
    n_sigs: int = 25
    span_s: int = 7200  # 2 hours of warc_ts
    n_batches: int = 8  # stream replay micro-batches
    watermark_delay_s: int = 600  # 10 minutes
    window_s: int = 60  # tumbling window width
    late_frac: float = 0.02
    late_shift_s: int = 4500  # 75 min — guarantees drop (see golden rule below)
    min_words: int = 40  # doc length band; bench uses bigger (CC-realistic) docs
    max_words: int = 120
    signatures: list[Signature] = field(default_factory=list)

    def __post_init__(self):
        if not self.signatures:
            self.signatures = make_signatures(self.n_sigs, self.seed)


def _domains(cfg: FixtureConfig) -> list[str]:
    # every 7th domain is a multi-part-suffix domain (exercises
    # registrable_domain's co.uk rule)
    return [
        f"site{i:03d}.co.uk" if i % 7 == 3 else f"site{i:03d}.com"
        for i in range(cfg.n_domains)
    ]


def _pick_domain(cfg: FixtureConfig, domains: list[str], doc_id: int) -> str:
    """Zipf-skewed domain pick: head domains carry a large share of pages
    (exercises salting/AQE skew handling at scale)."""
    weights = [1.0 / (i + 1) for i in range(len(domains))]
    total = sum(weights)
    u = stable_unit(cfg.seed, doc_id, "dom") * total
    acc = 0.0
    for i, w in enumerate(weights):
        acc += w
        if u <= acc:
            return domains[i]
    return domains[-1]


def _mangle_digits(tok: str, seed: int, doc_id: int, k: int) -> str:
    # each digit shifted by 1..9 mod 10 — always differs from the original
    return "".join(
        str((int(c) + 1 + stable_hash(seed, doc_id, k, "mg", j) % 9) % 10)
        for j, c in enumerate(tok)
    )


def gen_doc(doc_id: int, cfg: FixtureConfig, domains: list[str]) -> dict:
    """One deterministic document + its splice log."""
    h = lambda *p: stable_hash(cfg.seed, doc_id, *p)
    u = lambda *p: stable_unit(cfg.seed, doc_id, *p)

    domain = _pick_domain(cfg, domains, doc_id)
    sub = ["www", "news", "blog"][h("sub") % 3]
    url = f"https://{sub}.{domain}/p/{doc_id}"
    lang = LANGS[h("lang") % len(LANGS)]

    # --- event time ---
    nominal_off = u("ts") * cfg.span_s
    if u("snap") < 0.05:  # boundary rows exactly on window edges
        nominal_off = float(int(nominal_off // cfg.window_s) * cfg.window_s)
    batch_id = min(int(nominal_off / cfg.span_s * cfg.n_batches), cfg.n_batches - 1)
    is_late = batch_id >= 2 and u("late") < cfg.late_frac
    actual_off = nominal_off - cfg.late_shift_s if is_late else nominal_off
    warc_ts = BASE_TS + timedelta(seconds=actual_off)

    # --- body words ---
    n_words = cfg.min_words + h("nw") % (cfg.max_words - cfg.min_words + 1)
    words = [DOC_VOCAB[h("w", i) % len(DOC_VOCAB)] for i in range(n_words)]

    # --- splice plan ---
    splice_specs: list[tuple[Signature, str]] = []  # (sig, kind)
    if u("hassplice") < 0.6:
        n_spl = 1 + h("nspl") % 3
        sig_ids: list[int] = []
        for k in range(n_spl):
            sid = h("sig", k) % cfg.n_sigs
            while sid in sig_ids:  # distinct sigs per doc (merge is same-sig only)
                sid = (sid + 1) % cfg.n_sigs
            sig_ids.append(sid)
            uk = u("kind", k)
            if uk < 0.25:
                kind = "mangle"
            elif uk < 0.32 and k == n_spl - 1:
                kind = "trunc"  # truncation only at doc end
            elif uk < 0.45:
                kind = "double"
            else:
                kind = "exact"
            splice_specs.append((cfg.signatures[sid], kind))

    # --- assemble tokens; record splice token ranges ---
    tokens: list[str] = []
    ranges: list[tuple[int, int, Signature, str, int]] = []  # tok_begin, tok_end, sig, kind, n_kept
    n_mid = len(splice_specs)
    # insertion points: evenly spaced cut positions, >=2 words apart
    cuts = [
        2 + int((n_words - 4) * (j + 1) / (n_mid + 1)) for j in range(n_mid)
    ] if n_mid else []
    prev = 0
    for j, (sig, kind) in enumerate(splice_specs):
        cut = cuts[j]
        tokens.extend(words[prev:cut])
        prev = cut
        if kind == "trunc":
            continue  # handled at end
        start_tok = len(tokens)
        if kind == "exact":
            ptoks, n_kept = list(sig.tokens), len(sig.tokens)
        elif kind == "mangle":
            ptoks = list(sig.tokens)
            ptoks[-1] = _mangle_digits(ptoks[-1], cfg.seed, doc_id, j)
            n_kept = len(sig.tokens)
        else:  # double — two adjacent copies, short separator (gap<=MERGE_GAP)
            ptoks = list(sig.tokens) + ["//"] + list(sig.tokens)
            n_kept = len(sig.tokens)
        tokens.extend(ptoks)
        ranges.append((start_tok, len(tokens), sig, kind, n_kept))
    tokens.extend(words[prev:])
    for sig, kind in splice_specs:
        if kind == "trunc":
            n_keep = 2 + h("tk") % (len(sig.tokens) - 2)  # 2..n_tokens-1
            start_tok = len(tokens)
            tokens.extend(sig.tokens[:n_keep])
            ranges.append((start_tok, len(tokens), sig, kind, n_keep))

    # --- char offsets ---
    offs = [0] * (len(tokens) + 1)
    for i, t in enumerate(tokens):
        offs[i + 1] = offs[i] + len(t) + 1  # +1 for the joining space
    text = " ".join(tokens)

    splices = []
    for tok_b, tok_e, sig, kind, n_kept in ranges:
        begin = offs[tok_b]
        end = offs[tok_e] - 1  # drop trailing join-space
        digit_exact = kind != "mangle"
        score = span_score(sig.weight, n_kept, len(sig.tokens), digit_exact)
        splices.append(
            {
                "sig_id": sig.sig_id,
                "category": sig.category,
                "begin": begin,
                "end": end,
                "score": score,
                "kind": kind,
                "below_threshold": score < SCORE_THRESHOLD,
            }
        )
    splices.sort(key=lambda s: (s["begin"], s["sig_id"]))

    return {
        "doc_id": doc_id,
        "url": url,
        "domain": domain,
        "warc_ts": warc_ts,
        "html": render_html(url, doc_id, text, lang),
        "text": text,
        "lang": lang,
        "batch_id": batch_id,
        "is_late": is_late,
        "splices": splices,
    }


def _flush_doc(cfg: FixtureConfig, domains: list[str]) -> dict:
    """Stream-end sentinel: a page whose (kept) detection advances the
    event-time watermark past every real window. warc_ts is far beyond
    the fixture span so its own window can never collide with goldens."""
    sig = cfg.signatures[0]
    prefix = "lorem ipsum "
    text = prefix + sig.pattern + " dolor"
    ts = BASE_TS + timedelta(seconds=cfg.span_s + 3 * cfg.watermark_delay_s)
    url = f"https://www.{domains[0]}/flush/0"
    return {
        "url": url,
        "warc_ts": ts,
        "html": render_html(url, -1, text, "en"),
        "text": text,
        "lang": "en",
    }


# ---------------------------------------------------------------------------
# Golden-table derivation (from the splice log — never from the detector)
# ---------------------------------------------------------------------------


def _window_start(ts: datetime, window_s: int) -> datetime:
    epoch = (ts - BASE_TS).total_seconds()
    return BASE_TS + timedelta(seconds=(epoch // window_s) * window_s)


def golden_windows(docs: list[dict], cfg: FixtureConfig, exclude_late: bool) -> pd.DataFrame:
    """Per-(domain, tumbling window) aggregates over KEPT detections
    (score >= 0.5). ``exclude_late=True`` is the streaming golden: late
    rows are dropped by the event-time watermark.

    Drop rule justification: a late row's window_end = shifted_ts + 60s
    <= nominal_ts - late_shift + 60s, while the watermark when its batch
    runs is >= (max event time of earlier batches) - delay
    >= nominal_ts - span/n_batches - delay. With late_shift=4500s,
    span/n_batches=900s, delay=600s: window_end is ~49 min older than the
    watermark -> guaranteed dropped (Spark drops a row when its window
    end <= current watermark)."""
    rows = []
    for d in docs:
        if exclude_late and d["is_late"]:
            continue
        kept = [s for s in d["splices"] if s["score"] >= SCORE_THRESHOLD]
        if not kept:
            continue
        ws = _window_start(d["warc_ts"], cfg.window_s)
        for s in kept:
            rows.append(
                {
                    "domain": d["domain"],
                    "window_start": ws,
                    "url": d["url"],
                    "score": s["score"],
                    "category": s["category"],
                }
            )
    if not rows:
        return pd.DataFrame(
            columns=["domain", "window_start", "window_end", "n_docs",
                     "n_detections", "avg_score", "n_watermark", "n_text"]
        )
    df = pd.DataFrame(rows)
    g = df.groupby(["domain", "window_start"])
    out = g.agg(
        n_docs=("url", "nunique"),
        n_detections=("score", "size"),
        avg_score=("score", "mean"),
        n_watermark=("category", lambda c: int((c == "watermark").sum())),
        n_text=("category", lambda c: int((c == "text").sum())),
    ).reset_index()
    out["window_end"] = out["window_start"] + pd.Timedelta(seconds=cfg.window_s)
    return out[
        ["domain", "window_start", "window_end", "n_docs", "n_detections",
         "avg_score", "n_watermark", "n_text"]
    ]


# ---------------------------------------------------------------------------
# Materialization
# ---------------------------------------------------------------------------


def generate(cfg: FixtureConfig, out_dir: str) -> dict[str, str]:
    """Generate all fixture tables to ``out_dir`` (pandas/pyarrow path —
    driver-side, for test scale; use ``generate_pages_spark`` for bench
    scale). Returns {table_name: path}."""
    os.makedirs(out_dir, exist_ok=True)
    domains = _domains(cfg)
    docs = [gen_doc(i, cfg, domains) for i in range(cfg.n_docs)]

    paths: dict[str, str] = {}

    def _us(df: pd.DataFrame) -> pd.DataFrame:
        # Spark's TimestampType is microsecond-precision; pandas defaults to ns
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype("datetime64[us]")
        return df

    def _write(name: str, df: pd.DataFrame):
        p = os.path.join(out_dir, f"{name}.parquet")
        _us(df).to_parquet(p, index=False)
        paths[name] = p

    pages = pd.DataFrame(
        [{k: d[k] for k in ("url", "warc_ts", "html", "text", "lang")} for d in docs]
    )
    _write("pages", pages)

    # stream replay: one parquet per micro-batch, mtimes strictly increasing
    stream_dir = os.path.join(out_dir, "pages_stream")
    os.makedirs(stream_dir, exist_ok=True)
    paths["pages_stream"] = stream_dir
    pages_b = pd.DataFrame(
        [
            {k: d[k] for k in ("url", "warc_ts", "html", "text", "lang", "batch_id")}
            for d in docs
        ]
    )
    for b in range(cfg.n_batches):
        part = pages_b[pages_b.batch_id == b].drop(columns=["batch_id"])
        fp = os.path.join(stream_dir, f"batch_{b:04d}.parquet")
        _us(part).to_parquet(fp, index=False)
        os.utime(fp, (1700000000 + b, 1700000000 + b))  # deterministic order

    # final "flush" batch: one far-future page with a kept detection.
    # In append mode a window is only emitted once the watermark passes
    # its end; this row pushes the watermark past every real window so a
    # finite availableNow run emits them all. Its OWN window stays in
    # state forever → it appears in no golden (stream-only sentinel).
    flush = _flush_doc(cfg, domains)
    fp = os.path.join(stream_dir, f"batch_{cfg.n_batches:04d}.parquet")
    _us(
        pd.DataFrame([{k: flush[k] for k in ("url", "warc_ts", "html", "text", "lang")}])
    ).to_parquet(fp, index=False)
    os.utime(fp, (1700000000 + cfg.n_batches, 1700000000 + cfg.n_batches))

    sigs = pd.DataFrame(
        [
            {
                "sig_id": s.sig_id,
                "pattern": s.pattern,
                "category": s.category,
                "weight": s.weight,
                "valid_from": BASE_TS + timedelta(seconds=s.valid_from_offset_s),
            }
            for s in cfg.signatures
        ]
    )
    _write("signatures", sigs)

    _write(
        "golden_extract",
        pd.DataFrame(
            [{"url": d["url"], "text_bytes": d["text"].encode("utf-8")} for d in docs]
        ),
    )

    gd_rows = [
        {
            "url": d["url"],
            "sig_id": s["sig_id"],
            "category": s["category"],
            "begin": s["begin"],
            "end": s["end"],
            "score": s["score"],
            "below_threshold": s["below_threshold"],
        }
        for d in docs
        for s in d["splices"]
    ]
    _write("golden_detections", pd.DataFrame(
        gd_rows,
        columns=["url", "sig_id", "category", "begin", "end", "score", "below_threshold"],
    ))

    _write("golden_windows", golden_windows(docs, cfg, exclude_late=False))
    _write("golden_windows_stream", golden_windows(docs, cfg, exclude_late=True))

    # splice log (debug/eval)
    _write(
        "splices",
        pd.DataFrame(
            [
                {"url": d["url"], "domain": d["domain"], "warc_ts": d["warc_ts"],
                 "is_late": d["is_late"], "batch_id": d["batch_id"], **s}
                for d in docs
                for s in d["splices"]
            ],
            columns=["url", "domain", "warc_ts", "is_late", "batch_id", "sig_id",
                     "category", "begin", "end", "score", "kind", "below_threshold"],
        ),
    )
    return paths


def generate_pages_spark(spark, cfg: FixtureConfig, out_path: str, n_partitions: int = 32):
    """Distributed generation for bench scale — mapInPandas over
    spark.range; deterministic per doc_id at any parallelism (unlike the
    reference, which depends on listing order + unseeded RNG)."""
    domains = _domains(cfg)

    def _gen(batches):
        for pdf in batches:
            rows = [gen_doc(int(i), cfg, domains) for i in pdf["id"]]
            yield pd.DataFrame(
                [{k: d[k] for k in ("url", "warc_ts", "html", "text", "lang")} for d in rows]
            )

    (
        spark.range(cfg.n_docs)
        .repartition(n_partitions)
        .mapInPandas(_gen, schema="url string, warc_ts timestamp, html binary, text string, lang string")
        .write.mode("overwrite")
        .parquet(out_path)
    )
    return out_path
