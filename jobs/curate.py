#!/usr/bin/env python
"""End-to-end training-corpus curation job — the composition a
100 TB data pipeline actually ships, built entirely from the engine's
operators:

  1. score      language-ID, quality, token counts   (codegen exprs)
  2. gate       lang == --lang, quality >= --min-quality,
                token count in [--min-tokens, --max-tokens]
  3. repetition gate  Gopher/C4 rules (duplicate lines, top/dup n-gram
                ratios, symbol density) via gopher_quality().keep
  4. exact dedup  md5 fingerprint keeper per group    (short-key shuffle)
  5. near dedup   MinHash-LSH candidates → Jaccard on candidates →
                  connected components → keeper anti-join
  6. decontaminate  (--holdout) drop docs sharing any winnowing
                fingerprint with the holdout/eval corpus
  7. write      curated parquet + one JSON line of funnel stats

Every stage is a DataFrame transform; the only shuffles are the
fingerprint key, the (band, minhash) key, the candidate equi-joins and
the cluster rounds — nothing quadratic, nothing collected.

Usage:
  spark-submit --py-files dist/watermark_detector_spark.zip \
    jobs/curate.py --docs <documents.parquet> --out <dir> \
    [--lang en] [--min-quality 0.5] [--min-tokens 20] [--max-tokens 5000] \
    [--jaccard 0.5] [--no-repetition-gate] [--holdout <holdout.parquet>]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def curate(spark, docs, lang: str = "en", min_quality: float = 0.5,
           min_tokens: int = 20, max_tokens: int = 5000,
           jaccard: float = 0.5, out: str | None = None,
           repetition_gate: bool = True, holdout=None):
    """(curated DataFrame, funnel stats dict). Deterministic keeper
    rule at every stage: min doc_id survives.

    Materialization discipline (this lineage is re-read by the funnel
    counts, three shingle scans inside near-dup, the anti-join, AND the
    final write — unpersisted it would recompute the gate+hash stages
    ~7x): the exact-dedup stage is persisted for the duration of the
    run, and the curated output is materialized exactly once — written
    to ``out`` and read back when a path is given (the production
    shape: counts come from the sink, never a second pipeline run), or
    localCheckpoint'ed at fixture scale."""
    from watermark_detector_spark.functions.text import (
        fingerprint,
        lang_guess,
        quality_score,
        token_count,
    )
    from watermark_detector_spark.operators.dedup import (
        dedup_keepers,
        near_dup_pairs,
    )

    stats = {"input": docs.count()}

    scored = docs.select(
        "*",
        lang_guess(F.col("text")).alias("_lang"),
        quality_score(F.col("text")).alias("_quality"),
        token_count(F.col("text")).alias("_n_tokens"),
    )
    gated = scored.where(
        (F.col("_lang") == lang)
        & (F.col("_quality") >= min_quality)
        & F.col("_n_tokens").between(min_tokens, max_tokens)
    ).persist()
    stats["after_gate"] = gated.count()

    if repetition_gate:
        # Gopher/C4 repetition & boilerplate rules: keep-flag semi-join on
        # the doc key (metrics live in their own aggregation lineage, so
        # the wide text column never rides the n-gram shuffles)
        from watermark_detector_spark.functions.text import gopher_quality

        keep_ids = gopher_quality(gated).where("keep").select("doc_id")
        gated2 = gated.join(keep_ids, "doc_id", "left_semi").persist()
        stats["after_repetition_gate"] = gated2.count()
        gated.unpersist()
        gated = gated2

    # exact dedup: one shuffle on the md5 key, min doc_id survives
    keyed = gated.withColumn("_fp", fingerprint(F.col("text")))
    keepers = keyed.groupBy("_fp").agg(F.min("doc_id").alias("_keeper"))
    exact = (
        keyed.join(keepers, "_fp")
        .where(F.col("doc_id") == F.col("_keeper"))
        .drop("_fp", "_keeper")
        .persist()
    )
    stats["after_exact_dedup"] = exact.count()
    gated.unpersist()

    # near dedup: LSH → Jaccard-on-candidates → components → drop non-keepers
    pairs = near_dup_pairs(exact, threshold=jaccard)
    dups = dedup_keepers(pairs).where(F.col("is_duplicate")) \
        .select(F.col("node").alias("doc_id"))
    curated = exact.join(dups, "doc_id", "left_anti") \
        .drop("_lang", "_quality", "_n_tokens")
    if holdout is not None:
        # eval-set leakage gate: winnowing-fp semi-join (any shared
        # >=6-token run is caught), then anti-join on the flagged ids
        from watermark_detector_spark.operators.dedup import contaminated_ids

        # persist: the fingerprint+join lineage (the most expensive new
        # stage) would otherwise run twice — once for this count and
        # again when the anti-join materializes at write time
        flagged = contaminated_ids(curated, holdout).select("doc_id").persist()
        n_flagged = flagged.count()
        curated = curated.join(flagged, "doc_id", "left_anti")
    if out is not None:
        curated.write.mode("overwrite").parquet(out)
        curated = spark.read.parquet(out)
    else:
        curated = curated.localCheckpoint(eager=True)
    exact.unpersist()
    if holdout is not None:
        flagged.unpersist()
    final = curated.count()
    if holdout is not None:
        stats["after_near_dedup"] = final + n_flagged
        stats["decontaminated"] = n_flagged
    else:
        stats["after_near_dedup"] = final
    stats["dropped_total"] = stats["input"] - final
    return curated, stats


def main() -> None:  # pragma: no cover - CLI wrapper
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--lang", default="en")
    ap.add_argument("--min-quality", type=float, default=0.5)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--max-tokens", type=int, default=5000)
    ap.add_argument("--jaccard", type=float, default=0.5)
    ap.add_argument("--no-repetition-gate", action="store_true",
                    help="skip the Gopher/C4 repetition rules stage")
    ap.add_argument("--holdout", default=None,
                    help="parquet of eval/holdout docs (doc_id, text); "
                         "curated docs sharing any winnowing fingerprint "
                         "with it are dropped")
    args = ap.parse_args()

    from watermark_detector_spark.session import get_spark

    spark = get_spark(app_name="wmd-curate")
    _, stats = curate(
        spark, spark.read.parquet(args.docs), lang=args.lang,
        min_quality=args.min_quality, min_tokens=args.min_tokens,
        max_tokens=args.max_tokens, jaccard=args.jaccard, out=args.out,
        repetition_gate=not args.no_repetition_gate,
        holdout=(spark.read.parquet(args.holdout)
                 if args.holdout else None),
    )
    print(json.dumps({"out": args.out, **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
