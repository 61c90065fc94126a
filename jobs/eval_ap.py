#!/usr/bin/env python
"""AP-style evaluation job — precision/recall per category against the
golden detections (the COCOEvaluator analog, train_watermarks.py:197,
303-305; text spans replace boxes, span-overlap IoU replaces bbox IoU).

A prediction matches a golden row when url+sig_id agree and the span
IoU = |intersection| / |union| >= iou_threshold (0.5, the COCO default).
Run as a batch DataFrame job: join predictions ⋈ goldens on (url,
sig_id), compute overlap with pure column expressions, aggregate per
category.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def evaluate(predictions: DataFrame, golden: DataFrame,
             iou_threshold: float = 0.5) -> DataFrame:
    """predictions: (url, sig_id, category, begin, end, score kept>=0.5)
    golden:      (url, sig_id, category, begin, end, below_threshold)
    → per-category precision / recall / f1 / counts."""
    pred = predictions.select(
        "url", "sig_id", "category",
        F.col("begin").alias("p_begin"), F.col("end").alias("p_end"),
    )
    gold = golden.where(~F.col("below_threshold")).select(
        "url", "sig_id",
        F.col("category").alias("g_category"),
        F.col("begin").alias("g_begin"), F.col("end").alias("g_end"),
    )
    joined = pred.join(gold, ["url", "sig_id"], "full_outer")
    inter = F.greatest(
        F.lit(0),
        F.least("p_end", "g_end") - F.greatest("p_begin", "g_begin"),
    )
    union = (
        (F.col("p_end") - F.col("p_begin")) + (F.col("g_end") - F.col("g_begin")) - inter
    )
    iou = F.when(union > 0, inter / union).otherwise(F.lit(0.0))
    matched = (
        F.col("p_begin").isNotNull() & F.col("g_begin").isNotNull()
        & (iou >= F.lit(iou_threshold))
    )
    per = joined.select(
        F.coalesce("category", "g_category").alias("category"),
        matched.cast("int").alias("tp"),
        (F.col("p_begin").isNotNull() & ~F.coalesce(matched, F.lit(False))).cast("int").alias("fp"),
        (F.col("g_begin").isNotNull() & ~F.coalesce(matched, F.lit(False))).cast("int").alias("fn"),
    )
    agg = per.groupBy("category").agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    return agg.select(
        "category", "tp", "fp", "fn",
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fp"), F.lit(1)), 4).alias("precision"),
        F.round(F.col("tp") / F.greatest(F.col("tp") + F.col("fn"), F.lit(1)), 4).alias("recall"),
        F.round(
            2 * F.col("tp") / F.greatest(2 * F.col("tp") + F.col("fp") + F.col("fn"), F.lit(1)), 4
        ).alias("f1"),
    )


def main() -> None:  # pragma: no cover - CLI wrapper
    import argparse

    from watermark_detector_spark.functions.detect import signatures_from_df
    from watermark_detector_spark.plans.flagship import kept_detections_fused
    from watermark_detector_spark.session import get_spark
    from watermark_detector_spark.sources.pages import read_pages_batch

    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", required=True)
    ap.add_argument("--signatures", required=True)
    ap.add_argument("--golden", required=True)
    args = ap.parse_args()

    spark = get_spark(app_name="wmd-eval-ap")
    sigs = signatures_from_df(spark.read.parquet(args.signatures))
    pred = kept_detections_fused(read_pages_batch(spark, args.pages), sigs)
    res = evaluate(pred, spark.read.parquet(args.golden))
    res.orderBy("category").show(truncate=False)


if __name__ == "__main__":
    main()
