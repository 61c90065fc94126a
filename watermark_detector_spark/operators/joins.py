"""Join operators: broadcast dim join, stream-static, stream-stream.

The reference's joins are O(1) single-record lookups (the random logo
pick, generate_dataset.py:111-113; the positional triple-alignment,
train_watermarks.py:44-48). The engine re-expresses them as key-based
joins with explicit distribution strategy:

- signatures are a small dimension → ALWAYS broadcast (no shuffle of the
  page stream; at 100 TB the stream side never moves for this join);
- stream-stream signature join: both sides watermarked, equi-join on
  sig_id with an event-time validity range so state is boundable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_signatures_broadcast(kept: DataFrame, signatures: DataFrame) -> DataFrame:
    """Enrich kept detections with signature attributes. Works for both
    batch and stream-static (the stream side stays un-shuffled)."""
    sig = F.broadcast(
        signatures.select(
            F.col("sig_id"),
            F.col("pattern"),
            F.col("weight").alias("sig_weight"),
            F.col("valid_from"),
        )
    )
    return kept.join(sig, "sig_id", "left")


def join_signatures_stream_stream(
    detections_stream: DataFrame,
    signatures_stream: DataFrame,
    page_watermark: str = "10 minutes",
    sig_watermark: str = "1 hour",
    validity: str = "2 hours",
) -> DataFrame:
    """Stream-stream join: a detection matches a signature version only
    within its validity window [valid_from, valid_from + validity).

    Both sides carry watermarks so Spark can evict join state: a
    signature row is dropped from state once the page-side watermark
    passes valid_from + validity (north-rule stream-stream operator;
    no reference analog — SURVEY.md §2.12)."""
    det = detections_stream.withWatermark("warc_ts", page_watermark)
    sig = (
        signatures_stream.withColumnRenamed("sig_id", "s_sig_id")
        .withWatermark("valid_from", sig_watermark)
    )
    cond = (
        (F.col("sig_id") == F.col("s_sig_id"))
        & (F.col("warc_ts") >= F.col("valid_from"))
        & (F.col("warc_ts") < F.col("valid_from") + F.expr(f"INTERVAL {validity}"))
    )
    return det.join(sig, cond, "inner").drop("s_sig_id")
