"""Window operators: tumbling / sliding / session — built-in Spark
primitives, declared once for batch and streaming.

Session windows are the cross-document analog of the reference's
dilation-gap region merging (train_watermarks.py:65-67): adjacent
activity within `gap` fuses into one region/session (SURVEY.md A2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _agg(grouped) -> DataFrame:
    return grouped.agg(
        F.count(F.lit(1)).alias("n_detections"),
        F.avg("score").alias("avg_score"),
        F.max("score").alias("max_score"),
        F.sum(F.when(F.col("category") == "watermark", 1).otherwise(0)).alias("n_watermark"),
        F.sum(F.when(F.col("category") == "text", 1).otherwise(0)).alias("n_text"),
    )


def tumbling(kept: DataFrame, width: str = "1 minute",
             watermark: str | None = None) -> DataFrame:
    df = kept.withWatermark("warc_ts", watermark) if watermark else kept
    return _agg(df.groupBy(F.window("warc_ts", width).alias("window"), "domain")).select(
        "domain", F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_detections", "avg_score", "max_score", "n_watermark", "n_text",
    )


def sliding(kept: DataFrame, width: str = "5 minutes", slide: str = "1 minute",
            watermark: str | None = None) -> DataFrame:
    df = kept.withWatermark("warc_ts", watermark) if watermark else kept
    return _agg(
        df.groupBy(F.window("warc_ts", width, slide).alias("window"), "domain")
    ).select(
        "domain", F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_detections", "avg_score", "max_score", "n_watermark", "n_text",
    )


def session(kept: DataFrame, gap: str = "5 minutes",
            watermark: str | None = None) -> DataFrame:
    """Built-in session windows (F.session_window). In streaming this
    REQUIRES a watermark (state must be evictable)."""
    df = kept.withWatermark("warc_ts", watermark) if watermark else kept
    return _agg(
        df.groupBy(F.session_window("warc_ts", gap).alias("window"), "domain")
    ).select(
        "domain", F.col("window.start").alias("session_start"),
        F.col("window.end").alias("session_end"),
        "n_detections", "avg_score", "max_score", "n_watermark", "n_text",
    )
