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

from pyspark.sql import Column, DataFrame
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


def asof_join(left: DataFrame, right: DataFrame, on: str, left_ts: str,
              right_ts: str, right_value_cols: list[str] | None = None) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_ts <= left_ts (same key). Spark has no native ASOF; the
    scalable shape is union + one window pass (single sort-shuffle on
    the key — NO quadratic join, no per-group pandas):

      union(left tagged 1, right tagged 0)
        → window last(right cols, ignorenulls) over
          (partition by key order by ts, tag rows unbounded preceding)
        → keep left rows.

    Ties (right_ts == left_ts) count as matched (tag orders right rows
    first)."""
    from pyspark.sql.window import Window as W

    right_value_cols = right_value_cols or []
    lcols = [c for c in left.columns]
    l = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.lit(None).cast("timestamp").alias("_r_ts"),
        *[F.lit(None).cast(dict(right.dtypes)[c]).alias(f"_r_{c}") for c in right_value_cols],
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) if c != on else F.col(on)
          for c in lcols],
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.col(right_ts).alias("_r_ts"),
        *[F.col(c).alias(f"_r_{c}") for c in right_value_cols],
    )
    w = (
        W.partitionBy(on)
        .orderBy(F.asc("_ts"), F.asc("_tag"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    out = (
        l.unionByName(r)
        .withColumn("_asof_ts", F.last("_r_ts", ignorenulls=True).over(w))
        .select(
            *lcols,
            F.col("_asof_ts"),
            *[F.last(f"_r_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
              for c in right_value_cols],
            "_tag",
        )
        .where(F.col("_tag") == 1)
        .drop("_tag")
        .withColumnRenamed("_asof_ts", "asof_ts")
    )
    return out


def range_join(points: DataFrame, intervals: DataFrame, point_ts: str,
               start_ts: str, end_ts: str, bucket_s: int = 900,
               on: str | None = None) -> DataFrame:
    """Point-in-interval range join: every (point, interval) pair with
    ``start_ts <= point_ts < end_ts`` (half-open), optionally also
    equi-matched on ``on``. Spark plans a bare range predicate as
    BroadcastNestedLoopJoin / CartesianProduct — quadratic, a
    non-starter at scale. The scalable shape is time-bucketization
    (the standard interval-join decomposition, same trick Structured
    Streaming uses for stream-stream interval state):

      - every interval row is exploded to the bucket indices its
        [start, end) span covers (``sequence`` on floor-divided epochs
        — duplication factor = ceil(span / bucket), small when bucket
        is chosen near the typical span);
      - every point row gets its single bucket index;
      - equi-join on (bucket [, on]) — a plain shuffled/broadcast hash
        join Catalyst can optimize — then the exact residual range
        predicate.

    A point's bucket is covered by every interval that might contain
    it, and each qualifying (point, interval) pair meets in EXACTLY one
    bucket (the point's own), so no post-join dedup is needed.
    Intervals with end <= start cover no buckets and are dropped (also
    guards Spark's descending ``sequence(a, b)`` when b < a).

    Interval columns come back prefixed ``iv_`` so both sides can carry
    a ``ts``-style name without collision."""
    if bucket_s <= 0:
        raise ValueError(f"bucket_s must be positive, got {bucket_s}")
    b_us = F.lit(int(bucket_s) * 1_000_000)

    # Bucket at MICROsecond granularity (a second-granularity floor
    # truncates fractional end timestamps and can drop the final
    # bucket). Parquet event times arrive as TIMESTAMP_NTZ, which
    # unix_micros rejects; NTZ -> TIMESTAMP (session tz, pinned UTC
    # engine-wide) first.
    def _us(c: str) -> Column:
        return F.unix_micros(F.col(c).cast("timestamp"))

    def _fdiv(a: Column, b: Column) -> Column:
        # exact integer floor-div (Column has no //; double division
        # rounds at bucket edges): a - pmod(a,b) is exactly divisible
        # and <= 2^53, so the double quotient is exact
        return ((a - F.pmod(a, b)) / b).cast("long")

    p_b = _fdiv(_us(point_ts), b_us)
    iv = (
        intervals.where(F.col(end_ts) > F.col(start_ts))
        .select(
            *[F.col(c).alias(f"iv_{c}") for c in intervals.columns],
            F.explode(
                F.sequence(
                    _fdiv(_us(start_ts), b_us),
                    # end is EXCLUSIVE: an interval ending exactly on a
                    # bucket boundary does not cover that bucket
                    _fdiv(_us(end_ts) - 1, b_us),
                )
            ).alias("_bucket"),
        )
    )
    pts = points.withColumn("_bucket", p_b)
    keys = ["_bucket"] if on is None else ["_bucket", on]
    if on is not None:
        iv = iv.withColumnRenamed(f"iv_{on}", on)
    out = (
        pts.join(iv, keys)
        .where(
            (F.col(point_ts) >= F.col(f"iv_{start_ts}"))
            & (F.col(point_ts) < F.col(f"iv_{end_ts}"))
        )
        .drop("_bucket")
    )
    return out


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
