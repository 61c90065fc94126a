"""Data-layout operators: Z-order (Morton) clustering keys.

At 100 TB the scan is the query: parquet files whose footer min/max
ranges are TIGHT on the filter columns let the reader skip whole files
(and row groups) before any compute. A plain sort optimizes one
column's ranges at the expense of every other; interleaving the bits
of k normalized columns (the Z-order / Morton curve, the same layout
Delta's OPTIMIZE ZORDER BY and Iceberg's sort-order rewrite use) keeps
ALL k columns' per-file ranges simultaneously narrow, so multi-
dimensional point/range filters prune on every axis.

No reference analog (the reference reads its dataset whole,
train_watermarks.py:60-75); this is engine infrastructure the 100 TB
deployment needs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double",
            "date", "timestamp", "timestamp_ntz"}


def zorder_key(df: DataFrame, cols: list[str], bits: int = 16) -> Column:
    """Morton key over ``cols``: each column is normalized to a
    ``bits``-wide bucket, buckets are bit-interleaved LSB-first.

    Normalization is min/max linear for numeric/temporal columns (one
    tiny driver-side agg — 2k scalars) and a 64-bit hash truncation for
    everything else (hash buckets lose RANGE locality but still
    co-cluster equal values, which is what equality-filter pruning
    needs). The whole key is codegen'd expression work — no UDF."""
    if not cols:
        raise ValueError("zorder_key needs at least one column")
    if bits < 1 or bits * len(cols) > 63:
        raise ValueError(
            f"bits * len(cols) must fit a signed 64-bit key, got "
            f"{bits} * {len(cols)}")
    dts = dict(df.dtypes)
    aggs = []
    num_cols = [c for c in cols if dts[c].split("(")[0] in _NUMERIC]
    for c in num_cols:
        v = F.col(c).cast("timestamp").cast("double") \
            if dts[c].startswith("timestamp") else F.col(c).cast("double")
        aggs += [F.min(v).alias(f"_lo_{c}"), F.max(v).alias(f"_hi_{c}")]
    bounds = df.agg(*aggs).collect()[0].asDict() if aggs else {}

    top = (1 << bits) - 1
    buckets = []
    for c in cols:
        if c in num_cols:
            lo, hi = bounds[f"_lo_{c}"], bounds[f"_hi_{c}"]
            v = F.col(c).cast("timestamp").cast("double") \
                if dts[c].startswith("timestamp") else F.col(c).cast("double")
            if lo is None or hi is None or hi <= lo:
                b = F.lit(0).cast("long")  # constant/empty/all-null column
            else:
                b = F.least(
                    F.lit(top),
                    F.floor((v - F.lit(float(lo)))
                            / F.lit((hi - lo)) * (top + 1)).cast("long"),
                )
            b = F.coalesce(b, F.lit(0).cast("long"))  # nulls sort first
        else:
            b = F.pmod(F.xxhash64(F.col(c)), F.lit(top + 1)).cast("long")
        buckets.append(b)

    k = len(buckets)
    terms = []
    for i in range(bits):
        for j, b in enumerate(buckets):
            # bit i of bucket j lands at interleaved position i*k + j
            terms.append(
                F.shiftleft(
                    F.shiftright(b, i).bitwiseAND(F.lit(1)), i * k + j))
    return reduce(lambda a, t: a.bitwiseOR(t), terms).alias("_zkey")


def zorder_repartition(df: DataFrame, cols: list[str], n_files: int,
                       bits: int = 16) -> DataFrame:
    """Range-partition + sort the frame along the Morton curve so each
    output partition (= parquet file on write) covers a tight
    hyper-rectangle of ``cols``. The key column is internal and
    dropped."""
    key = zorder_key(df, cols, bits)
    return (
        df.withColumn("_zkey", key)
        .repartitionByRange(n_files, "_zkey")
        .sortWithinPartitions("_zkey")
        .drop("_zkey")
    )
