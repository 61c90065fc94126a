"""Bucketed-table co-location: eliminate the join shuffle entirely.

At 100 TB the dominant cost of a big-big equi-join is the two-sided
shuffle. Writing both tables bucketed (and optionally sorted) on the
join key lets Spark's SortMergeJoin read bucket i of A against bucket i
of B directly — ZERO Exchange in the plan (asserted in
t:test_bucketed_join_avoids_shuffle). This is the batch analog of
co-partitioned state in streaming: pay the partitioning once at write
time, reuse it on every subsequent join/agg on that key.

Bucketed writes require the table catalog (``saveAsTable``); plain
``.parquet()`` paths cannot carry bucket metadata.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, path: str, key: str,
                   n_buckets: int = 32, sort: bool = True) -> None:
    """Persist ``df`` bucketed (and sorted) by ``key`` as a catalog
    table at ``path``. n_buckets should match across tables that will
    join (bucket counts must be equal or multiples for co-location)."""
    writer = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort:
        writer = writer.sortBy(key)
    writer.option("path", path).saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  key: str) -> DataFrame:
    """Join two co-bucketed catalog tables on their bucket key — planned
    as a shuffle-free SortMergeJoin when bucket specs line up."""
    return spark.table(left_table).join(spark.table(right_table), key)
