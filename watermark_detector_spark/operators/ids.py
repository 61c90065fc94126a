"""Contiguous global ID assignment without a single-reducer sort.

Training-data pipelines need dense 0..N-1 row ids (shard manifests,
example indices for curriculum ordering, stable sample references).
The naive Spark expression — ``row_number() OVER (ORDER BY k)`` with
no PARTITION BY — range-shuffles everything into ONE window partition:
a single task numbers all 10^12 rows. ``monotonically_increasing_id``
is parallel but leaves ~2^33-sized gaps between partitions, so ids are
neither dense nor stable under repartitioning.

The scalable two-pass shape (the RDD ``zipWithIndex`` design,
re-expressed on DataFrames so Catalyst keeps column pruning and
codegen):

1. range-repartition on the order key (disjoint, ordered ranges) and
   sort within partitions — every partition p holds a contiguous slice
   of the global order;
2. count rows per partition (a cheap agg over spark_partition_id — P
   numbers to the driver, nothing else);
3. prefix-sum those counts into per-partition offsets and assign
   ``offset[p] + local_index`` in one mapInPandas pass that streams
   Arrow batches, keeping a running counter per partition.

Correctness does not depend on WHERE the range sampler places the
partition boundaries — any disjoint ordered ranges give the same final
ids — so the result is deterministic for a unique order key even
though RangePartitioner samples its boundaries.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_contiguous_ids(
    df: DataFrame,
    order_col: str,
    id_name: str = "seq_id",
    num_partitions: int | None = None,
    stable: bool = True,
) -> DataFrame:
    """Add ``id_name`` = dense rank 0..N-1 of each row in ``order_col``
    order (the key must be globally unique — with duplicates the order,
    and hence the ids, would be underdetermined). Equivalent to
    ``ROW_NUMBER() OVER (ORDER BY order_col) - 1`` but with no
    single-partition window: the plan is one range Exchange + local
    sorts + a driver-side P-row count collect.

    ``stable=True`` (default) pins the ranged distribution with a
    ``localCheckpoint`` so the count pass and the assign pass read the
    SAME materialized blocks. Without it, the two passes re-execute the
    lineage and the range sampler can cut different boundaries between
    them — not only for overtly nondeterministic inputs: even a
    deterministic round-robin ``repartition()`` upstream changes its
    row order under the count pass's column pruning (round-robin's
    determinism sort hashes the pruned row), which reseeds the range
    sample and silently shifts every id. The per-partition guard below
    turns that into a loud error; ``stable=False`` is for provably
    order-stable lineage (e.g. a bare file scan) where skipping the
    materialization matters."""
    if id_name in df.columns:
        raise ValueError(f"column {id_name!r} already exists")
    parts = [F.col(order_col)]
    ranged = (
        df.repartitionByRange(num_partitions, *parts)
        if num_partitions
        else df.repartitionByRange(*parts)
    ).sortWithinPartitions(order_col)
    with_pid = ranged.withColumn("__pid", F.spark_partition_id())
    if stable:
        # materialized once, read by both passes; executor-local
        # (non-replicated) storage — on a real cluster pair with
        # spark.cleaner settings / reliable checkpoint if executor
        # loss during the two jobs must be survivable
        with_pid = with_pid.localCheckpoint(eager=False)
    counts = {
        r["__pid"]: r["n"]
        for r in with_pid.groupBy("__pid").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    offsets = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    out_schema = StructType(
        df.schema.fields + [StructField(id_name, LongType(), False)]
    )
    cols = df.columns

    def _assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one call per partition; Arrow batches arrive in the
        # partition's sorted order, so a running counter is the local
        # row index. The partition id comes from the TASK (not the
        # data), so even a partition that re-executes to ZERO rows is
        # checked against its count-pass tally below.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else None
        local = 0
        for b in batches:
            if len(b) == 0:
                continue
            if pid is None:  # defensive: no TaskContext (local iterator)
                pid = int(b["__pid"].iloc[0])
            base = offsets.get(pid)
            if base is None:
                raise RuntimeError(
                    f"assign_contiguous_ids: partition {pid} has rows "
                    "in the assign pass but was empty in the count "
                    "pass — upstream lineage is not deterministic; "
                    "persist() the input and retry")
            out = b[cols].copy()
            out[id_name] = range(base + local, base + local + len(b))
            local += len(b)
            yield out
        # both passes re-run the lineage (RDD zipWithIndex contract):
        # if the second execution landed a different row count in this
        # partition (nondeterministic upstream, e.g. an unseeded
        # sample), ids would silently collide/gap — fail loudly instead
        if pid is not None and local != counts.get(pid, 0):
            raise RuntimeError(
                f"assign_contiguous_ids: partition {pid} held "
                f"{counts.get(pid, 0)} rows in the count pass but "
                f"{local} in the assign pass — upstream lineage is not "
                "deterministic; persist() the input and retry")

    # pass 2 re-sorts the same ranged distribution (the exchange is
    # reused from pass 1 only if `ranged` was persisted; at P counts
    # per job both passes stay scan-bound either way)
    return with_pid.mapInPandas(_assign, schema=out_schema)


def bottomk_sample(
    df: DataFrame, k: int, key_col: str = "doc_id", seed: str = "s0"
) -> DataFrame:
    """Deterministic uniform sample of exactly ``k`` rows: keep the k
    smallest md5(seed || key) values — the distributed "bottom-k by
    random hash" equivalent of reservoir sampling (every key equally
    likely, no RNG state, re-runs and other engines select the SAME
    rows). ``key_col`` must be unique: duplicate keys share one md5
    priority, and if that value straddles the k-th position the
    tie-break among the duplicates is arbitrary (run- and
    engine-dependent). Plans as TakeOrderedAndProject: per-partition
    top-k heaps merged on the driver, no global sort Exchange — k rows
    cross the wire per partition, nothing else."""
    if k < 1:
        raise ValueError("k must be >= 1")
    pri = F.md5(F.concat(F.lit(seed), F.lit(":"),
                         F.col(key_col).cast("string")))
    return df.orderBy(pri.asc()).limit(k)


def shard_assign(df: DataFrame, shard_size: int,
                 key_col: str = "doc_id", seed: str = "s0",
                 num_partitions: int | None = None) -> DataFrame:
    """Training-data export layout: deterministic global permutation +
    dense example ids + fixed-size shard assignment, in one pass.

    Rows are ordered by md5(seed:key) — a reproducible pseudo-random
    shuffle (training-order decorrelation without rand()) — numbered
    densely via :func:`assign_contiguous_ids`, and assigned
    ``shard_id = seq_id // shard_size``: every shard holds exactly
    ``shard_size`` examples except the last. Because both the
    permutation and the numbering are pure functions of the keys, two
    runs (or two engines) produce byte-identical shard contents — the
    property a resumable 10^12-doc export job needs.

    Adds columns ``seq_id`` and ``shard_id``; the ``__ord`` sort key
    is dropped. Writing then partitions by shard_id
    (``.repartition("shard_id").write.partitionBy("shard_id")``), each
    shard a contiguous slice of the global permutation."""
    if shard_size < 1:
        raise ValueError("shard_assign: shard_size must be >= 1")
    ordered = df.withColumn(
        "__ord",
        F.md5(F.concat(F.lit(seed + ":"), F.col(key_col).cast("string"))),
    )
    withids = assign_contiguous_ids(
        ordered, "__ord", id_name="seq_id", num_partitions=num_partitions
    )
    return withids.drop("__ord").withColumn(
        "shard_id", F.floor(F.col("seq_id") / shard_size).cast("bigint")
    )
