"""Structured-Streaming SOURCE over the exactly-once parquet sink.

The reference's file sink is write-only; downstream jobs re-scan it.
This module closes the loop the way Delta/Iceberg do — a committed
table is *itself* a streaming source (Delta's ``readStream.format
("delta")``, Iceberg's incremental append scan): the sink's manifest
ledger IS the offset log, so a downstream pipeline tails the table and
sees each appended batch exactly once, surviving restarts via the
normal streaming checkpoint.

Reference parity: reedless/watermark-detector has no table-tailing
source (its sinks are terminal, src/sink/*); this is the scale-path
addition that lets curation stages chain as independent streaming jobs
(ingest -> sink A -> gate -> sink B) instead of one monolithic query.

Design notes (why this is trivially exactly-once where warcish needed
care): offsets are COMMITTED BATCH IDS, not file names. A batch id is
published atomically by the sink's manifest rename after its parquet
files are fully written, ids are monotone (MicroBatchExecution commits
in order), and batch dirs are immutable — so a checkpoint replay of
``(start, end]`` re-reads byte-identical data with no straggler
hazard, and `latestOffset` is one manifest-dir listing (no data LIST).
Compaction may fold batches while a tailing stream is mid-window; path
resolution is shared with ``sink.read_changes`` (``change_paths``), so
a fully-covered window reads the compact dir and a vacuumed straddled
window raises the same explicit EXPIRED error instead of silently
dropping rows.

Partitions are one per parquet part-file (the sink coalesces each
batch to ``output_partitions`` files, so a micro-batch fans out to
that many executor tasks); rows ship as Arrow RecordBatches straight
from the parquet footer reader — no Python row loop.

Filesystem: manifest listing runs inside the Python data-source worker
(no JVM), via the sink's ``_LocalFS`` fallback — local/NFS paths in
this sandbox; an object-store deployment would swap an fsspec-backed
FS into ``ExactlyOnceParquetSink.fs`` (single seam, documented there).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

from ..streaming.sink import ExactlyOnceParquetSink


def register(spark) -> None:
    spark.dataSource.register(SinkStreamDataSource)


@dataclass
class _PartFilePartition(InputPartition):
    path: str
    columns: tuple


class SinkStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict, schema: StructType):
        self.root = options.get("path")
        if not self.root:
            raise ValueError("wmsink: .load(path) is required")
        self.columns = tuple(schema.fieldNames())
        raw = options.get("maxbatchespertrigger")
        self.max_batches = int(raw) if raw is not None else None
        if self.max_batches is not None and self.max_batches < 1:
            raise ValueError("wmsink: maxBatchesPerTrigger must be >= 1")
        # highest batch id this reader instance has planned; None after
        # restart until initialOffset()/partitions() reveals the WAL
        # position (same convention as WarcishStreamReader._prev_last)
        self._prev_last: int | None = None

    def _sink(self) -> ExactlyOnceParquetSink:
        return ExactlyOnceParquetSink(self.root)

    def initialOffset(self) -> dict:  # noqa: N802 (API name)
        self._prev_last = -1
        return {"last": -1}

    def latestOffset(self) -> dict:  # noqa: N802 (API name)
        committed = self._sink().committed_batches()
        last = committed[-1] if committed else -1
        if self._prev_last is None:
            # first call after process start. Measured call order (see
            # tests/test_sink_stream.py): the engine consumes THIS value
            # as the first micro-batch's end offset BEFORE calling
            # initialOffset(), and the Python streaming protocol has no
            # latestOffset(start, limit) form (JVM PythonMicroBatchStream
            # lacks SupportsAdmissionControl) — so the initial catch-up
            # batch is always admitted whole and the cap below governs
            # steady state only. Capping here without knowing the WAL
            # position could move the offset BACKWARDS after a restart,
            # which re-admits already-committed ids (duplicates) — never
            # cap blind. _prev_last stays None; partitions() learns the
            # true position from the engine's (start, end] window.
            return {"last": last}
        if last <= self._prev_last:
            # no new commits: re-return the previous position; the
            # serialized offset is identical so Spark plans no
            # spurious empty micro-batch
            return {"last": self._prev_last}
        if self.max_batches is not None:
            # rate limit (Delta's maxFilesPerTrigger analog): admit at
            # most N committed batches per micro-batch, counted over
            # the ids actually present in the window
            window = [b for b in committed if b > self._prev_last]
            last = window[: self.max_batches][-1]
        self._prev_last = last
        return {"last": last}

    def partitions(self, start: dict, end: dict):
        self._prev_last = end["last"]
        if end["last"] <= start["last"]:
            return []
        dirs = self._sink().change_paths(start["last"], end["last"])
        parts = []
        for d in dirs:
            for f in sorted(os.listdir(d)):
                if f.endswith(".parquet"):
                    parts.append(_PartFilePartition(
                        os.path.join(d, f), self.columns))
        return parts

    def read(self, partition: _PartFilePartition):
        import pyarrow.parquet as pq

        pf = pq.ParquetFile(partition.path)
        want = list(partition.columns)
        for rb in pf.iter_batches(columns=want):
            # select() pins column ORDER to the declared schema —
            # iter_batches honors the requested set but yields in file
            # order, which a schema-evolved batch dir could permute
            yield rb.select(want)

    def commit(self, end: dict) -> None:
        # nothing to release: batch dirs are immutable and lifecycle
        # (compact/vacuum) belongs to the sink's maintenance jobs
        pass


def mirror_upsert(spark, src, dst_root: str, checkpoint: str,
                  output_partitions: int | None = 8):
    """CDC CHAIN off an upsert table (Delta CDF → MERGE analog): tail
    ``src`` (an UpsertSink) through the ``wmsink`` streaming source —
    its appended delta rows, lineage-stamped ``_commit_batch``, ARE the
    complete change stream — and MERGE each micro-batch into a NEW
    downstream UpsertSink at ``dst_root``. Runs availableNow (catch up
    through everything committed, then stop) and blocks; re-running
    with the same ``checkpoint`` picks up ONLY commits newer than the
    last run — the streaming checkpoint remembers the ledger offset,
    and a replayed micro-batch id is an exactly-once no-op downstream.

    Last-writer-wins survives catch-up batches that span MANY upstream
    commits: the upstream ``(_commit_batch, order_col)`` pair travels
    as the downstream order struct ``_src_ord``, so resolution order is
    the upstream commit order even when one downstream batch carries
    several upstream batches' deltas. Tombstones propagate (same
    ``tombstone_col``): after catch-up,
    ``mirror.read_current() == src.read_current()`` row-for-row — the
    oracled q124 contract.

    Returns the downstream UpsertSink handle. Scale shape: the mirror
    processes each delta exactly once (never rescans the table), so a
    10^12-row upstream costs only its change volume; downstream
    ``compact_merge()`` keeps read_current a plain scan."""
    from pyspark.sql import functions as F

    from ..streaming.sink import UpsertSink

    register(spark)
    dst = UpsertSink(dst_root, key_cols=src.key_cols,
                     order_col="_src_ord",
                     tombstone_col=src.tombstone_col,
                     output_partitions=output_partitions)
    lineage = src.LINEAGE_COL

    def _merge(df, batch_id):
        ords = [F.col(lineage).alias("src_commit")]
        if src.order_col:
            ords.append(F.col(src.order_col).alias("src_order"))
        dst.write_batch(
            df.withColumn("_src_ord", F.struct(*ords)).drop(lineage),
            batch_id)

    q = (spark.readStream.format("wmsink").load(src.root)
         .writeStream.foreachBatch(_merge)
         .option("checkpointLocation", checkpoint)
         .trigger(availableNow=True)
         .start())
    q.awaitTermination()
    return dst


class SinkStreamDataSource(DataSource):
    """``spark.readStream.format("wmsink").load(root)`` — tail an
    ExactlyOnceParquetSink table. Schema is inferred once at plan time
    from the newest committed parquet footer (Arrow schema -> Spark
    types, TIMESTAMP_NTZ preserved)."""

    @classmethod
    def name(cls) -> str:
        return "wmsink"

    def schema(self):
        from pyspark.sql.pandas.types import from_arrow_schema

        root = self.options.get("path")
        if not root:
            raise ValueError("wmsink: .load(path) is required")
        sink = ExactlyOnceParquetSink(root)
        paths = sink._data_paths()
        if not paths:
            raise ValueError(
                f"wmsink: no committed batches under {root} — the "
                "source needs at least one committed batch to infer "
                "the table schema (or the root is not a sink)")
        import pyarrow.parquet as pq

        d = paths[-1]
        files = sorted(f for f in os.listdir(d) if f.endswith(".parquet"))
        if not files:
            raise ValueError(f"wmsink: committed dir {d} has no parquet")
        arrow = pq.ParquetFile(os.path.join(d, files[0])).schema_arrow
        return from_arrow_schema(arrow, prefer_timestamp_ntz=True)

    def streamReader(self, schema: StructType) -> SinkStreamReader:  # noqa: N802
        return SinkStreamReader(self.options, schema)
