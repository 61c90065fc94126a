"""Exactly-once idempotent sink with per-partition commit lineage.

The reference's checkpoint discipline — overwrite ``best_model.pth`` on
improvement and ``resume_or_load`` on restart (train_watermarks.py:161-163,
298) — generalizes to: every micro-batch write must be replay-safe.

Protocol (Iceberg-style snapshot log, no Iceberg jar needed):
1. foreachBatch(df, batch_id) writes data files under
   ``<root>/data/batch_id=<id>/`` with mode=overwrite — a replayed batch
   overwrites byte-identically (deterministic plan), never duplicates.
2. After the data files land, a manifest entry
   ``<root>/_manifest/<batch_id>.json`` is written ATOMICALLY
   (write temp + rename) recording batch_id, row count and files —
   the per-partition commit lineage.
3. Readers take ONLY batches listed in the manifest: a crash between
   data write and manifest write leaves an invisible orphan that the
   replay overwrites.

At 100 TB this is the same protocol, with the manifest directory on the
object store and the rename replaced by a conditional PUT.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class ExactlyOnceParquetSink:
    def __init__(self, root: str, output_partitions: int | None = 8):
        # window-agg output per batch is small relative to input; coalesce
        # to a few files so the per-batch commit cost stays flat
        self.output_partitions = output_partitions
        self.root = root
        self.data_dir = os.path.join(root, "data")
        self.manifest_dir = os.path.join(root, "_manifest")
        os.makedirs(self.data_dir, exist_ok=True)
        os.makedirs(self.manifest_dir, exist_ok=True)

    # -- write side (foreachBatch) ----------------------------------------
    def write_batch(self, df: DataFrame, batch_id: int) -> None:
        manifest_path = os.path.join(self.manifest_dir, f"{batch_id}.json")
        if os.path.exists(manifest_path):
            # replayed batch already committed — exactly-once no-op
            return
        path = os.path.join(self.data_dir, f"batch_id={batch_id}")
        if self.output_partitions:
            df = df.coalesce(self.output_partitions)
        df.write.mode("overwrite").parquet(path)
        files = sorted(
            f for f in os.listdir(path) if f.endswith(".parquet")
        )
        # row count from parquet footers — no extra Spark job per batch
        import pyarrow.parquet as pq

        n_rows = sum(
            pq.ParquetFile(os.path.join(path, f)).metadata.num_rows for f in files
        )
        entry = {
            "batch_id": batch_id,
            "n_rows": n_rows,
            "n_files": len(files),
            "files": files,
            "committed_at_epoch": time.time(),
        }
        tmp = manifest_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, manifest_path)  # atomic publish

    def foreach_batch(self):
        return lambda df, batch_id: self.write_batch(df, batch_id)

    # -- read side ---------------------------------------------------------
    def committed_batches(self) -> list[int]:
        if not os.path.isdir(self.manifest_dir):
            return []
        return sorted(
            int(f[:-5]) for f in os.listdir(self.manifest_dir) if f.endswith(".json")
        )

    def manifest(self) -> list[dict]:
        return [
            json.load(open(os.path.join(self.manifest_dir, f"{b}.json")))
            for b in self.committed_batches()
        ]

    def read(self, spark: SparkSession) -> DataFrame:
        batches = self.committed_batches()
        if not batches:
            raise ValueError(f"no committed batches under {self.root}")
        paths = [os.path.join(self.data_dir, f"batch_id={b}") for b in batches]
        return spark.read.parquet(*paths)
