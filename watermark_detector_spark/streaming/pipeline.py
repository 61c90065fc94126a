"""Streaming job runners + metrics listener.

``run_flagship_stream`` wires: file-stream replay (or Iceberg source at
production scale) → flagship streaming plan → exactly-once sink, with a
checkpoint dir making the whole thing resumable (the engine analog of
``resume_or_load``, train_watermarks.py:298).

``MetricsListener`` is the engine's scalar sink (the analog of
``storage.put_scalar('validation_loss', ...)``, train_watermarks.py:160):
per-micro-batch progress rows collected from StreamingQueryProgress.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQueryListener

from ..functions.core import Signature
from ..plans.flagship import flagship_stream
from ..sources.pages import read_pages_stream
from .sink import ExactlyOnceParquetSink


class MetricsListener(StreamingQueryListener):
    """Collects per-batch throughput rows; optionally appends JSONL."""

    def __init__(self, out_path: str | None = None):
        self.progress: list[dict] = []
        self.out_path = out_path

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        row = {
            "batchId": p.batchId,
            "numInputRows": p.numInputRows,
            "inputRowsPerSecond": p.inputRowsPerSecond,
            "processedRowsPerSecond": p.processedRowsPerSecond,
            "durationMs": dict(p.durationMs) if p.durationMs else {},
            # state-store footprint per commit — the soak artifact that
            # evidences bounded state on long-running streams
            "stateRowsTotal": sum(s.numRowsTotal for s in p.stateOperators),
            "stateMemoryBytes": sum(s.memoryUsedBytes for s in p.stateOperators),
        }
        self.progress.append(row)
        if self.out_path:
            with open(self.out_path, "a") as fh:
                fh.write(json.dumps(row) + "\n")

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass


def run_flagship_stream(
    spark: SparkSession,
    stream_dir: str,
    signatures: list[Signature],
    sink_root: str,
    checkpoint_dir: str,
    window: str = "1 minute",
    watermark: str = "10 minutes",
    max_files_per_trigger: int = 1,
    available_now: bool = True,
) -> ExactlyOnceParquetSink:
    """Run the flagship streaming pipeline to completion (availableNow)
    or until stopped. Restart-safe: same checkpoint_dir resumes from the
    last committed micro-batch; the sink ignores replayed batches."""
    os.makedirs(checkpoint_dir, exist_ok=True)
    pages = read_pages_stream(spark, stream_dir, max_files_per_trigger)
    agg = flagship_stream(pages, signatures, window=window, watermark=watermark)
    sink = ExactlyOnceParquetSink(sink_root)
    writer = (
        agg.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(sink.foreach_batch())
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
    else:
        q = writer.start()
        q.processAllAvailable()
        q.stop()
    return sink
