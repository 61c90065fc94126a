"""The exactly-once sink as a Structured-Streaming SOURCE (wmsink).

Contract under test (sources/sink_stream.py — Delta/Iceberg
streaming-read analog): the manifest ledger is the offset log, a
tailing stream sees every committed batch exactly once across
restarts, compaction stays transparent until vacuum expires a
straddled window (then the stream FAILS loudly instead of dropping
rows), and maxBatchesPerTrigger bounds steady-state micro-batches.
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from watermark_detector_spark.sources import sink_stream
from watermark_detector_spark.streaming.sink import ExactlyOnceParquetSink


@pytest.fixture()
def docs(spark):
    return (
        spark.range(400)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") % 7).cast("string").alias("lang"),
            F.sha1(F.col("id").cast("string")).alias("text"),
        )
    )


def _staged_sink(docs, root, n_batches=5, parts=2):
    sink = ExactlyOnceParquetSink(root, output_partitions=parts)
    for b in range(n_batches):
        sink.write_batch(docs.where(F.col("doc_id") % n_batches == b), b)
    return sink


def _tail_to_parquet(spark, root, out, ckpt, **opts):
    reader = spark.readStream.format("wmsink")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return q


def test_tail_then_restart_delivers_each_batch_exactly_once(
    spark, tmp_path, docs
):
    root, out, ckpt = (str(tmp_path / d) for d in ("sink", "out", "ckpt"))
    sink = _staged_sink(docs, root, n_batches=3)
    sink_stream.register(spark)
    _tail_to_parquet(spark, root, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 400  # all three batches of the 400-doc table
    # three more commits, the first a REPLAY of batch 1 (ledger no-op)
    sink.write_batch(docs.where(F.col("doc_id") % 3 == 1), 1)
    sink.write_batch(docs.where(F.col("doc_id") % 3 == 0), 3)
    sink.write_batch(docs.where(F.col("doc_id") % 3 == 1), 4)
    _tail_to_parquet(spark, root, out, ckpt)  # SAME checkpoint: delta only
    got = spark.read.parquet(out)
    # 400 original + batch3 re-adds %3==0 (134) + batch4 re-adds %3==1 (133)
    assert got.count() == 400 + 134 + 133
    assert got.select("doc_id", "text").distinct().count() == 400
    # per-doc multiplicity proves no batch was double-delivered
    hist = (
        got.groupBy("doc_id").agg(F.count("*").alias("m"))
        .groupBy("m").agg(F.count("*").alias("n"))
        .orderBy("m").collect()
    )
    assert [(r["m"], r["n"]) for r in hist] == [(1, 133), (2, 267)]


def test_mirror_upsert_cdc_chain_restart_new_commits_only(
    spark, tmp_path, docs
):
    """mirror_upsert: (a) after catch-up the mirror's resolved state
    equals the upstream's, updates/tombstones included; (b) resuming
    the SAME checkpoint after new upstream commits processes ONLY the
    delta — the mirror gains exactly one downstream batch whose row
    count is the new commit's, nothing is re-merged; (c) a run with
    nothing new commits no downstream batch at all."""
    from watermark_detector_spark.sources.sink_stream import mirror_upsert
    from watermark_detector_spark.streaming.sink import UpsertSink

    up_root, dst_root, ckpt = (
        str(tmp_path / d) for d in ("up", "mirror", "ckpt"))
    up = UpsertSink(up_root, key_cols=["doc_id"], order_col="ver",
                    tombstone_col="_deleted", output_partitions=2)
    base = docs.withColumn("ver", F.lit(0)).withColumn(
        "_deleted", F.lit(False))
    upd = (docs.where(F.col("doc_id") % 4 == 0)
           .withColumn("text", F.lit("updated"))
           .withColumn("ver", F.lit(1)).withColumn("_deleted", F.lit(False)))
    up.write_batch(base, 0)
    up.write_batch(upd, 1)

    mirror = mirror_upsert(spark, up, dst_root, ckpt)
    cur = mirror.read_current(spark)
    assert cur.count() == 400
    assert cur.where("text = 'updated'").count() == 100  # LWW applied
    first_batches = mirror.committed_batches()

    # nothing new: resumed run must not commit a downstream batch
    mirror_upsert(spark, up, dst_root, ckpt)
    assert mirror.committed_batches() == first_batches

    # new upstream commit: tombstone doc_id%5==0, resume the checkpoint
    dele = (docs.where(F.col("doc_id") % 5 == 0)
            .withColumn("ver", F.lit(2)).withColumn("_deleted", F.lit(True)))
    up.write_batch(dele, 2)
    mirror_upsert(spark, up, dst_root, ckpt)
    after = mirror.committed_batches()
    assert len(after) == len(first_batches) + 1  # exactly one new batch
    new_id = after[-1]
    # the new downstream batch carries ONLY the new commit's rows
    assert mirror.read_changes(
        spark, since_batch=new_id - 1, as_of_batch=new_id).count() == 80
    # resolved mirror state == resolved upstream state, row-for-row
    cur = mirror.read_current(spark).select("doc_id", "lang", "text")
    want = up.read_current(spark).select("doc_id", "lang", "text")
    assert cur.count() == 320
    assert cur.exceptAll(want).isEmpty() and want.exceptAll(cur).isEmpty()


def test_schema_inferred_from_footers(spark, tmp_path, docs):
    root = str(tmp_path / "sink")
    _staged_sink(docs, root, n_batches=2)
    sink_stream.register(spark)
    s = spark.readStream.format("wmsink").load(root)
    assert s.schema.simpleString() == (
        "struct<doc_id:bigint,lang:string,text:string>"
    )


def test_empty_sink_fails_schema_inference(spark, tmp_path):
    sink_stream.register(spark)
    with pytest.raises(Exception, match="no committed batches"):
        spark.readStream.format("wmsink").load(str(tmp_path / "nope")).schema


def test_rate_limit_bounds_steady_state_batches(spark, tmp_path, docs):
    root, out, ckpt = (str(tmp_path / d) for d in ("sink", "out", "ckpt"))
    sink = _staged_sink(docs, root, n_batches=1, parts=1)
    sink_stream.register(spark)
    q = (
        spark.readStream.format("wmsink")
        .option("maxBatchesPerTrigger", "1")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if any(int(p["numInputRows"]) > 0 for p in q.recentProgress):
                break
            time.sleep(1)
        for b in range(1, 5):
            sink.write_batch(docs.where(F.col("doc_id") % 5 == b), b)
        while time.time() < deadline:
            if sum(int(p["numInputRows"]) for p in q.recentProgress) >= 720:
                break
            time.sleep(1)
        nonempty = [
            int(p["numInputRows"])
            for p in q.recentProgress
            if int(p["numInputRows"]) > 0
        ]
    finally:
        q.stop()
    # batch 0 (initial catch-up) is admitted whole — documented API
    # limitation; every steady-state batch holds exactly ONE sink batch
    assert len(nonempty) == 5
    assert sum(nonempty) == 400 + 400 - 80  # %5==0 delivered once + rest
    got = spark.read.parquet(out)
    assert got.count() == sum(nonempty)
    assert got.select("doc_id").distinct().count() == 400


def test_compacted_window_reads_compact_dir(spark, tmp_path, docs):
    root, out, ckpt = (str(tmp_path / d) for d in ("sink", "out", "ckpt"))
    sink = _staged_sink(docs, root, n_batches=4)
    sink.compact(spark)
    sink.vacuum(retention_s=0.0)
    sink_stream.register(spark)
    _tail_to_parquet(spark, root, out, ckpt)
    assert spark.read.parquet(out).count() == 400


def test_vacuumed_straddled_window_raises_expired(spark, tmp_path, docs):
    root, out, ckpt = (str(tmp_path / d) for d in ("sink", "out", "ckpt"))
    sink = _staged_sink(docs, root, n_batches=3)
    sink_stream.register(spark)
    _tail_to_parquet(spark, root, out, ckpt)
    # stream has consumed through batch 2; now 2 more batches land and
    # compaction folds 0-4 and vacuums — the (2, 4] window now straddles
    # the compact range, whose per-batch dirs are gone
    sink.write_batch(docs.where(F.col("doc_id") % 3 == 0), 3)
    sink.write_batch(docs.where(F.col("doc_id") % 3 == 1), 4)
    sink.compact(spark)
    sink.vacuum(retention_s=0.0)
    q = (
        spark.readStream.format("wmsink")
        .load(root)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="EXPIRED"):
        q.awaitTermination(120)
        if q.exception() is not None:
            raise Exception(str(q.exception()))
