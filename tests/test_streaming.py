"""Structured Streaming tests: watermark late-drop vs golden,
checkpoint-restart exactly-once, stateful operators, stream-stream join.

All run with availableNow + maxFilesPerTrigger=1 over the mtime-ordered
fixture batch files — deterministic micro-batch replay.
"""

import os
import shutil

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from watermark_detector_spark.operators.joins import (
    join_signatures_broadcast,
    join_signatures_stream_stream,
)
from watermark_detector_spark.plans.flagship import detected_pages, kept_detections
from watermark_detector_spark.sources.pages import read_pages_stream
from watermark_detector_spark.streaming.pipeline import run_flagship_stream
from watermark_detector_spark.streaming.sink import ExactlyOnceParquetSink
from watermark_detector_spark.streaming.state import session_stats, track_best


def _norm_stream(df: pd.DataFrame) -> pd.DataFrame:
    df = df[["domain", "window_start", "window_end", "n_detections",
             "avg_score", "n_watermark", "n_text"]].copy()
    for c in ("n_detections", "n_watermark", "n_text"):
        df[c] = df[c].astype("int64")
    for c in ("window_start", "window_end"):
        df[c] = pd.to_datetime(df[c])
    return df.sort_values(["domain", "window_start"]).reset_index(drop=True)


@pytest.fixture(scope="module")
def stream_run(spark, fixture_cfg, fixture_paths, tmp_path_factory):
    root = tmp_path_factory.mktemp("stream_run")
    sink = run_flagship_stream(
        spark,
        fixture_paths["pages_stream"],
        fixture_cfg.signatures,
        sink_root=str(root / "sink"),
        checkpoint_dir=str(root / "ckpt"),
    )
    return sink


def test_stream_matches_golden_with_late_drop(spark, fixture_paths, stream_run):
    """Streaming output == golden computed WITHOUT late rows; and the
    late rows make a difference (so the drop is actually exercised)."""
    got = _norm_stream(stream_run.read(spark).toPandas())
    gold = _norm_stream(pd.read_parquet(fixture_paths["golden_windows_stream"]))
    gold_all = _norm_stream(pd.read_parquet(fixture_paths["golden_windows"]))
    assert not gold.equals(gold_all), "fixtures must contain effective late rows"
    assert got.shape == gold.shape
    for c in ["domain", "window_start", "window_end", "n_detections",
              "n_watermark", "n_text"]:
        assert (got[c] == gold[c]).all(), c
    assert np.allclose(got["avg_score"].astype(float),
                       gold["avg_score"].astype(float), atol=1e-9)


def test_stream_manifest_lineage(stream_run, fixture_cfg):
    """One manifest entry per committed micro-batch, no duplicates."""
    batches = stream_run.committed_batches()
    assert len(batches) == len(set(batches))
    assert len(batches) >= fixture_cfg.n_batches  # one per input file (+final)
    man = stream_run.manifest()
    assert all(e["n_files"] >= 1 or e["n_rows"] == 0 for e in man)


def test_checkpoint_restart_exactly_once(spark, fixture_cfg, fixture_paths,
                                         stream_run, tmp_path_factory):
    """Interrupted run (first half of the stream) + restart (full stream)
    from the same checkpoint == uninterrupted run, with no duplicate
    batch commits (the resume_or_load analog, train_watermarks.py:298)."""
    root = tmp_path_factory.mktemp("restart")
    part_dir = root / "stream_partial"
    part_dir.mkdir()
    files = sorted(os.listdir(fixture_paths["pages_stream"]))
    half = files[: len(files) // 2]
    for i, f in enumerate(files):
        src = os.path.join(fixture_paths["pages_stream"], f)
        if f in half:
            dst = str(part_dir / f)
            shutil.copy2(src, dst)
            os.utime(dst, (1700000000 + i, 1700000000 + i))

    sink_root, ckpt = str(root / "sink"), str(root / "ckpt")
    # phase 1: only half the stream exists; run to completion ("crash")
    sink1 = run_flagship_stream(spark, str(part_dir), fixture_cfg.signatures,
                                sink_root, ckpt)
    committed_phase1 = sink1.committed_batches()
    assert committed_phase1

    # phase 2: rest of the stream arrives; RESTART from same checkpoint
    for i, f in enumerate(files):
        if f not in half:
            src = os.path.join(fixture_paths["pages_stream"], f)
            dst = str(part_dir / f)
            shutil.copy2(src, dst)
            os.utime(dst, (1700000000 + i, 1700000000 + i))
    sink2 = run_flagship_stream(spark, str(part_dir), fixture_cfg.signatures,
                                sink_root, ckpt)

    # exactly-once: batch ids strictly extend, no re-commit of phase-1 ids
    committed_phase2 = sink2.committed_batches()
    assert committed_phase2[: len(committed_phase1)] == committed_phase1
    assert len(set(committed_phase2)) == len(committed_phase2)

    # final content == uninterrupted reference run
    got = _norm_stream(sink2.read(spark).toPandas())
    want = _norm_stream(stream_run.read(spark).toPandas())
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-9)


def test_track_best_stateful(spark, fixture_cfg, fixture_paths, tmp_path_factory):
    """Per-domain running-best via applyInPandasWithState: final best ==
    batch max score per domain (checkpoint-on-improve analog)."""
    root = tmp_path_factory.mktemp("state")
    pages = read_pages_stream(spark, fixture_paths["pages_stream"])
    kept = kept_detections(detected_pages(pages, fixture_cfg.signatures))
    kept = kept.where(~F.col("url").contains("/flush/"))  # drop sentinel
    q = (
        track_best(kept)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("best_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT domain, max(best_score) AS best_score FROM best_out GROUP BY domain")
        .toPandas()
        .sort_values("domain")
        .reset_index(drop=True)
    )
    pages_b = spark.read.parquet(fixture_paths["pages"])
    want = (
        kept_detections(detected_pages(pages_b, fixture_cfg.signatures))
        .groupBy("domain").agg(F.max("score").alias("best_score"))
        .toPandas().sort_values("domain").reset_index(drop=True)
    )
    # streaming saw all rows (no watermark filter on input rows here)
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-9)


def test_session_stats_stateful(spark, fixture_cfg, fixture_paths, tmp_path_factory):
    """Custom sessionization emits coherent sessions (start<=end, n>0)."""
    root = tmp_path_factory.mktemp("sess")
    pages = read_pages_stream(spark, fixture_paths["pages_stream"])
    kept = kept_detections(detected_pages(pages, fixture_cfg.signatures))
    q = (
        session_stats(kept, gap="5 minutes")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM sess_out").toPandas()
    assert len(got) > 0
    assert (got["session_start"] <= got["session_end"]).all()
    assert (got["n_detections"] > 0).all()


def test_stream_static_broadcast_join(spark, fixture_cfg, fixture_paths):
    pages = spark.read.parquet(fixture_paths["pages"])
    kept = kept_detections(detected_pages(pages, fixture_cfg.signatures))
    sigs = spark.read.parquet(fixture_paths["signatures"])
    joined = join_signatures_broadcast(kept, sigs)
    assert joined.where(F.col("pattern").isNull()).count() == 0
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_stream_stream_join_validity(spark, fixture_cfg, fixture_paths,
                                     tmp_path_factory):
    """Detections join signature versions only inside the validity
    window; a page before its signature's valid_from does not match."""
    root = tmp_path_factory.mktemp("ssj")
    pages = read_pages_stream(spark, fixture_paths["pages_stream"])
    kept = kept_detections(detected_pages(pages, fixture_cfg.signatures))
    kept = kept.where(~F.col("url").contains("/flush/"))  # drop sentinel
    from watermark_detector_spark.schemas import SIGNATURES_SCHEMA

    sig_dir = root / "sigs_stream"  # file stream source needs a directory
    sig_dir.mkdir()
    shutil.copy2(fixture_paths["signatures"], str(sig_dir / "signatures.parquet"))
    sigs_stream = spark.readStream.schema(SIGNATURES_SCHEMA).parquet(str(sig_dir))
    joined = join_signatures_stream_stream(kept, sigs_stream)
    q = (
        joined.writeStream.outputMode("append")
        .format("memory").queryName("ssj_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.sql("SELECT * FROM ssj_out").toPandas()
    assert len(got) > 0
    assert (pd.to_datetime(got["warc_ts"]) >= pd.to_datetime(got["valid_from"])).all()
    # batch oracle: same join condition in plain SQL
    pages_b = spark.read.parquet(fixture_paths["pages"])
    kept_b = kept_detections(detected_pages(pages_b, fixture_cfg.signatures))
    sigs_b = spark.read.parquet(fixture_paths["signatures"]).withColumnRenamed("sig_id", "s_sig_id")
    want_n = kept_b.join(
        sigs_b,
        (F.col("sig_id") == F.col("s_sig_id"))
        & (F.col("warc_ts") >= F.col("valid_from"))
        & (F.col("warc_ts") < F.col("valid_from") + F.expr("INTERVAL 2 hours")),
        "inner",
    ).count()
    assert len(got) == want_n


def test_parse_gap_seconds_units():
    """Gap strings parse per unit and reject garbage (silently treating
    '1 hour' as seconds was a sessionization footgun)."""
    from watermark_detector_spark.streaming.state import parse_gap_seconds

    assert parse_gap_seconds("30 seconds") == 30
    assert parse_gap_seconds("5 minutes") == 300
    assert parse_gap_seconds("1 hour") == 3600
    assert parse_gap_seconds("2 days") == 172800
    for bad in ("5 fortnights", "minutes", "1.5 minutes", ""):
        with pytest.raises(ValueError):
            parse_gap_seconds(bad)


def test_sink_hadoop_fs_uri_root(spark, tmp_path_factory):
    """The exactly-once sink must run against a scheme-qualified root
    through the Hadoop FileSystem API (the 100 TB object-store posture:
    no driver-local os.* in the protocol). file:// is the scheme the
    sandbox can exercise; hdfs/s3a differ only in the connector."""
    from watermark_detector_spark.streaming.sink import ExactlyOnceParquetSink

    root = "file://" + str(tmp_path_factory.mktemp("sink_uri"))
    sink = ExactlyOnceParquetSink(root, output_partitions=2)
    df = spark.range(100).withColumnRenamed("id", "v")
    sink.write_batch(df, 0)
    sink.write_batch(df.where("v < 10"), 1)
    assert sink.committed_batches() == [0, 1]
    man = sink.manifest()
    assert [m["n_rows"] for m in man] == [100, 10]
    assert all(m["n_files"] >= 1 for m in man)
    # replay of a committed batch is a no-op (manifest timestamp frozen)
    t0 = man[0]["committed_at_epoch"]
    sink.write_batch(df, 0)
    assert sink.manifest()[0]["committed_at_epoch"] == t0
    got = sink.read(spark)
    assert got.count() == 110


def test_transform_with_state_matches_apply_in_pandas(spark, fixture_cfg,
                                                      fixture_paths,
                                                      tmp_path_factory):
    """The Spark-4 state-v2 operator (transformWithStateInPandas +
    ValueState) must land on the same final per-domain best as the
    applyInPandasWithState implementation — two stateful APIs, one
    contract. Where the state-v2 wire protocol is unavailable (no
    protobuf in this container), the operator must refuse with a clear
    error instead of crashing the query, and the run is skipped."""
    from watermark_detector_spark.streaming.state import (
        HAS_TRANSFORM_WITH_STATE,
        track_best_v2,
    )

    if not HAS_TRANSFORM_WITH_STATE:
        pages0 = read_pages_stream(spark, fixture_paths["pages_stream"])
        kept0 = kept_detections(detected_pages(pages0, fixture_cfg.signatures))
        with pytest.raises(RuntimeError, match="transformWithStateInPandas"):
            track_best_v2(kept0)
        pytest.skip("state-v2 protocol needs google.protobuf (not in container)")

    root = tmp_path_factory.mktemp("tws")
    pages = read_pages_stream(spark, fixture_paths["pages_stream"])
    kept = kept_detections(detected_pages(pages, fixture_cfg.signatures))
    kept = kept.where(~F.col("url").contains("/flush/"))
    q = (
        track_best_v2(kept)
        .writeStream.outputMode("update")
        .format("memory")
        .queryName("best_v2_out")
        .option("checkpointLocation", str(root / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = (
        spark.sql("SELECT domain, max(best_score) AS best_score "
                  "FROM best_v2_out GROUP BY domain")
        .toPandas().sort_values("domain").reset_index(drop=True)
    )
    pages_b = spark.read.parquet(fixture_paths["pages"])
    want = (
        kept_detections(detected_pages(pages_b, fixture_cfg.signatures))
        .groupBy("domain").agg(F.max("score").alias("best_score"))
        .toPandas().sort_values("domain").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, want, check_exact=False, atol=1e-9)
