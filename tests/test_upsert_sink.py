"""UpsertSink: keyed last-writer-wins MERGE over the exactly-once
ledger (Delta/Iceberg MERGE INTO analog; merge-on-read reads +
copy-on-write ``compact_merge``). Mirrors the reference's
keeper-by-key checkpoint discipline (train_watermarks.py:161-163)
generalized into a table format."""

import os

import pytest
from pyspark.sql import Row, functions as F

from watermark_detector_spark.streaming.sink import UpsertSink


def _mk(spark, rows):
    return spark.createDataFrame(
        [Row(k=k, v=v, ver=ver, dead=dead) for k, v, ver, dead in rows])


def _stage(spark, root, replay=True):
    """3 delta batches: inserts, updates, deletes (+ one replayed)."""
    sink = UpsertSink(root, key_cols=["k"], order_col="ver",
                      tombstone_col="dead", output_partitions=1)
    sink.write_batch(_mk(spark, [(i, 10 * i, 0, False)
                                 for i in range(6)]), 0)
    sink.write_batch(_mk(spark, [(1, 111, 1, False),
                                 (3, 333, 1, False)]), 1)
    sink.write_batch(_mk(spark, [(2, 0, 2, True),
                                 (9, 0, 2, True)]), 2)  # 9 never existed
    if replay:
        sink.write_batch(_mk(spark, [(1, -1, 9, False)]), 1)  # replay no-op
    return sink


def _current(sink, spark, **kw):
    return {
        r["k"]: (r["v"], r["ver"])
        for r in sink.read_current(spark, **kw).collect()
    }


EXPECTED = {0: (0, 0), 1: (111, 1), 3: (333, 1), 4: (40, 0), 5: (50, 0)}


def test_upsert_lww_tombstone_and_replay(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert"))
    sink = _stage(spark, root)
    # replayed batch 1 must be a ledger no-op: (1, -1) never wins
    assert _current(sink, spark) == EXPECTED
    # a tombstone for a never-seen key (9) stays invisible
    # time travel: before the delete batch, key 2 is still live
    assert _current(sink, spark, as_of_batch=1) == {
        **EXPECTED, 2: (20, 0)}
    assert _current(sink, spark, as_of_batch=0) == {
        i: (10 * i, 0) for i in range(6)}


def test_upsert_reinsert_after_tombstone(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_re"))
    sink = _stage(spark, root)
    sink.write_batch(_mk(spark, [(2, 222, 3, False)]), 3)
    assert _current(sink, spark) == {**EXPECTED, 2: (222, 3)}


def test_upsert_order_col_breaks_intra_batch_ties(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_ord"))
    sink = UpsertSink(root, key_cols=["k"], order_col="ver",
                      tombstone_col="dead", output_partitions=1)
    sink.write_batch(_mk(spark, [(7, 70, 0, False), (7, 77, 5, False),
                                 (7, 71, 1, False)]), 0)
    assert _current(sink, spark) == {7: (77, 5)}


def test_compact_merge_materializes_and_fast_paths(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_cm"))
    sink = _stage(spark, root)
    before = _current(sink, spark)
    entry = sink.compact_merge(spark)
    assert entry["merged"] and entry["lo"] == 0 and entry["hi"] == 2
    # merged state identical; fast path = plain scan, no aggregate
    assert sink._fully_merged()
    assert _current(sink, spark) == before == EXPECTED
    plan = sink.read_current(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Aggregate" not in plan
    # a second merge with nothing new is a no-op
    assert sink.compact_merge(spark) is None
    # replay of a merged-away batch is still an exactly-once no-op
    sink.write_batch(_mk(spark, [(1, -1, 9, False)]), 1)
    assert _current(sink, spark) == EXPECTED


def test_remerge_shadows_and_vacuums_old_range(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_rm"))
    sink = _stage(spark, root)
    sink.compact_merge(spark)
    sink.vacuum(retention_s=0)  # sweep the per-batch deltas
    sink.write_batch(_mk(spark, [(0, 999, 3, False)]), 3)
    assert _current(sink, spark) == {**EXPECTED, 0: (999, 3)}
    entry2 = sink.compact_merge(spark, vacuum=False)
    assert (entry2["lo"], entry2["hi"]) == (0, 3)
    # old merge range is shadowed by containment: reads see ONE range
    ranges, singles = sink._manifest_state()
    assert [r["dir"] for r in ranges] == ["merge_0-3"] and not singles
    assert _current(sink, spark) == {**EXPECTED, 0: (999, 3)}
    # data dirs of BOTH merges exist until vacuum's retention expires
    assert os.path.isdir(os.path.join(root, "data", "merge_0-2"))
    sink.vacuum(retention_s=0)
    assert not os.path.exists(os.path.join(root, "data", "merge_0-2"))
    assert not os.path.exists(
        os.path.join(root, "_manifest", "merge_0-2.json"))
    assert _current(sink, spark) == {**EXPECTED, 0: (999, 3)}


def test_merge_publish_does_not_expire_reads_served_by_shadowed_range(
        spark, tmp_path_factory):
    """Publishing a merge range must not EXPIRE time-travel /
    incremental reads that a shadowed, still-published compact range
    can serve exactly — expiry happens at vacuum, never at publish."""
    root = str(tmp_path_factory.mktemp("upsert_shadow_read"))
    sink = _stage(spark, root, replay=False)
    sink.compact(spark)           # compact_0-2 (raw deltas, one dir)
    sink.vacuum(retention_s=0)    # per-batch dirs swept
    sink.write_batch(_mk(spark, [(0, 999, 3, False)]), 3)
    # servable pre-merge reads: snapshot AT the compact boundary and
    # the change window it covers exactly (a straddled as_of_batch=1
    # is already-expired contract, before AND after the merge)
    before_tt = _current(sink, spark, as_of_batch=2)
    before_ch = sink.read_changes(spark, since_batch=-1,
                                  as_of_batch=2).count()
    sink.compact_merge(spark, vacuum=False)  # merge_0-3 shadows compact_0-2
    # both reads still resolve through the shadowed compact range
    assert _current(sink, spark, as_of_batch=2) == before_tt
    assert sink.read_changes(spark, since_batch=-1,
                             as_of_batch=2).count() == before_ch
    # a change window the shadowed range STRADDLES is still expired
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_changes(spark, since_batch=1, as_of_batch=3)
    # once vacuum sweeps the shadowed range, expiry is real
    sink.vacuum(retention_s=0)
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_current(spark, as_of_batch=2)


def test_remerge_falls_back_to_shadowed_merge_snapshot(
        spark, tmp_path_factory):
    """After merge -> vacuum -> delta -> re-merge, a snapshot read at
    the OLD merge boundary is served by the shadowed merge_0-2 dir
    (resolved state of its span) until vacuum sweeps it."""
    root = str(tmp_path_factory.mktemp("upsert_shadow_merge"))
    sink = _stage(spark, root)
    sink.compact_merge(spark)
    sink.vacuum(retention_s=0)
    sink.write_batch(_mk(spark, [(0, 999, 3, False)]), 3)
    sink.compact_merge(spark, vacuum=False)  # merge_0-3 shadows merge_0-2
    assert _current(sink, spark, as_of_batch=2) == EXPECTED
    # the merge-snapshot substitute holds RESOLVED rows, so it serves
    # only read_current; a raw read() keeps its raw-delta contract and
    # is EXPIRED rather than silently switching row multisets
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read(spark, as_of_batch=2)
    # but a CHANGE read through the merged span stays expired: a merge
    # snapshot is not a changelog
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_changes(spark, since_batch=0, as_of_batch=2)
    sink.vacuum(retention_s=0)
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_current(spark, as_of_batch=2)


def test_merge_time_travel_expires_after_vacuum(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_tt"))
    sink = _stage(spark, root)
    sink.compact_merge(spark, vacuum=False)
    # deltas still on disk: historical resolve works through the merge
    assert _current(sink, spark, as_of_batch=1) == {**EXPECTED, 2: (20, 0)}
    sink.vacuum(retention_s=0)
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_current(spark, as_of_batch=1)
    # incremental reads through the merged span are equally expired
    with pytest.raises(ValueError, match="EXPIRED"):
        sink.read_changes(spark, since_batch=0, as_of_batch=2)


def test_merge_requires_contiguous_ledger(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_gap"))
    sink = UpsertSink(root, key_cols=["k"], order_col="ver",
                      tombstone_col="dead", output_partitions=1)
    sink.write_batch(_mk(spark, [(1, 10, 0, False)]), 0)
    sink.write_batch(_mk(spark, [(1, 12, 0, False)]), 2)
    with pytest.raises(ValueError, match="contiguous"):
        sink.compact_merge(spark)


def test_upsert_rejects_lineage_collision_and_missing_key(
        spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("upsert_bad"))
    sink = UpsertSink(root, key_cols=["k"], output_partitions=1)
    df = _mk(spark, [(1, 10, 0, False)])
    with pytest.raises(ValueError, match="lineage"):
        sink.write_batch(df.withColumn("_commit_batch", F.lit(7)), 0)
    with pytest.raises(ValueError, match="key column"):
        sink.write_batch(df.drop("k"), 0)


def test_streaming_cdc_upserts_through_foreach_batch(
        spark, tmp_path_factory):
    """End-to-end CDC: a file stream of keyed change rows drives
    foreachBatch(upsert.foreach_batch()) with a checkpoint; a restart
    with the same checkpoint picks up only the NEW change file, and the
    resolved table equals replaying all changes in order."""
    import pandas as pd

    base = tmp_path_factory.mktemp("upsert_cdc")
    src, root, ckpt = (str(base / d) for d in ("src", "sink", "ckpt"))
    os.makedirs(src)

    def _change_file(idx, rows):
        p = os.path.join(src, f"{idx:05d}.parquet")
        pd.DataFrame(rows, columns=["k", "v", "ver", "dead"]).astype(
            {"k": "int64", "v": "int64", "ver": "int64", "dead": "bool"}
        ).to_parquet(p, index=False)
        os.utime(p, (1_000_000 + idx, 1_000_000 + idx))  # stable order

    def _run(sink):
        q = (spark.readStream.schema("k long, v long, ver long, dead boolean")
             .option("maxFilesPerTrigger", 1).parquet(src)
             .writeStream.foreachBatch(sink.foreach_batch())
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    sink = UpsertSink(root, key_cols=["k"], order_col="ver",
                      tombstone_col="dead", output_partitions=1)
    _change_file(0, [(i, 10 * i, 0, False) for i in range(6)])
    _change_file(1, [(1, 111, 1, False), (3, 333, 1, False)])
    _change_file(2, [(2, 0, 2, True)])
    _run(sink)
    assert _current(sink, spark) == EXPECTED
    assert sink.committed_batches() == [0, 1, 2]
    # restart: only the new change file becomes a (new) batch
    _change_file(3, [(0, 999, 3, False)])
    _run(sink)
    assert sink.committed_batches() == [0, 1, 2, 3]
    assert _current(sink, spark) == {**EXPECTED, 0: (999, 3)}


def test_plain_compact_still_folds_upsert_deltas(spark, tmp_path_factory):
    """Layout-only compaction (base class) keeps merge-on-read exact:
    the lineage column travels with the rows through the rewrite."""
    root = str(tmp_path_factory.mktemp("upsert_pc"))
    sink = _stage(spark, root)
    entries = sink.compact(spark)
    assert entries and entries[0]["lo"] == 0 and entries[0]["hi"] == 2
    assert _current(sink, spark) == EXPECTED
    # resolved-at-read through a compact range, then merged on top
    entry = sink.compact_merge(spark, vacuum=False)
    assert (entry["lo"], entry["hi"]) == (0, 2)
    ranges, _ = sink._manifest_state()
    assert [r["dir"] for r in ranges] == ["merge_0-2"]
    assert _current(sink, spark) == EXPECTED
