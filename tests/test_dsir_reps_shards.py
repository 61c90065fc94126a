"""DSIR importance resampling, cluster representatives, shard assign."""

import pytest
from pyspark.sql import functions as F

from watermark_detector_spark.operators.dedup import cluster_representatives
from watermark_detector_spark.operators.ids import shard_assign
from watermark_detector_spark.operators.sampling import (
    dsir_log_weights,
    hash_uniform,
    importance_resample,
)


@pytest.fixture()
def corpus(spark):
    # two token populations: doc_id < 50 speak "alpha beta ...",
    # the rest "omega psi ..." — disjoint bigram distributions
    return spark.range(100).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") < 50,
            F.concat_ws(" ", F.lit("alpha beta gamma delta"),
                        F.col("id").cast("string")),
        ).otherwise(
            F.concat_ws(" ", F.lit("omega psi chi phi"),
                        F.col("id").cast("string")),
        ).alias("text"),
    )


def test_dsir_zero_when_target_equals_source(spark, corpus):
    # identical distributions => log p - log q == 0 per bucket, exactly
    w = dsir_log_weights(corpus, corpus).toPandas()
    assert len(w) == 100
    assert (w["log_w"].abs() < 1e-12).all()


def test_dsir_upweights_target_like_docs(spark, corpus):
    target = corpus.where(F.col("doc_id") < 10)  # alpha-population only
    w = dsir_log_weights(corpus, target).toPandas().set_index("doc_id")
    alpha_w = w.loc[[i for i in range(50)], "log_w"]
    omega_w = w.loc[[i for i in range(50, 100)], "log_w"]
    assert alpha_w.min() > omega_w.max()


def test_dsir_validates_params(spark, corpus):
    with pytest.raises(ValueError, match="alpha"):
        dsir_log_weights(corpus, corpus, alpha=0.0)
    with pytest.raises(ValueError, match="n must"):
        dsir_log_weights(corpus, corpus, n=0)


def test_importance_resample_deterministic_and_biased(spark, corpus):
    target = corpus.where(F.col("doc_id") < 10)
    w = dsir_log_weights(corpus, target)
    a = sorted(r["doc_id"] for r in importance_resample(w, 20).collect())
    b = sorted(
        r["doc_id"]
        for r in importance_resample(w.repartition(13), 20).collect()
    )
    assert a == b and len(a) == 20
    # weights dominate the Gumbel noise here (gap is huge), so the
    # sample should be mostly alpha-population docs
    assert sum(1 for i in a if i < 50) >= 15
    c = sorted(
        r["doc_id"] for r in importance_resample(w, 20, seed="s9").collect()
    )
    assert a != c  # a different seed redraws the sample


def test_importance_resample_plan_no_global_sort(spark, corpus):
    w = dsir_log_weights(corpus, corpus)
    plan = (
        importance_resample(w, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_hash_uniform_in_open_interval(spark):
    df = spark.range(2000).select(
        hash_uniform(F.col("id")).alias("u"))
    mm = df.agg(F.min("u"), F.max("u"), F.avg("u")).collect()[0]
    assert 0.0 < mm[0] and mm[1] < 1.0
    assert 0.45 < mm[2] < 0.55  # roughly uniform


def test_cluster_representatives_picks_best_quality(spark):
    docs = spark.createDataFrame(
        [(i, q) for i, q in enumerate([10, 50, 30, 99, 7, 7])],
        "doc_id long, n_chars long",
    )
    # clusters: {0,1,2} and {4,5}; doc 3 is a singleton
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5)], "id_a long, id_b long"
    )
    out = {
        r["cluster_id"]: r
        for r in cluster_representatives(docs, pairs).collect()
    }
    assert out[0]["keeper_id"] == 1 and out[0]["keeper_quality"] == 50
    assert out[0]["cluster_size"] == 3
    assert out[4]["keeper_id"] == 4  # quality tie 7==7 -> smaller id
    assert out[3]["keeper_id"] == 3 and out[3]["cluster_size"] == 1
    assert len(out) == 3


def test_cluster_representatives_no_window_in_plan(spark):
    docs = spark.range(20).select(
        F.col("id").alias("doc_id"), (F.col("id") * 3).alias("n_chars"))
    pairs = spark.createDataFrame([(0, 1)], "id_a long, id_b long")
    plan = (
        cluster_representatives(docs, pairs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan  # argmax is max_by, never row_number


def test_shard_assign_exact_sizes_and_determinism(spark):
    docs = spark.range(103).select(F.col("id").alias("doc_id"))
    a = shard_assign(docs, 25, num_partitions=4).toPandas()
    sizes = a.groupby("shard_id").size().sort_index()
    assert list(sizes) == [25, 25, 25, 25, 3]
    assert sorted(a["seq_id"]) == list(range(103))
    b = shard_assign(docs.repartition(7), 25, num_partitions=2).toPandas()
    m = a.merge(b, on="doc_id", suffixes=("_a", "_b"))
    assert (m["seq_id_a"] == m["seq_id_b"]).all()
    assert (m["shard_id_a"] == m["shard_id_b"]).all()
    with pytest.raises(ValueError, match="shard_size"):
        shard_assign(docs, 0)


def test_curate_keep_best_dsir_and_shards(spark, tmp_path):
    """curate() with near_keep='best', a DSIR target and sharded
    output: the LONGEST near-dup member survives, the DSIR stage cuts
    to k docs biased toward the target, and the written corpus carries
    dense seq_id + shard_id."""
    from jobs.curate import curate

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs through the green field near the old barn "
            "while the farmer watches the sky and the clouds drift")
    rows = [(1, base, "src0"),
            # near dup of 1, LONGER -> keep-best keeps 2, drops 1
            (2, base + " and the evening settles over the quiet farm",
             "src0")]
    # docs 3..22: mutually DISTINCT vocab (every 3-gram contains a
    # doc-unique token, so no cross-doc near-dup pairs), English-gated
    # via the interleaved "the"
    rows += [
        (i, " ".join("the w%dx%d y%dz%d" % (i, j, i, j)
                     for j in range(8)), "src1")
        for i in range(3, 23)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    target = docs.where("doc_id >= 3 and doc_id < 8")
    out = str(tmp_path / "curated")
    curated, stats = curate(
        spark, docs, jaccard=0.5, near_keep="best",
        dsir_target=target, dsir_k=10, shard_size=4, out=out,
    )
    kept = sorted(r["doc_id"] for r in curated.collect())
    assert 2 not in kept or 1 not in kept  # the near-dup pair collapsed
    assert stats["after_near_dedup"] == 21
    assert stats["after_dsir"] == 10 and len(kept) == 10
    assert stats["n_shards"] == 3  # ceil(10 / 4)
    got = curated.select("seq_id", "shard_id").toPandas()
    assert sorted(got["seq_id"]) == list(range(10))
    assert set(got["shard_id"].astype(int)) == {0, 1, 2}


def test_curate_rejects_bad_near_keep(spark):
    from jobs.curate import curate

    docs = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="near_keep"):
        curate(spark, docs, near_keep="typo")


def test_curate_dsir_params_must_pair(spark):
    from jobs.curate import curate

    docs = spark.createDataFrame(
        [(1, "a b c", "s")], "doc_id long, text string, source string")
    with pytest.raises(ValueError, match="dsir"):
        curate(spark, docs, dsir_target=docs)  # k missing
    with pytest.raises(ValueError, match="dsir"):
        curate(spark, docs, dsir_k=5)  # target missing


def test_incremental_near_dups_vs_batch(spark):
    """Incremental dedup of a new batch against the standing corpus
    finds exactly the cross-set pairs the full batch run finds, and
    never reports new-vs-new or old-vs-old pairs."""
    from watermark_detector_spark.operators.dedup import (
        incremental_near_dups,
        near_dup_pairs,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs through the green field near the old barn")
    rows = [
        (1, base),                                  # corpus
        (2, "a completely different story about ships and the open "
            "sea where the sailors watch the horizon all night"),
        (3, base + " at dusk"),                     # new: near-dups 1
        (4, "the mountain stands alone above the frozen lake while "
            "the wind carves deep lines into the ancient ice"),  # new: clean
        (5, base + " at dawn"),                     # new: near-dups 1 (and 3)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    corpus = docs.where("doc_id <= 2")
    new = docs.where("doc_id >= 3")
    inc = incremental_near_dups(new, corpus, threshold=0.5).collect()
    got = {(r["new_id"], r["dup_of"]) for r in inc}
    assert got == {(3, 1), (5, 1)}
    # cross-check against the full-batch operator restricted to
    # cross-set pairs (id_a < id_b puts the old doc first)
    full = near_dup_pairs(docs, threshold=0.5).collect()
    cross = {(r["id_b"], r["id_a"]) for r in full
             if r["id_a"] <= 2 and r["id_b"] >= 3}
    assert got == cross
    # jaccard values match the batch computation
    jz = {(r["new_id"], r["dup_of"]): r["jaccard"] for r in inc}
    jf = {(r["id_b"], r["id_a"]): r["jaccard"] for r in full
          if (r["id_b"], r["id_a"]) in jz}
    assert jz == jf


def test_corpus_mix_ratios_budget_and_determinism(spark):
    """corpus_mix: (a) unlisted sources dropped; (b) with budget=None
    the most-demanded source is taken whole and others scale to the
    tempered ratios; (c) an explicit small budget downsamples every
    source near T*p_s; (d) membership is deterministic (re-run picks
    identical rows); (e) validation raises before any job."""
    from watermark_detector_spark.operators.sampling import corpus_mix

    docs = spark.range(3000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("s"), (F.col("id") % 3).cast("string"))
        .alias("source"))
    # temperature=1, weights 2:1 over s0:s1 — s2 unlisted
    got = corpus_mix(docs, {"s0": 2.0, "s1": 1.0}).toPandas()
    per = got.groupby("source").size().to_dict()
    assert set(per) == {"s0", "s1"}
    # n_s = 1000 each; p = (2/3, 1/3); T* = 1000/(2/3) = 1500 ->
    # s0 taken whole, s1 at rate 1500*(1/3)/1000 = 0.5
    assert per["s0"] == 1000
    assert abs(per["s1"] - 500) < 60  # md5-bucket binomial noise
    # explicit budget: 300 -> rates 0.2 / 0.1
    small = corpus_mix(docs, {"s0": 2.0, "s1": 1.0}, budget=300).toPandas()
    sper = small.groupby("source").size().to_dict()
    assert abs(sper["s0"] - 200) < 45 and abs(sper["s1"] - 100) < 35
    # the small draw is deterministic and (same salt+thresholds rule)
    # re-runs pick the identical rows
    again = corpus_mix(docs, {"s0": 2.0, "s1": 1.0}, budget=300).toPandas()
    assert set(small["doc_id"]) == set(again["doc_id"])
    # temperature flattens: T -> inf approaches uniform proportions
    flat = corpus_mix(docs, {"s0": 8.0, "s1": 1.0}, temperature=1e9,
                      budget=600).toPandas()
    fper = flat.groupby("source").size().to_dict()
    assert abs(fper["s0"] - fper["s1"]) < 70
    import pytest as _pt
    with _pt.raises(ValueError, match="weight"):
        corpus_mix(docs, {"s0": -1.0})
    with _pt.raises(ValueError, match="temperature"):
        corpus_mix(docs, {"s0": 1.0}, temperature=0)
    with _pt.raises(ValueError, match="budget"):
        corpus_mix(docs, {"s0": 1.0}, budget=0)


def test_curate_mix_stage(spark, tmp_path):
    """curate(mix=...): the mix stage runs after selection, drops
    unlisted sources, and the funnel stats stay monotone; bad mix
    params raise before any job."""
    from jobs.curate import curate

    # per-doc-unique vocab (no cross-doc near-dups), English-gated via
    # the interleaved "the" — same fixture family as the dsir test
    rows = [
        (i, " ".join("the w%dx%d y%dz%d" % (i, j, i, j)
                     for j in range(8)), "s%d" % (i % 4))
        for i in range(60)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string")
    _, stats = curate(
        spark, docs, repetition_gate=False, pii_scrub=False,
        mix={"s0": 1.0, "s1": 1.0}, mix_budget=20,
        out=str(tmp_path / "mixed"))
    assert "after_mix" in stats
    assert stats["after_mix"] <= stats["after_near_dedup"]
    mixed = spark.read.parquet(str(tmp_path / "mixed"))
    assert mixed.count() == stats["after_mix"] > 0
    assert set(r["source"] for r in mixed.select("source")
               .distinct().collect()) <= {"s0", "s1"}
    with pytest.raises(ValueError, match="temperature"):
        curate(spark, docs, mix={"s0": 1.0}, mix_temperature=-1)


def test_neardup_index_persisted_two_ingests(spark, tmp_path):
    """NearDupIndex (the 100 TB ingest shape): corpus signatures built
    ONCE into the sink table; two successive ingests probe it from
    disk, each appending its own signatures — so the SECOND batch's
    probe sees the FIRST batch's docs, and every probe matches the
    recompute path (incremental_near_dups) row-for-row."""
    from watermark_detector_spark.operators.dedup import (
        NearDupIndex,
        incremental_near_dups,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs through the green field near the old barn")
    docs = spark.createDataFrame(
        [
            (1, base),                                  # corpus
            (2, "a completely different story about ships and the open "
                "sea where the sailors watch the horizon all night"),
            (3, base + " at dusk"),                     # batch 1: dups 1
            (4, "the mountain stands alone above the frozen lake while "
                "the wind carves deep lines into the ancient ice"),
            (5, base + " at dawn"),                     # batch 2: dups 1 AND 3
            (6, "under the city the old trains sleep in tiled tunnels "
                "where yellow lamps hum against the damp brick walls"),
        ],
        "doc_id long, text string")
    corpus = docs.where("doc_id <= 2")
    b1 = docs.where("doc_id in (3, 4)")
    b2 = docs.where("doc_id in (5, 6)")

    idx = NearDupIndex(str(tmp_path / "ndi"), threshold=0.5)
    with pytest.raises(ValueError, match="empty"):
        idx.ingest(spark, b1, corpus)  # must build first
    idx.build(corpus)
    idx.build(corpus)  # replay: exactly-once no-op
    assert idx.sink.committed_batches() == [0]

    h1 = idx.ingest(spark, b1, corpus)
    assert {(r["new_id"], r["dup_of"]) for r in h1.collect()} == {(3, 1)}
    assert idx.sink.committed_batches() == [0, 1]

    indexed = corpus.unionByName(b1)
    h2 = idx.ingest(spark, b2, indexed).collect()
    got2 = {(r["new_id"], r["dup_of"]) for r in h2}
    assert (5, 3) in got2, "second batch must see the first batch's docs"
    assert got2 == {(5, 1), (5, 3)}
    # equivalence vs the recompute path, jaccard included
    rec = incremental_near_dups(b2, indexed, threshold=0.5).collect()
    assert ({(r["new_id"], r["dup_of"], r["jaccard"]) for r in h2}
            == {(r["new_id"], r["dup_of"], r["jaccard"]) for r in rec})


def test_incremental_near_dups_precomputed_sigs(spark):
    """corpus_sigs= (the cached-index parameter curate.py --dedup-sigs
    feeds): identical result to the inline derivation."""
    from watermark_detector_spark.operators.dedup import (
        incremental_near_dups,
        minhash_signatures,
    )

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs through the green field near the old barn")
    docs = spark.createDataFrame(
        [(1, base), (3, base + " at dusk"), (5, base + " at dawn")],
        "doc_id long, text string")
    corpus = docs.where("doc_id = 1")
    new = docs.where("doc_id > 1")
    inline = incremental_near_dups(new, corpus, threshold=0.5).collect()
    cached = incremental_near_dups(
        new, corpus, threshold=0.5,
        corpus_sigs=minhash_signatures(corpus)).collect()
    key = lambda rows: {(r["new_id"], r["dup_of"], r["jaccard"])  # noqa: E731
                        for r in rows}
    assert key(inline) == key(cached)
    assert {(r["new_id"], r["dup_of"]) for r in cached} == {(3, 1), (5, 1)}


def test_curate_dedup_against_standing_corpus(spark):
    """curate(dedup_against=...): batch docs near-dupping the standing
    corpus are dropped and counted; unrelated docs survive."""
    from jobs.curate import curate

    base = ("the quick brown fox jumps over the lazy dog and then "
            "the fox runs through the green field near the old barn "
            "while the farmer watches the sky and the clouds drift")
    corpus = spark.createDataFrame(
        [(100, base)], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(1, base + " at dusk"),  # near-dups corpus doc 100
         (2, ("the river flows past the village where the miller "
              "grinds the corn and the children play by the water "
              "under the bridge while the birds sing in the trees"))],
        "doc_id long, text string")
    batch = batch.withColumn("source", F.lit("s"))
    curated, stats = curate(spark, batch, dedup_against=corpus)
    kept = sorted(r["doc_id"] for r in curated.collect())
    assert kept == [2]
    assert stats["corpus_dups_dropped"] == 1
    assert stats["after_near_dedup"] == 2  # both survived BATCH dedup


def test_group_split_never_straddles(spark):
    """hash_split keyed on the GROUP: every group lands wholly in one
    split (the leakage-proof property q113 demonstrates)."""
    from watermark_detector_spark.operators.sampling import hash_split

    docs = spark.range(500).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("site"), (F.col("id") % 37).cast("string"))
        .alias("source"),
    )
    out = hash_split(docs, {"train": 0.8, "val": 0.1, "test": 0.1},
                     key_col="source")
    per_group = (out.groupBy("source")
                 .agg(F.countDistinct("split").alias("n"))
                 .agg(F.max("n")).collect()[0][0])
    assert per_group == 1


def test_trailing_range_window_single_exchange(spark):
    """q114's RANGE-frame window plans ONE hash Exchange on the key —
    the frame is evaluated per partition with a sliding pointer, never
    a second shuffle."""
    import __spark_entry__ as entry

    df = entry.queries()["q114_trailing_range_window"](
        spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" in plan


def test_dsir_ratio_join_is_broadcast(spark, corpus):
    """The per-doc scoring join must broadcast the (≤n_buckets)-row
    log-ratio table — the corpus-side (id, bucket) rows never shuffle
    for the join itself (PLANS.md §q109)."""
    w = dsir_log_weights(corpus, corpus.where(F.col("doc_id") < 10))
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
