"""PageRank (operators/graph.py): fixed-iteration power method with
dangling-mass redistribution, stationary edge table, per-round lineage
truncation."""

import pytest
from pyspark.sql import Row

from watermark_detector_spark.operators.graph import pagerank


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=a, dst=b) for a, b in pairs])


def _ranks(df):
    return {r["node"]: r["rank"] for r in df.collect()}


def test_two_node_cycle_is_uniform_fixed_point(spark):
    r = _ranks(pagerank(_edges(spark, [(0, 1), (1, 0)]), n_iters=3))
    assert r == {0: pytest.approx(0.5, abs=1e-12),
                 1: pytest.approx(0.5, abs=1e-12)}


def test_dangling_mass_redistributes_and_sums_to_one(spark):
    # a -> b, b dangling. After one iteration from uniform (1/2, 1/2):
    # D = rank(b) = 0.5; a gets 0.15/2 + 0.85*(0 + 0.25)     = 0.2875
    #               b gets 0.15/2 + 0.85*(0.5 + 0.25)        = 0.7125
    r = _ranks(pagerank(_edges(spark, [(0, 1)]), n_iters=1))
    assert r[0] == pytest.approx(0.2875, abs=1e-12)
    assert r[1] == pytest.approx(0.7125, abs=1e-12)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-12)


def test_rank_mass_conserved_over_iterations(spark):
    pairs = [(i, (i * 3 + 1) % 7) for i in range(7) if i != (i * 3 + 1) % 7]
    pairs += [(2, 9)]  # 9 is dangling
    r = _ranks(pagerank(_edges(spark, pairs), n_iters=5))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert len(r) == 7  # node 3's only edge was a self-loop (dropped)


def test_durable_checkpoint_matches_local(spark, tmp_path):
    pairs = [(i, (i * 5 + 2) % 9) for i in range(9) if i != (i * 5 + 2) % 9]
    e = _edges(spark, pairs)
    a = _ranks(pagerank(e, n_iters=4))
    b = _ranks(pagerank(e, n_iters=4, checkpoint_dir=str(tmp_path / "ck")))
    assert a == b  # bit-identical: same plan, same float op order


def test_pagerank_validates_args(spark):
    e = _edges(spark, [(0, 1)])
    with pytest.raises(ValueError, match="n_iters"):
        pagerank(e, n_iters=0)
    with pytest.raises(ValueError, match="damping"):
        pagerank(e, damping=1.0)
    with pytest.raises(ValueError, match="empty edge list"):
        pagerank(e.where("src > 100"))
