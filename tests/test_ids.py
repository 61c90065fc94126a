"""Contiguous ID assignment + bottom-k sampling (operators/ids.py)."""

import pytest
from pyspark.sql import functions as F

from watermark_detector_spark.operators.ids import (
    assign_contiguous_ids,
    bottomk_sample,
)


@pytest.fixture()
def docs(spark):
    return spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.sha1(F.col("id").cast("string")).alias("text"),
    )


def test_ids_are_dense_and_ordered(spark, docs):
    # order by a hash so the assignment is a nontrivial permutation
    keyed = docs.withColumn("k", F.md5(F.col("doc_id").cast("string")))
    out = (
        assign_contiguous_ids(keyed, "k", num_partitions=7)
        .toPandas()
        .sort_values("k")
        .reset_index(drop=True)
    )
    assert list(out["seq_id"]) == list(range(1000))


def test_ids_invariant_to_input_partitioning(spark, docs):
    keyed = docs.withColumn("k", F.md5(F.col("doc_id").cast("string")))
    a = (
        assign_contiguous_ids(keyed, "k", num_partitions=5)
        .select("doc_id", "seq_id").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    b = (
        assign_contiguous_ids(keyed.repartition(13), "k", num_partitions=2)
        .select("doc_id", "seq_id").toPandas()
        .sort_values("doc_id").reset_index(drop=True)
    )
    assert (a["seq_id"].values == b["seq_id"].values).all()


def test_ids_existing_column_raises(spark, docs):
    with pytest.raises(ValueError, match="already exists"):
        assign_contiguous_ids(docs.withColumn("seq_id", F.lit(0)), "doc_id")


def test_ids_plan_has_no_single_partition_window(spark, docs):
    # the whole point vs ROW_NUMBER() OVER (ORDER BY ...): range
    # exchange + partition-local work, never a global one-task window.
    # stable=False keeps the lineage visible (the default's
    # localCheckpoint collapses the plan to a LogicalRDD scan)
    out = assign_contiguous_ids(
        docs, "doc_id", num_partitions=4, stable=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "rangepartitioning" in plan


def test_bottomk_is_deterministic_and_exact(spark, docs):
    a = bottomk_sample(docs, 37).toPandas().sort_values("doc_id")
    b = (
        bottomk_sample(docs.repartition(11), 37)
        .toPandas().sort_values("doc_id")
    )
    assert len(a) == 37
    assert list(a["doc_id"]) == list(b["doc_id"])
    # a different seed draws a different sample
    c = bottomk_sample(docs, 37, seed="s1").toPandas()
    assert set(c["doc_id"]) != set(a["doc_id"])


def test_bottomk_plans_take_ordered_no_exchange(spark, docs):
    plan = (
        bottomk_sample(docs, 5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Exchange" not in plan


def test_bottomk_k_larger_than_input(spark, docs):
    assert bottomk_sample(docs.limit(10), 50).count() == 10
    with pytest.raises(ValueError, match=">= 1"):
        bottomk_sample(docs, 0)
