"""Embedding similarity search: brute-force cosine (baseline oracle) and
an LSH-bucketed approximate path for scale.

Vectors are ``array<float>`` columns; all arithmetic is built-in
(``zip_with`` + ``aggregate`` run inside the JVM) — no Python in the
pairwise loop. At 100 TB the brute-force O(N²) join is replaced by
``lsh_bucketed_topk``: random-hyperplane sign buckets (SimHash for
vectors) shrink each join side to a bucket; brute force stays as the
in-bucket scorer and the small-scale correctness oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(_dot(a, a))


def with_norm(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    return df.withColumn("_norm", _norm(F.col(vec_col)))


def cosine_pairs_expr(df: DataFrame, threshold: float = 0.45,
                      id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold via pure column expressions
    (zip_with/aggregate). Reference implementation: correct everywhere,
    but higher-order-function lambdas evaluate interpreted — use
    ``cosine_pairs`` (GEMM-blocked) for anything beyond toy sizes."""
    n = with_norm(df, vec_col)
    a = n.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("_va"),
                 F.col("_norm").alias("_na"))
    b = n.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("_vb"),
                 F.col("_norm").alias("_nb"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.round(_dot(F.col("_va"), F.col("_vb")) / (F.col("_na") * F.col("_nb")), 4)
            .alias("cosine"),
        )
        .where(F.col("cosine") >= F.lit(threshold))
    )


def cosine_pairs(df: DataFrame, threshold: float = 0.45,
                 id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """All pairs with cosine >= threshold — GEMM-blocked.

    The scale shape: the normalized matrix is broadcast once (an
    embedding dim table is small next to the corpus: 10^6 x 64 floats =
    256 MB); each partition multiplies its row block against it with
    numpy (BLAS) and emits only pairs above threshold. One Python
    transit, zero shuffle, no per-pair expression evaluation. Beyond
    broadcastable sizes the same kernel runs per LSH bucket
    (``lsh_bucketed_topk``)."""
    import numpy as np
    import pandas as pd

    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([r[1] for r in rows], dtype=np.float64)
    mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sc = df.sparkSession.sparkContext
    b_ids, b_mat = sc.broadcast(ids), sc.broadcast(mat)

    def _block(batches):
        all_ids, all_mat = b_ids.value, b_mat.value
        for pdf in batches:
            q = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = q / np.linalg.norm(q, axis=1, keepdims=True)
            qids = pdf[id_col].to_numpy()
            cos = q @ all_mat.T  # BLAS GEMM
            out_a, out_b, out_c = [], [], []
            for i in range(len(qids)):
                mask = (cos[i] >= threshold - 5e-5) & (all_ids > qids[i])
                for j in np.nonzero(mask)[0]:
                    c = round(float(cos[i, j]), 4)
                    if c >= threshold:
                        out_a.append(int(qids[i]))
                        out_b.append(int(all_ids[j]))
                        out_c.append(c)
            yield pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    return df.select(id_col, vec_col).mapInPandas(
        _block, schema="id_a long, id_b long, cosine double"
    )


def brute_force_topk(df: DataFrame, k: int = 3, n_queries: int | None = 10,
                     id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Exact top-k neighbors per query vector (queries = first
    ``n_queries`` ids, or all). Ordering on the UNROUNDED cosine with id
    tiebreak — deterministic."""
    n = with_norm(df, vec_col)
    q = n.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_vq"),
                 F.col("_norm").alias("_nq"))
    if n_queries is not None:
        q = q.where(F.col("query_id") < n_queries)
    c = n.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vc"),
                 F.col("_norm").alias("_nc"))
    scored = (
        F.broadcast(q).crossJoin(c)
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "neighbor_id",
            (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_nq") * F.col("_nc"))).alias("_cos"),
        )
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("_cos"), 4).alias("cosine"))
    )


def random_hyperplanes(dim: int, n_planes: int = 8, seed: int = 42) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes (hash-seeded, no RNG
    state) for sign-LSH."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = int.from_bytes(
                hashlib.blake2b(f"{seed}:{p}:{d}".encode(), digest_size=8).digest(), "big"
            )
            row.append((h / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket(vec: Column, planes: list[list[float]]) -> Column:
    """Sign-pattern bucket id for a vector under the given hyperplanes."""
    bits = [
        F.when(
            _dot(vec, F.array(*[F.lit(v) for v in plane])) >= 0, F.lit("1")
        ).otherwise(F.lit("0"))
        for plane in planes
    ]
    return F.concat(*bits)


def lsh_bucketed_topk(df: DataFrame, dim: int, k: int = 3, n_planes: int = 6,
                      n_tables: int = 8, id_col: str = "vec_id",
                      vec_col: str = "embedding", seed: int = 42) -> DataFrame:
    """Approximate top-k via multi-table sign-LSH: L independent hash
    tables of ``n_planes`` hyperplanes each; candidates = union over
    tables of same-bucket pairs, then scored brute-force once.

    Recall for a pair at angle θ is 1-(1-(1-θ/π)^n_planes)^n_tables —
    tunable. The scale path: each table's join is 2^n_planes-way
    partitioned; candidate dedup is one distinct on (query, neighbor)."""
    n = with_norm(df, vec_col)
    buckets = F.array(*[
        F.struct(
            F.lit(t).alias("table"),
            lsh_bucket(F.col(vec_col),
                       random_hyperplanes(dim, n_planes, seed + 1000 * t)).alias("bucket"),
        )
        for t in range(n_tables)
    ])
    n = n.withColumn("_tb", F.explode(buckets)).select(
        id_col, vec_col, "_norm",
        F.col("_tb.table").alias("_table"), F.col("_tb.bucket").alias("_bucket"),
    )
    a = n.select(F.col(id_col).alias("query_id"), "_table", "_bucket")
    b = n.select(F.col(id_col).alias("neighbor_id"), "_table", "_bucket")
    cand = (
        a.join(b, ["_table", "_bucket"])
        .where(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = with_norm(df, vec_col)
    q = vecs.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_vq"),
                    F.col("_norm").alias("_nq"))
    c = vecs.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_vc"),
                    F.col("_norm").alias("_nc"))
    scored = cand.join(q, "query_id").join(c, "neighbor_id").select(
        "query_id", "neighbor_id",
        (_dot(F.col("_vq"), F.col("_vc")) / (F.col("_nq") * F.col("_nc"))).alias("_cos"),
    )
    w = W.partitionBy("query_id").orderBy(F.desc("_cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round(F.col("_cos"), 4).alias("cosine"))
    )
