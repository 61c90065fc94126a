"""Deterministic sampling / quota operators for corpus construction:
hash-bucket train/val/test splits and per-key quota caps.

Corpus pipelines must never use `rand()` for splits — re-runs would
reshuffle documents across train/val/test (leakage across checkpoints,
irreproducible evals). Both operators here are pure functions of the
data: the split is an md5-bucket of the key (stable across runs,
engines, and partitionings — which is also what makes them
DuckDB-oracle-able), and the quota cap is a rank over a deterministic
ordering. Both are single-shuffle shapes at 10^12 rows: the split is
shuffle-FREE (a scan-side column), the cap is one keyed window pass.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

N_BUCKETS = 10_000


def hash_bucket(key: Column, n_buckets: int = N_BUCKETS) -> Column:
    """Stable bucket in [0, n_buckets): first 8 hex chars of
    md5(str(key)) mod n_buckets. Engine-portable (md5 of UTF-8 bytes)."""
    h = F.md5(key.cast("string").cast("binary"))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
            % n_buckets)


def hash_split(df: DataFrame, weights: dict[str, float],
               key_col: str = "doc_id",
               split_col: str = "split") -> DataFrame:
    """Assign every row a deterministic split label with the given
    weights (must sum to ~1; resolution 1/N_BUCKETS). Rows ride the
    scan — no shuffle, no rand(), stable under re-runs and
    repartitioning, so eval membership can never drift between
    pipeline executions.

    ``weights`` must sum to 1 within the bucket resolution (a typo'd
    dict would otherwise silently dump the remainder into the last
    split). Rows with a NULL ``key_col`` hash to NULL, fail every
    ``when`` threshold, and land in the LAST split — deterministic,
    but usually a data bug, so it is documented rather than hidden."""
    if not weights:
        raise ValueError("hash_split: weights must be non-empty")
    if any(v < 0 for v in weights.values()):
        raise ValueError(f"hash_split: negative weight in {weights}")
    total = sum(weights.values())
    if abs(total - 1.0) >= 1.0 / N_BUCKETS:
        raise ValueError(
            f"hash_split: weights sum to {total!r}, expected 1.0 "
            f"(±{1.0 / N_BUCKETS})")
    bucket = hash_bucket(F.col(key_col))
    expr = None
    cum = 0.0
    names = list(weights)
    for name in names[:-1]:
        cum += weights[name]
        cond = bucket < int(round(cum * N_BUCKETS))
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(names[-1])
    return df.withColumn(split_col, expr)


def domain_cap(df: DataFrame, cap: int, key_col: str = "source",
               order_col: str = "doc_id") -> DataFrame:
    """Keep at most ``cap`` rows per key, chosen by the deterministic
    ``order_col`` ranking — the head-domain quota every web-scale
    corpus applies so a handful of giant hosts can't dominate training
    data. One keyed window pass (rank + filter), no join."""
    w = W.partitionBy(key_col).orderBy(order_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def stratified_sample(df: DataFrame, fractions: dict[str, float],
                      stratum_col: str = "lang",
                      key_col: str = "doc_id") -> DataFrame:
    """Deterministic per-stratum sampling: keep a hash-stable fraction
    of each stratum (e.g. downsample head languages, keep all of tail
    ones) — the language/domain rebalancing step of corpus
    construction. Like hash_split, membership is a pure function of
    the KEY (md5 bucket < fraction * N_BUCKETS), so re-runs, engine
    ports and repartitioning all select the same rows — never
    sample()/rand(), which would reshuffle the corpus every run.
    Strata absent from ``fractions`` are kept whole (fraction 1.0).
    Zero shuffle: one scan-side predicate."""
    for s, f in fractions.items():
        if not (0.0 <= f <= 1.0):
            raise ValueError(
                f"stratified_sample: fraction for {s!r} is {f}, "
                "expected [0, 1]")
    bucket = hash_bucket(F.col(key_col))
    frac = None
    for s, f in fractions.items():
        thr = F.lit(int(round(f * N_BUCKETS)))
        frac = (F.when(F.col(stratum_col) == s, thr) if frac is None
                else frac.when(F.col(stratum_col) == s, thr))
    frac = F.lit(N_BUCKETS) if frac is None else frac.otherwise(N_BUCKETS)
    return df.where(bucket < frac)
