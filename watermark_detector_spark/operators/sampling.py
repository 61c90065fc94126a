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


def corpus_mix(df: DataFrame, weights: dict[str, float],
               temperature: float = 1.0, budget: int | None = None,
               source_col: str = "source", key_col: str = "doc_id",
               salt: str = "mix") -> DataFrame:
    """Per-source corpus MIXING with temperature — the post-selection
    assembly step every training pipeline runs (combine curated
    sources at target proportions, e.g. web 0.5 / code 0.3 / books
    0.2, optionally temperature-flattened the way multilingual
    pipelines upsample tail languages).

    Target proportion p_s ∝ weights[s]^(1/temperature), normalized
    over the listed sources (τ=1 uses the weights as given; τ→∞ →
    uniform; τ<1 sharpens). With a doc ``budget`` T the expected take
    from source s is T·p_s, so the acceptance rate is
    min(1, T·p_s / n_s); with budget=None the largest feasible budget
    is used — T* = min_s n_s/p_s, i.e. the most-demanded source is
    taken whole and every other source is scaled to preserve the
    target RATIOS (never oversampling: this operator selects, it does
    not replicate).

    Acceptance is an md5-bucket threshold per source on a SALTED key
    (independent of hash_split / stratified_sample buckets), so
    membership is a pure function of the data: deterministic across
    runs, engines and partitionings — DuckDB replays the whole
    derivation, thresholds included. Sources not in ``weights`` are
    dropped. Proportions normalize over the LISTED sources: a listed
    source absent from the corpus keeps its probability mass, which
    then goes unfilled (the budget under-fills rather than silently
    re-normalizing the mix toward the sources that happen to exist). Scale shape: one per-source count agg (rows = number of
    sources — collected, bounded by construction), then the corpus
    rides the scan through a literal CASE predicate: zero shuffle."""
    import math

    if not weights:
        raise ValueError("corpus_mix: weights must be non-empty")
    if any(w <= 0 for w in weights.values()):
        raise ValueError(f"corpus_mix: non-positive weight in {weights}")
    if temperature <= 0:
        raise ValueError(f"corpus_mix: temperature must be > 0, got "
                         f"{temperature}")
    if budget is not None and budget <= 0:
        raise ValueError(f"corpus_mix: budget must be > 0, got {budget}")
    pw = {s: w ** (1.0 / temperature) for s, w in weights.items()}
    tot = sum(pw.values())
    p = {s: v / tot for s, v in pw.items()}
    in_mix = df.where(F.col(source_col).isin(list(weights)))
    counts = {r[source_col]: r["n"]
              for r in in_mix.groupBy(source_col)
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    present = [s for s in weights if counts.get(s)]
    if not present:
        return in_mix.where(F.lit(False))
    t_star = (budget if budget is not None
              else min(counts[s] / p[s] for s in present))
    thr = {s: int(math.floor(min(1.0, t_star * p[s] / counts[s])
                             * N_BUCKETS))
           for s in present}
    bucket = hash_bucket(
        F.concat(F.lit(salt + ":"), F.col(key_col).cast("string")))
    cond = None
    for s in present:
        c = F.lit(thr[s])
        cond = (F.when(F.col(source_col) == s, c) if cond is None
                else cond.when(F.col(source_col) == s, c))
    return in_mix.where(bucket < cond.otherwise(F.lit(0)))


def hash_uniform(key: Column, salt: str = "u0") -> Column:
    """Deterministic uniform in (0, 1): first 8 md5 hex nibbles of
    ``salt:key`` scaled by 2^32, with a half-step offset so the value
    is never exactly 0 or 1 (log / log-log transforms stay finite).
    The portable replacement for rand() wherever a *reproducible*
    random draw per key is needed (Gumbel sampling, jitter, A/B
    hashing) — identical in any engine that has md5."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8),
        16, 10,
    ).cast("bigint")
    return (h.cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))


def dsir_log_weights(source: DataFrame, target: DataFrame,
                     n: int = 2, n_buckets: int = 4096,
                     alpha: float = 1.0, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): per-document
    log-importance of raw ``source`` docs toward the distribution of a
    small curated ``target`` corpus, under hashed word-n-gram
    bag-of-features models.

    log w(doc) = sum over the doc's n-gram occurrences of
    log p_target(bucket) - log p_source(bucket), with each
    distribution an add-``alpha``-smoothed multinomial over
    ``n_buckets`` md5 hash buckets. Docs with fewer than ``n`` tokens
    have no features and are omitted (their weight is undefined).

    100 TB shape: both bucket-count tables are at most ``n_buckets``
    rows — tiny — so the per-doc scoring join BROADCASTs the log-ratio
    table; the only big-data shuffles are the two bucket groupBys
    (partial-aggregated, key space = n_buckets) and the final per-doc
    sum (one shuffle on the doc key). The n-gram hashing itself is
    scan-side JVM expression work (transform over the token array +
    md5/conv) — no UDF, no explode of raw text across the wire beyond
    the (id, bucket) pairs. Returns (id_col, n_grams, log_w).

    Reference analog: the role of train_watermarks.py's dataset
    curation step — selecting which raw examples enter training.
    """
    from .dedup import _shingles_expr
    from ..functions.text import tokens_col

    if n < 1:
        raise ValueError("dsir_log_weights: n must be >= 1")
    if alpha <= 0:
        raise ValueError("dsir_log_weights: alpha must be > 0 "
                         "(unsmoothed ratios divide by zero)")

    def _buckets(df: DataFrame) -> DataFrame:
        toks = tokens_col(F.col(text_col))
        return (
            df.select(F.col(id_col), toks.alias("_toks"))
            .where(F.size("_toks") >= n)
            .select(
                id_col,
                F.explode(
                    F.transform(
                        _shingles_expr(F.col("_toks"), n),
                        lambda s: hash_bucket(s, n_buckets),
                    )
                ).alias("bucket"),
            )
        )

    src_b = _buckets(source)
    tgt_cnt = (_buckets(target).groupBy("bucket")
               .agg(F.count(F.lit(1)).alias("cnt_t")))
    src_cnt = src_b.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt_s"))
    totals = (
        src_cnt.agg(F.sum("cnt_s").alias("_s"))
        .crossJoin(tgt_cnt.agg(F.sum("cnt_t").alias("_t")))
    )
    a, ab = F.lit(float(alpha)), F.lit(float(alpha * n_buckets))
    ratio = F.broadcast(
        src_cnt.join(tgt_cnt, "bucket", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.coalesce(F.col("cnt_t"), F.lit(0)) + a)
                      / (F.col("_t") + ab))
                - F.log((F.col("cnt_s") + a) / (F.col("_s") + ab))
            ).alias("log_r"),
        )
    )
    return (
        src_b.join(ratio, "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum("log_r").alias("log_w"),
        )
    )


def importance_resample(df: DataFrame, k: int,
                        weight_col: str = "log_w",
                        key_col: str = "doc_id",
                        seed: str = "s0",
                        sel_col: str = "sel_key") -> DataFrame:
    """Draw ``k`` rows ~ proportional-to-exp(weight) WITHOUT
    replacement via the Gumbel top-k trick: rank by
    ``weight + Gumbel(0,1)`` and keep the k largest. The Gumbel noise
    comes from :func:`hash_uniform` (g = -ln(-ln(u))), so the draw is
    a pure function of (seed, key, weight): re-runs, engine ports and
    repartitionings select the SAME sample — this is reservoir
    sampling with weights, made deterministic.

    Plans as TakeOrderedAndProject: per-partition k-heaps merged on
    the driver, no global sort Exchange; only k rows per partition
    cross the wire."""
    if k < 1:
        raise ValueError("importance_resample: k must be >= 1")
    g = -F.log(-F.log(hash_uniform(F.col(key_col), salt="gum:" + seed)))
    return (
        df.withColumn(sel_col, F.col(weight_col) + g)
        .orderBy(F.desc(sel_col))
        .limit(k)
    )
