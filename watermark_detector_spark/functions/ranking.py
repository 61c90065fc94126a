"""BM25 relevance ranking over a document table — the text-retrieval
scoring a training-data pipeline uses for corpus search, holdout
mining, and topic-targeted sampling.

Reference anchor: the reference pipeline scores/filters documents
before training (generate_dataset.py:1-239 filters by constructed
properties); BM25 (Robertson et al., Okapi) is the standard public
ranking function for the same select-by-relevance step at corpus
scale.

100 TB shape — ZERO wide shuffles by construction:
- tokenization and per-term term frequencies are pure array
  expressions riding the scan (``size(filter(tokens, t -> t = term))``
  per query term — no explode, no (doc, term) shuffle);
- corpus statistics (N, avgdl, per-term document frequency) reduce in
  ONE aggregate pass to a single row, which broadcast-cross-joins back
  onto the scan;
- the final top-k is ``orderBy().limit()`` — Spark plans
  TakeOrderedAndProject (per-partition heaps + driver merge of k rows),
  never a global sort.
So the cost is two codegen'd scans of the corpus and a k-row result,
independent of corpus size beyond IO.

Scores are emitted as HALF_UP-rounded integer micro-units
(``floor(score * 1e6 + 0.5)``) so an independent engine replaying the
same double-precision formula ranks identically (the q95 oracle does,
in DuckDB SQL).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# non-alphanumeric splitter: identical semantics in Spark's split()
# and DuckDB's string_split_regex(), both RE2-safe
_TOKEN_SPLIT = "[^a-z0-9]+"


def _tokens(text):
    return F.filter(F.split(F.lower(text), _TOKEN_SPLIT), lambda t: t != "")


def bm25_rank(docs: DataFrame, terms: list[str], k1: float = 1.2,
              b: float = 0.75, topk: int = 20, id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``topk`` documents by Okapi BM25 against a bag-of-words
    query, deterministically tie-broken by ``id_col``.

    score(d) = sum over query terms t of
        idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    with idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5)) — the
    non-negative BM25+ idf variant.

    Output: (id_col, score_micro, n_terms) where score_micro is the
    HALF_UP-rounded integer micro-score (engine-portable ranking key)
    and n_terms the count of query terms present in the document.
    """
    if not terms:
        raise ValueError("bm25_rank needs at least one query term")
    if len(set(terms)) != len(terms):
        raise ValueError(f"duplicate query terms: {terms}")
    toks = _tokens(F.col(text_col))

    def _tf(term: str):
        # NB: must be a real closure — a two-parameter lambda (e.g. the
        # `lambda t, term=term:` default-arg idiom) is interpreted by
        # F.filter as its (element, index) form and the "default" gets
        # bound to the index column
        return F.size(F.filter(toks, lambda t: t == term))

    tf_cols = [_tf(term).alias(f"_tf{i}") for i, term in enumerate(terms)]
    scored_src = docs.select(
        id_col, F.size(toks).alias("_dl"), *tf_cols)
    stats = scored_src.agg(
        F.count("*").alias("_n"),
        F.avg("_dl").alias("_avgdl"),
        *[F.sum((F.col(f"_tf{i}") > 0).cast("long")).alias(f"_df{i}")
          for i in range(len(terms))],
    )
    joined = scored_src.crossJoin(F.broadcast(stats))
    score = F.lit(0.0)
    n_terms = F.lit(0)
    for i in range(len(terms)):
        tf = F.col(f"_tf{i}").cast("double")
        dfreq = F.col(f"_df{i}").cast("double")
        idf = F.log(
            F.lit(1.0)
            + (F.col("_n").cast("double") - dfreq + F.lit(0.5))
            / (dfreq + F.lit(0.5)))
        denom = tf + F.lit(float(k1)) * (
            F.lit(1.0 - float(b))
            + F.lit(float(b)) * F.col("_dl").cast("double")
            / F.col("_avgdl"))
        score = score + F.when(
            F.col(f"_tf{i}") > 0,
            idf * tf * F.lit(float(k1) + 1.0) / denom).otherwise(0.0)
        n_terms = n_terms + (F.col(f"_tf{i}") > 0).cast("int")
    return (
        joined.select(
            id_col,
            F.floor(score * F.lit(1e6) + F.lit(0.5)).cast("long")
            .alias("score_micro"),
            n_terms.alias("n_terms"),
        )
        .where(F.col("n_terms") > 0)
        .orderBy(F.col("score_micro").desc(), F.col(id_col))
        .limit(topk)
    )


def bm25_score_py(texts: list[str], terms: list[str], k1: float = 1.2,
                  b: float = 0.75) -> list[float]:
    """Pure-Python reference of the same formula (test oracle only —
    NOT a distributed path)."""
    import re

    tok = [
        [t for t in re.split(_TOKEN_SPLIT, s.lower()) if t != ""]
        for s in texts
    ]
    n = len(tok)
    avgdl = sum(len(t) for t in tok) / n if n else 0.0
    dfreq = {t: sum(1 for d in tok if t in d) for t in terms}
    out = []
    for d in tok:
        s = 0.0
        for t in terms:
            tf = sum(1 for x in d if x == t)
            if tf == 0:
                continue
            idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
            s += idf * tf * (k1 + 1.0) / (
                tf + k1 * (1.0 - b + b * len(d) / avgdl))
        out.append(s)
    return out
