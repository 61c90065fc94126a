"""Iterative graph analytics over DataFrames: PageRank.

Web-curation pipelines rank hosts/domains by link authority (Common
Crawl's harmonic-centrality host ranking; quality weighting à la
CCNet/RefinedWeb keeps "well-linked" domains). Connected components
(operators/dedup.dedup_clusters) covers the dedup side of graph work;
this module adds the ranking side with the same iterative-DataFrame
discipline.

Design for 100 TB (|E| ~ 10^11 edges, |V| ~ 10^8 nodes):
- the EDGE table is the big one and it is STATIONARY: repartitioned by
  src once, persisted, and never reshuffled — every per-iteration join
  reuses its hash partitioning. Only the rank vector (|V| rows, three
  orders of magnitude smaller) moves between executors each round.
- per-iteration driver traffic is at most ONE scalar (the dangling
  mass), never a vertex or edge collection.
- lineage is truncated every round (localCheckpoint, or a parquet
  round-trip when ``checkpoint_dir`` is given for preemptible-node
  durability) — the classic iterative-DataFrame trap otherwise grows
  the plan tree exponentially, same as dedup_clusters.
- FIXED iteration count, not a convergence test: deterministic output
  (replayable in any SQL engine as a chained-CTE oracle) and no
  per-round count() barrier in the common path.

Reference parity: the reference has no graph operator; this is part of
the training-data-pipeline extension surface (SURVEY.md §2 extras)
alongside dedup/decontamination/DSIR.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(edges: DataFrame, src: str = "src", dst: str = "dst",
             damping: float = 0.85, n_iters: int = 5,
             checkpoint_dir: str | None = None) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank)``.

    Semantics (the textbook power-iteration form, fixed ``n_iters``):
    nodes = distinct(src) ∪ distinct(dst); rank₀ = 1/N; each round

        rank'(v) = (1-d)/N + d·(Σ_{u→v} rank(u)/outdeg(u) + D/N)

    where D is the total rank mass sitting on DANGLING nodes (out-degree
    zero), redistributed uniformly so the ranks keep summing to 1. The
    dangling scalar is only computed when the graph actually has
    dangling nodes (one count up front decides).

    The caller supplies the edge list as-is — dedup or self-loop
    removal is the caller's policy, not this operator's.

    Scale shape: edges are hash-partitioned by ``src`` once and
    persisted; each iteration shuffles (a) the |V|-row rank vector to
    meet them and (b) the contribution stream into its groupBy(dst) —
    the |E|-row table itself never moves. The returned DataFrame is the
    final checkpointed rank table (consume before deleting
    ``checkpoint_dir``).
    """
    if n_iters < 1:
        raise ValueError(f"n_iters must be >= 1, got {n_iters}")
    if not 0.0 < damping < 1.0:
        raise ValueError(f"damping must be in (0, 1), got {damping}")

    def _truncate(df: DataFrame, name: str) -> DataFrame:
        if checkpoint_dir is None:
            return df.localCheckpoint(eager=True)
        path = os.path.join(checkpoint_dir, name)
        df.write.mode("overwrite").parquet(path)
        return df.sparkSession.read.parquet(path)

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    outdeg = (e.groupBy("src")
              .agg(F.count(F.lit(1)).cast("double").alias("deg")))
    # out-degree is a property of the STATIONARY edge table — join it in
    # once and persist (src-partitioned): each iteration joins the rank
    # vector against ONE prepared table (no ranks ⋈ outdeg shuffle per
    # round), and e_deg is the only persisted copy of the edges (the
    # historical separate src-partitioned edge persist was a second
    # materialization of |E| rows for no per-round benefit).
    e_deg = (e.join(outdeg, "src").repartition("src")
             .select("src", "dst", "deg").persist())
    nodes = (e_deg.select(F.col("src").alias("node"))
             .union(e_deg.select(F.col("dst").alias("node")))
             .distinct().persist())
    n = nodes.count()  # one scalar; also materializes the persists
    if n == 0:
        for cached in (e_deg, nodes):
            cached.unpersist()
        raise ValueError("pagerank over an empty edge list: no nodes")
    dangling = (nodes.join(e_deg.select("src").distinct(),
                           nodes.node == F.col("src"), "left_anti")
                .persist())
    has_dangling = dangling.count() > 0

    base = (1.0 - damping) / n
    ranks = nodes.select("node", F.lit(1.0 / n).alias("rank"))
    try:
        for i in range(n_iters):
            dang_mass = 0.0
            if has_dangling:
                dang_mass = (ranks.join(dangling, "node")
                             .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
                             .first()[0])
            contrib = (e_deg.join(ranks, e_deg.src == ranks.node)
                       .groupBy(F.col("dst").alias("node"))
                       .agg(F.sum(F.col("rank") / F.col("deg")).alias("s")))
            new_ranks = nodes.join(contrib, "node", "left").select(
                "node",
                (F.lit(base) + F.lit(damping)
                 * (F.coalesce(F.col("s"), F.lit(0.0))
                    + F.lit(dang_mass / n))).alias("rank"))
            if has_dangling or i == n_iters - 1:
                # with dangling nodes every round is materialized anyway
                # (the dang_mass scalar); without them the rank vector is
                # referenced exactly once per round, so the plan grows
                # LINEARLY — chain the rounds lazily and truncate once at
                # the end (one materialization job instead of one per
                # round; identical arithmetic).
                ranks = _truncate(new_ranks, f"ranks_{i % 2}")
            else:
                ranks = new_ranks
        return ranks
    finally:
        for cached in (nodes, e_deg, dangling):
            cached.unpersist()
