"""Distributed graph scoring: fixed-point integer PageRank over an
edge list — the authority-scoring companion to the connected-components
pass in ``dedup.py`` (same edge inputs, different question: CC answers
"which docs are the same?", PageRank "which doc is the hub?" — the
standard keep-the-canonical-page signal in web-corpus curation).

Arithmetic discipline: ranks are BIGINT fixed-point (``scale`` units =
rank 1.0) and every step is integer — contribution is floor-division by
degree, the damping update is ``(15*scale + 85*sum) div 100``. Integer
sums are associative, so the result is BIT-EXACT regardless of
partitioning, merge order, or engine — a float PageRank cannot be
hash-gated across engines because double addition is order-sensitive;
this one replays cell-for-cell in the DuckDB oracle's unrolled CTEs.

Scale shape: degree is joined ONCE outside the loop (the edge×degree
relation is loop-invariant and persisted); each iteration is one
shuffle join (ranks onto edge sources) plus one partial-agg groupBy
(sum contributions per destination) — the textbook Pregel/GraphX
PageRank round without the dependency. State per round is one
(node, rank) row per vertex. localCheckpoint truncates the iteration
lineage exactly like ``near_dup_components``.

Overflow bound: total rank mass is conserved at ≤ n·scale (the floor
divisions only shed mass), and in the worst case one hub's incoming
contribution sum approaches it, so keep ``85 * n_nodes * scale`` below
2^63 — the default 1e12 scale is safe to ~10^5 graph nodes (near-dup
components are far smaller); drop scale to 1e9 for ~10^8-node web
graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def undirected_edges(pairs: DataFrame) -> DataFrame:
    """(id_a < id_b) candidate pairs → both directed edges. Distinct
    pairs in, no duplicate directions out, so UNION ALL suffices."""
    return pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).unionAll(
        pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst"))
    )


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iter: int = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
) -> DataFrame:
    """Integer PageRank over a directed edge list (``src``, ``dst``)
    where every node has out-degree ≥ 1 (an undirected graph via
    ``undirected_edges`` guarantees it — no dangling-mass handling
    needed). Returns (id, rank_fp) after ``n_iter`` rounds from a
    uniform start of ``scale`` (= rank 1.0) per node.

    Update rule, all-integer:
        contrib(e)  = rank(src) div out_degree(src)
        rank'(dst)  = ((100-damping_pct)*scale
                       + damping_pct * sum(contrib)) div 100
    """
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop-invariant: every round re-reads edge+degree, never recomputes
    pre = edges.join(deg, "src").persist()
    pre.count()
    ranks = deg.select(
        F.col("src").alias("id"), F.lit(scale).cast("long").alias("r")
    )
    teleport = (100 - damping_pct) * scale
    for _ in range(n_iter):
        contribs = (
            pre.join(ranks, pre["src"] == ranks["id"])
            .select("dst", F.expr("r div deg").alias("contrib"))
            .groupBy("dst")
            .agg(F.sum("contrib").alias("s"))
        )
        ranks = contribs.select(
            F.col("dst").alias("id"),
            F.expr(f"({teleport} + {damping_pct} * s) div 100").alias("r"),
        )
        ranks = ranks.localCheckpoint(eager=True)  # cut lineage per round
    pre.unpersist()
    return ranks.select("id", F.col("r").alias("rank_fp"))
