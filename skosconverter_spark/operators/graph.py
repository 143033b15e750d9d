"""Generic graph operators (beyond the KG-specific connected components
and transitive closure in kg/canonicalize.py).

``pagerank`` is the classic iterative message-passing workload — the
shape every distributed graph engine optimizes for — expressed as plain
DataFrame algebra so Catalyst plans it: one edge⋈rank join plus two hash
aggregations per iteration, loop lineage cut by localCheckpoint (the
AQE-blowup rule for loop-built plans).

Determinism contract (what makes a SQL oracle possible for an ITERATIVE
float algorithm): per-edge contributions are round(rank/deg, 12) summed
as DECIMAL(20,12) — exact and order-free under partial aggregation — and
each new rank is one double expression of exact inputs, re-rounded. Any
engine replaying the same schedule gets bit-identical ranks at every
iteration, so the oracle (chained CTEs, one per iteration) value-matches
instead of "approximately agreeing".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    iterations: int = 3,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(node, rank) after ``iterations`` rounds of undirected PageRank.

    The edge set is symmetrized (u→v implies v→u), which also removes
    dangling nodes — every node in the graph has out-degree ≥ 1, so no
    mass-leak correction term is needed and the semantics stay
    oracle-expressible. Ranks start uniform at round(1/N, 12).

    Plan per iteration: edges ⋈ ranks on src (shuffle on the uniform
    node key), per-edge contribution as an exact decimal, one dst-keyed
    hash agg, then a left join back to the node table for the damping
    update. The node table, degree table and symmetrized edges are
    computed once and checkpointed."""
    e = edges.select(src, dst).distinct()
    und = (
        e.unionByName(e.select(F.col(dst).alias(src), F.col(src).alias(dst)))
        .distinct()
        .localCheckpoint(eager=True)
    )
    nodes = und.select(F.col(src).alias("node")).distinct().localCheckpoint(eager=True)
    deg = und.groupBy(src).agg(F.count("*").alias("deg"))
    n_df = nodes.agg(F.count("*").alias("n"))
    ranks = (
        nodes.crossJoin(F.broadcast(n_df))
        .select(
            "node",
            F.round(F.lit(1.0) / F.col("n"), 12).cast("decimal(20,12)").alias("rank"),
        )
        .localCheckpoint(eager=True)
    )
    for _ in range(iterations):
        contrib = (
            und.join(ranks, F.col(src) == F.col("node"))
            .join(deg, src)
            .select(
                F.col(dst).alias("node"),
                F.round(F.col("rank").cast("double") / F.col("deg"), 12)
                .cast("decimal(20,12)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(n_df))
            .select(
                "node",
                F.round(
                    (1.0 - damping) / F.col("n")
                    + damping
                    * F.coalesce(F.col("contrib").cast("double"), F.lit(0.0)),
                    12,
                )
                .cast("decimal(20,12)")
                .alias("rank"),
            )
            .localCheckpoint(eager=True)  # cut the loop lineage before reuse
        )
    return ranks.select("node", F.col("rank").cast("double").alias("rank"))


def triangle_counts(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """(node, n_triangles) for every node in ≥1 triangle — the classic
    clustering/community-density statistic over a materialized graph
    table.

    Degree-ordered edge orientation (the MapReduce triangle algorithm of
    Suri & Vassilvitskii 2011): each undirected edge points from its
    lower-(degree, id) endpoint to the higher one, so wedges are only
    enumerated AT their lowest-degree vertex. A hub of degree d that
    would naively generate d²/2 wedges generates almost none — its
    edges all point INTO it — which bounds the wedge stage by
    Σ min-degree² instead of Σ degree²; the skew-defusing move that
    makes triangle counting feasible on power-law graphs. Every
    triangle is emitted exactly once (at its min-(degree,id) vertex),
    pure integer counting — no float parity concerns.

    Plan: dedup/canonicalize edges (one shuffle), degree hash agg, two
    1:1 joins to attach degrees, the oriented wedge self-join, a
    semi-join against the canonical edge set to close each wedge, one
    explode + hash agg for per-node counts."""
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .unionAll(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("deg"))
    )
    ed = e.join(
        deg.select(F.col("node").alias("a"), F.col("deg").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("deg").alias("db")), "b")
    lo = F.struct(F.col("da").alias("d"), F.col("a").alias("n"))
    hi = F.struct(F.col("db").alias("d"), F.col("b").alias("n"))
    o = ed.select(
        F.when(lo < hi, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(lo < hi, F.col("b")).otherwise(F.col("a")).alias("v"),
    ).localCheckpoint(eager=True)
    wedges = (
        o.select(F.col("u"), F.col("v").alias("v1"))
        .join(o.select(F.col("u"), F.col("v").alias("v2")), "u")
        .filter(F.col("v1") < F.col("v2"))
    )
    tri = wedges.join(
        e,
        (F.col("v1") == F.col("a")) & (F.col("v2") == F.col("b")),
        "left_semi",
    )
    return (
        tri.select(
            F.explode(F.array(F.col("u"), F.col("v1"), F.col("v2"))).alias(
                "node"
            )
        )
        .groupBy("node")
        .agg(F.count("*").alias("n_triangles"))
    )
