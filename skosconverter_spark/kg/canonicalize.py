"""Canonicalization closure (north_star; SURVEY.md §2.8 R4).

Two distributed fixpoints, both driver-loop + localCheckpoint per
iteration (lineage truncation):

- ``connected_components``: equivalence closure over undirected edges
  (skos:exactMatch ∪ owl:sameAs) via min-id label propagation — the
  alternating small-star/large-star contraction specialized to the
  shallow equivalence graphs vocabularies produce. Each iteration is
  one join + one groupBy; convergence when no node's component id
  changes. Component id = min uri in the component (deterministic).

- ``transitive_closure``: ancestor reachability over directed edges
  (skos:broader), doubling the reach per iteration (path doubling:
  O(log depth) rounds instead of O(depth)).

``canonicalize_triples`` rewrites subj/obj through the component map so
all aliases collapse onto the canonical node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from skosconverter_spark.config import OWL_SAME_AS, SKOS_EXACT_MATCH


def equivalence_edges(triples: DataFrame) -> DataFrame:
    """Undirected (src, dst) pairs from exactMatch/sameAs."""
    e = triples.filter(F.col("pred").isin(SKOS_EXACT_MATCH, OWL_SAME_AS)).select(
        F.col("subj").alias("src"), F.col("obj").alias("dst")
    )
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()


def connected_components(
    edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """(uri, component): min-uri label propagation to fixpoint.

    Nodes not in ``edges`` are their own components by definition and
    need no rows here (callers coalesce on join).

    Raises RuntimeError if the fixpoint has not converged after
    ``max_iterations`` single-hop rounds (graph diameter > budget) —
    a silently split component would mean silently-wrong downstream
    results (e.g. retained near-duplicates in prepare_corpus).
    """
    if edges.isEmpty():
        # no equivalence edges (the common case for a plain web corpus):
        # skip the eager-checkpoint fixpoint machinery entirely. Empty
        # result derives its schema from the input so callers with
        # non-string node ids (e.g. long doc_ids) compose cleanly.
        return edges.select(
            F.col("src").alias("uri"), F.col("src").alias("component")
        ).limit(0)
    comp = (
        edges.select(F.col("src").alias("uri"))
        .unionByName(edges.select(F.col("dst").alias("uri")))
        .distinct()
        .withColumn("component", F.col("uri"))
        .localCheckpoint(eager=True)
    )
    converged = False
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(comp.withColumnRenamed("uri", "dst"), "dst")
            .groupBy(F.col("src").alias("uri"))
            .agg(F.min("component").alias("nbr_component"))
        )
        new_comp = (
            comp.join(neighbor_min, "uri", "left")
            .select(
                "uri",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nbr_component"), F.col("component")),
                ).alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_comp.alias("n")
            .join(comp.alias("o"), "uri")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        comp = new_comp
        if changed == 0:
            converged = True
            break
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "iterations (graph diameter exceeds the budget); raise "
            "max_iterations"
        )
    return comp


def transitive_closure(
    edges: DataFrame, max_iterations: int = 25
) -> DataFrame:
    """(descendant, ancestor) reachability over directed (child, parent)
    edges, by path doubling — reach 2^k hops after k rounds."""
    if edges.isEmpty():
        return edges.sparkSession.createDataFrame(
            [], "descendant string, ancestor string"
        )
    reach = edges.select(
        F.col("child").alias("descendant"), F.col("parent").alias("ancestor")
    ).distinct().localCheckpoint(eager=True)
    converged = False
    for _ in range(max_iterations):
        doubled = (
            reach.alias("a")
            .join(
                reach.alias("b"),
                F.col("a.ancestor") == F.col("b.descendant"),
            )
            .select(
                F.col("a.descendant").alias("descendant"),
                F.col("b.ancestor").alias("ancestor"),
            )
        )
        new_reach = (
            reach.unionByName(doubled)
            .filter(F.col("descendant") != F.col("ancestor"))  # cycles don't self-report
            .distinct()
            .localCheckpoint(eager=True)
        )
        if new_reach.count() == reach.count():
            reach = new_reach
            converged = True
            break
        reach = new_reach
    if not converged:
        raise RuntimeError(
            f"transitive_closure did not converge in {max_iterations} "
            "doubling rounds (path depth exceeds 2^budget); raise "
            "max_iterations"
        )
    return reach


def canonical_map(triples: DataFrame, max_iterations: int = 25) -> DataFrame:
    """(uri, canonical): every aliased node → its component's min uri."""
    comp = connected_components(equivalence_edges(triples), max_iterations)
    return comp.select("uri", F.col("component").alias("canonical"))


def canonicalize_triples(triples: DataFrame, max_iterations: int = 25) -> DataFrame:
    """Rewrite subj/obj through the canonical map (identity for nodes
    outside any equivalence class); drop equivalence self-loops; dedup."""
    cmap = canonical_map(triples, max_iterations)
    if cmap.isEmpty():
        # nothing to rewrite: the dedup aggregation is the whole job
        return (
            triples.groupBy("subj", "pred", "obj", "obj_lang")
            .agg(
                F.min(F.struct("seq", "src_url", "obj_is_literal"))[
                    "obj_is_literal"
                ].alias("obj_is_literal"),
                F.min("src_url").alias("src_url"),
                F.min("seq").alias("seq"),
            )
            .select(
                "subj", "pred", "obj", "obj_is_literal", "obj_lang", "src_url", "seq"
            )
        )
    t = (
        triples.join(
            cmap.select(F.col("uri").alias("subj"), F.col("canonical").alias("subj_c")),
            "subj",
            "left",
        )
        .join(
            cmap.select(F.col("uri").alias("obj"), F.col("canonical").alias("obj_c")),
            "obj",
            "left",
        )
        .select(
            F.coalesce(F.col("subj_c"), F.col("subj")).alias("subj"),
            "pred",
            F.when(F.col("obj_is_literal"), F.col("obj"))
            .otherwise(F.coalesce(F.col("obj_c"), F.col("obj")))
            .alias("obj"),
            "obj_is_literal",
            "obj_lang",
            "src_url",
            "seq",
        )
    )
    # a canonicalized exactMatch/sameAs within one component becomes a
    # self-loop — definitionally true, dropped
    t = t.filter(
        ~(
            F.col("pred").isin(SKOS_EXACT_MATCH, OWL_SAME_AS)
            & (F.col("subj") == F.col("obj"))
        )
    )
    return (
        t.groupBy("subj", "pred", "obj", "obj_lang")
        .agg(
            # deterministic pick (min-seq discipline, D6) — see
            # sources.parse_udf.ok_triples
            F.min(F.struct("seq", "src_url", "obj_is_literal"))[
                "obj_is_literal"
            ].alias("obj_is_literal"),
            F.min("src_url").alias("src_url"),
            F.min("seq").alias("seq"),
        )
        .select("subj", "pred", "obj", "obj_is_literal", "obj_lang", "src_url", "seq")
    )
