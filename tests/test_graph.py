"""pagerank (operators/graph.py): invariants on planted graphs.

The DuckDB oracle (graph_pagerank) already value-checks the iteration
bit-for-bit on the TPC-H interaction graph; these pin the algebraic
properties a PageRank must have, on graphs where they're checkable by
eye.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from skosconverter_spark.operators.graph import pagerank


def edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_path_graph(spark):
    # a - b - c: symmetric ends, center dominates
    e = edges_df(spark, [("a", "b"), ("b", "c")])
    got = {r.node: r.rank for r in pagerank(e, iterations=5).collect()}
    assert set(got) == {"a", "b", "c"}
    # undirected + no dangling -> total mass conserved (up to rounding)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    assert got["a"] == got["c"]  # symmetry is exact, not approximate
    assert got["b"] > got["a"]


def test_pagerank_star_center_dominates(spark):
    e = edges_df(spark, [("hub", f"leaf{i}") for i in range(8)])
    got = {r.node: r.rank for r in pagerank(e, iterations=4).collect()}
    leaves = [v for k, v in got.items() if k != "hub"]
    assert got["hub"] > max(leaves)
    assert len(set(leaves)) == 1  # all leaves exactly equal


def test_pagerank_partition_invariance_and_duplicate_edges(spark):
    # duplicate and reversed edges must not change the graph
    base = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a"), ("a", "c")]
    e1 = edges_df(spark, base)
    e2 = edges_df(spark, base + [("b", "a"), ("a", "b"), ("c", "a")]).repartition(7)
    r1 = sorted(map(tuple, pagerank(e1, iterations=3).collect()))
    r2 = sorted(map(tuple, pagerank(e2, iterations=3).collect()))
    assert r1 == r2
