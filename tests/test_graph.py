"""operators/graph.pagerank: hand-checked fixed point, Python-reference
equality (the 9dp per-round rounding is the cross-engine determinism
guarantee), mass conservation, partitioning invariance, and DuckDB
oracle parity on a literal edge table. The full staged pipeline
(jaccard edges -> pagerank) runs through the driver contract in
test_staged_seats."""

from collections import defaultdict

import duckdb
import pytest

from kafka_connect_oss_spark.operators import graph
from tests.parity import compare


def ref_pagerank(pairs, n_iters=5, d=0.85):
    nbrs = defaultdict(list)
    for a, b in pairs:
        nbrs[a].append(b)
        nbrs[b].append(a)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    inv = 1.0 / len(nbrs)
    r = {v: round(inv, 9) for v in nbrs}
    for _ in range(n_iters):
        c = defaultdict(float)
        for u, ns in nbrs.items():
            for v in ns:
                c[v] += r[u] / deg[u]
        r = {v: round((1.0 - d) * inv + d * c.get(v, 0.0), 9)
             for v in nbrs}
    return {v: round(rv, 6) for v, rv in r.items()}


PAIRS_PATH = [(1, 2), (2, 3)]                       # path graph
PAIRS_HUB = [(1, 2), (1, 3), (1, 4), (1, 5), (4, 5), (6, 7)]  # hub + island


def _spark_pagerank(spark, pairs, **kw):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    return {r.node: r.rank
            for r in graph.pagerank(df, **kw).collect()}


def test_path_graph_matches_reference(spark):
    got = _spark_pagerank(spark, PAIRS_PATH)
    assert got == ref_pagerank(PAIRS_PATH)
    # the middle node of a path is the most central
    assert got[2] > got[1] == got[3]


def test_hub_graph_matches_reference(spark):
    got = _spark_pagerank(spark, PAIRS_HUB, n_iters=7)
    assert got == ref_pagerank(PAIRS_HUB, n_iters=7)
    assert got[1] == max(got.values())   # the hub dominates


def test_mass_conserved(spark):
    got = _spark_pagerank(spark, PAIRS_HUB)
    # symmetrized graph has no dangling nodes: total rank stays 1 up to
    # the per-round rounding drift
    assert abs(sum(got.values()) - 1.0) < 1e-5


def test_partitioning_invariance(spark):
    df = spark.createDataFrame(PAIRS_HUB, "id_a long, id_b long")
    a = {r.node: r.rank for r in graph.pagerank(df).collect()}
    b = {r.node: r.rank
         for r in graph.pagerank(df.repartition(7)).collect()}
    assert a == b


def test_oracle_parity_literal_edges(spark):
    vals = ", ".join(f"({a}, {b})" for a, b in PAIRS_HUB)
    cte = f"SELECT * FROM (VALUES {vals}) t(id_a, id_b)"
    df = spark.createDataFrame(PAIRS_HUB, "id_a long, id_b long")
    con = duckdb.connect()
    try:
        compare(graph.pagerank(df, n_iters=5), con,
                graph.pagerank_oracle_sql(cte, n_iters=5),
                "pagerank_literal")
    finally:
        con.close()


def test_zero_iterations_is_uniform(spark):
    got = _spark_pagerank(spark, PAIRS_PATH, n_iters=0)
    assert set(got.values()) == {round(round(1.0 / 3, 9), 6)}
