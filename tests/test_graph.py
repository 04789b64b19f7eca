"""PageRank: exact three-way cross-check + invariants."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from mrgo_spark.operators import graph
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _python_pagerank(edge_list, iters=3):
    deg = defaultdict(int)
    for s, _ in edge_list:
        deg[s] += 1
    n = len(deg)
    base = graph.PR_SCALE // n
    b15 = (15 * base) // 100
    r = {v: base for v in deg}
    for _ in range(iters):
        inbox = defaultdict(int)
        for s, d in edge_list:
            inbox[d] += r[s] // deg[s]
        r = {v: b15 + (85 * m) // 100 for v, m in inbox.items()}
    return r


def test_pagerank_matches_python_replay(spark):
    li = load_table(spark, SF, "lineitem")
    edges = graph.bipartite_edges(li)
    edge_list = [(r.src, r.dst) for r in edges.collect()]
    expect = _python_pagerank(edge_list)
    top = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0]))[:100]
    got = [(r.node, r.rank_fx) for r in graph.pagerank(edges).collect()]
    assert got == top


def test_pagerank_mass_conserved_within_floor_loss(spark):
    li = load_table(spark, SF, "lineitem")
    edges = graph.bipartite_edges(li)
    n = edges.select("src").distinct().count()
    full = graph.pagerank(edges, top=None)
    total = full.agg(F.sum("rank_fx")).first()[0]
    # each of 3 steps loses < n units to contribution floors plus
    # < 1 unit per node to the /100 floors; and the initial split
    # loses < n. Bound generously.
    assert graph.PR_SCALE * 0.97 < total <= graph.PR_SCALE
    # parts-only and orders-only parity split: both sides present
    kinds = {r.node % 2 for r in full.limit(50).collect()}
    assert kinds == {0, 1}
