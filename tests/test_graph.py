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


def _py_triangles(edges):
    """Per-node triangle counts on canonical (a<b) edge tuples."""
    es = set(edges)
    nbr = defaultdict(set)
    for a, b in es:
        nbr[a].add(b)
        nbr[b].add(a)
    cnt: dict = defaultdict(int)
    for a, b in es:  # enumerate each a<b<c triangle exactly once
        if a > b:
            a, b = b, a
        common = (x for x in nbr[a] & nbr[b] if x > b)
        for c in common:
            cnt[a] += 1
            cnt[b] += 1
            cnt[c] += 1
    return dict(cnt)


def test_triangle_counts_tiny_known(spark):
    # K4 on {1,2,3,4}: every node is in C(3,2)=3 triangles; plus a
    # pendant edge (4,5) adding none.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "p1 long, p2 long")
    got = {r.node: r.tri_cnt for r in graph.triangle_counts(df, top=10).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}
    assert _py_triangles(edges) == got


def test_triangle_counts_matches_python_on_fixture(spark):
    li = load_table(spark, SF, "lineitem")
    e = graph.coorder_part_edges(li)
    edges = [(r.p1, r.p2) for r in e.collect()]
    want = _py_triangles(edges)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r.node, r.tri_cnt)
        for r in graph.triangle_counts(e, top=20).collect()
    ]
    assert got == top


def test_triangle_degree_ordered_parity_on_fixture(spark):
    # the production (degree-oriented) form returns bit-identical
    # output to the canonical spec on the real co-purchase graph
    li = load_table(spark, SF, "lineitem")
    e = graph.coorder_part_edges(li)
    canon = [
        (r.node, r.tri_cnt)
        for r in graph.triangle_counts(e, top=20).collect()
    ]
    do = [
        (r.node, r.tri_cnt)
        for r in graph.triangle_counts_degree_ordered(e, top=20).collect()
    ]
    assert do == canon


def test_triangle_degree_ordered_skewed_hot_node(spark):
    # one celebrity node 0 adjacent to everyone (the case the
    # id-canonical orientation is quadratic in): star 0-{1..40} plus
    # a ring 1-2, 2-3, ..., 40-1 => every ring edge closes a triangle
    # with the hub; node 0 participates in 40 triangles, ring nodes
    # in 2 each. Degree orientation points every star edge INTO the
    # hub (deg 40 vs 3), so the hub fans out zero wedges.
    star = [(0, i) for i in range(1, 41)]
    ring = [(i, i + 1) for i in range(1, 40)] + [(1, 40)]
    edges = sorted({(min(a, b), max(a, b)) for a, b in star + ring})
    df = spark.createDataFrame(edges, "p1 long, p2 long")
    want = _py_triangles(edges)
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [
        (r.node, r.tri_cnt)
        for r in graph.triangle_counts_degree_ordered(df, top=50).collect()
    ]
    assert got == top
    assert want[0] == 40 and want[1] == 2


def test_triangle_degree_ordered_tiny_known(spark):
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5)]
    df = spark.createDataFrame(edges, "p1 long, p2 long")
    got = {
        r.node: r.tri_cnt
        for r in graph.triangle_counts_degree_ordered(df, top=10).collect()
    }
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_degree_assortativity_known_and_symmetric(spark):
    from mrgo_spark.registry import load as load_registry

    Q, _ = load_registry()
    r = Q["degree_assortativity_copurchase"](spark, SF).collect()[0]
    # symmetrized edge list => endpoint-degree marginals identical
    assert r.varx_num == r.vary_num and r.n % 2 == 0
    # Newman's r on P3 (path 1-2-3) is exactly -1: replay the same
    # integer pipeline on a hand graph
    edges = [(1, 2), (2, 3)]
    sym = edges + [(b, a) for a, b in edges]
    deg = {}
    for a, _ in sym:
        deg[a] = deg.get(a, 0) + 1
    xs = [deg[a] for a, _ in sym]
    ys = [deg[b] for _, b in sym]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    num, var = n * sxy - sx * sy, n * sxx - sx * sx
    assert num / var == -1.0
