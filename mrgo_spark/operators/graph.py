"""Graph analytics over relational tables (extension surface).

The reference has no graph operators (its closest relative is the
dup-cluster connected components in dedup.py); these are the
Pregel-shaped algorithms a training-data pipeline runs on entity
graphs — implemented with the same exact-determinism recipe as
kmeans_lloyd so the full iterative fold is oracle-checkable: scaled
integer state, floor division only on non-negative values (where
DuckDB's truncating ``//`` and Python's flooring ``//`` agree), and
a fixed iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12  # integer probability mass; floor loss ≤ N per step
PR_DAMP_NUM = 85  # damping 0.85 as an exact 85/100 rational


def bipartite_edges(lineitem: DataFrame) -> DataFrame:
    """Undirected order–part co-occurrence graph from lineitem:
    node ids are disjoint by parity (order → 2k, part → 2k+1); each
    distinct (order, part) line contributes both directions."""
    e = lineitem.select(
        (F.col("l_orderkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    return e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )


def pagerank(
    edges: DataFrame, iters: int = 3, top: int | None = 100
) -> DataFrame:
    """Fixed-point PageRank, exact and oracle-replayable.

    State is integer mass r(v) starting at PR_SCALE // N; one step is
    r'(v) = (15·(PR_SCALE//N)) // 100 + (85·Σ_{u→v} r(u)//deg(u)) // 100
    — every operation an integer floor on non-negative values, so the
    result is bit-identical in Spark, DuckDB and a Python replay.
    (This is standard damped PageRank with floor() in place of real
    division; the floor loss per step is < N/PR_SCALE of total mass.)
    Undirected edges mean no dangling nodes.

    Scale shape (Pregel-on-DataFrames): per iteration one broadcast-
    eligible join with the degree table, one shuffle of (dst, contrib)
    partial-aggregated map-side, and a localCheckpoint to sever the
    iteration lineage (the connected-components lesson — unchecked
    chained iterations blow up Catalyst analysis). The edge table is
    checkpointed once and reused; at 100 TB it would be bucketed on
    src so every iteration's join is co-located.

    Returns the top ``top`` nodes by (rank_fx DESC, node) —
    deterministic under ties — or every node unsorted when ``top``
    is None (a huge limit would make TakeOrdered allocate a
    limit-sized priority queue and OOM). Columns: (node, rank_fx).
    """
    edges = edges.localCheckpoint(eager=False)
    deg = edges.groupBy("src").agg(F.count("*").alias("deg")).select(
        F.col("src").alias("node"), "deg"
    )
    deg = deg.localCheckpoint(eager=False)
    n = deg.count()
    base = PR_SCALE // n
    b15 = (15 * base) // 100
    r = deg.select("node", F.lit(base).cast("long").alias("rank_fx"))
    for _ in range(iters):
        contrib = r.join(deg, "node").select(
            "node", F.expr("rank_fx div deg").alias("contrib")
        )
        inbox = (
            contrib.join(edges, contrib.node == edges.src)
            .groupBy("dst")
            .agg(F.sum("contrib").alias("inbox"))
        )
        r = inbox.select(
            F.col("dst").alias("node"),
            (
                F.lit(b15).cast("long")
                + F.expr(f"({PR_DAMP_NUM} * inbox) div 100")
            ).alias("rank_fx"),
        ).localCheckpoint(eager=False)
    if top is None:
        return r
    return r.orderBy(F.desc("rank_fx"), F.asc("node")).limit(top)


def coorder_part_edges(lineitem: DataFrame) -> DataFrame:
    """Canonical (p1 < p2) part co-purchase edges: parts appearing in
    the same order. The self-join shuffles on l_orderkey only and the
    DISTINCT collapses repeat co-purchases; at 100 TB both stages
    bucket on their keys and a per-order part-count cap (orders are
    bounded at 7 lines in TPC-H) bounds the quadratic blowup."""
    op = lineitem.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    ).distinct()
    a, b = op.alias("a"), op.alias("b")
    return (
        a.join(b, (F.col("a.o") == F.col("b.o"))
               & (F.col("a.p") < F.col("b.p")))
        .select(F.col("a.p").alias("p1"), F.col("b.p").alias("p2"))
        .distinct()
    )


def triangle_counts(edges: DataFrame, top: int = 20) -> DataFrame:
    """Per-node triangle participation over canonical (p1 < p2)
    undirected edges — the classic wedge-close join: e1(a,b) ⋈ e2(b,c)
    builds each a<b<c wedge exactly once, e3(a,c) closes it, so every
    triangle is enumerated once with no orientation double-count.
    Each closed triangle credits all three corners; output is the top
    ``top`` nodes by (tri_cnt DESC, node) — bounded, deterministic.

    Scale: all three legs are the SAME relation shuffled on its join
    key — at 100 TB the edge table is bucketed once on p1; the wedge
    stream is never materialized, it flows straight into the closing
    join's shuffle. The edge frame is checkpointed so the three scans
    share one computed lineage. CAVEAT: under id-canonical ordering
    the wedge fan-out at a node is quadratic in its degree, so one hot
    node dominates at scale — ``triangle_counts_degree_ordered`` is
    the production form (identical output, parity-tested); this one
    stays as the readable spec and differential twin."""
    e = edges.localCheckpoint(eager=False)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.p2") == F.col("e2.p1"))
        .join(
            e3,
            (F.col("e3.p1") == F.col("e1.p1"))
            & (F.col("e3.p2") == F.col("e2.p2")),
        )
        .select(
            F.col("e1.p1").alias("a"),
            F.col("e1.p2").alias("b"),
            F.col("e2.p2").alias("c"),
        )
    )
    # Explode-once, not a 3-way UNION of projections: a UNION would
    # re-run the whole wedge-close join per branch (no exchange reuse
    # across differing projections — the multi-grain lesson).
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    per = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("tri_cnt")
    )
    return per.orderBy(F.desc("tri_cnt"), F.asc("node")).limit(top)


def triangle_counts_degree_ordered(edges: DataFrame, top: int = 20) -> DataFrame:
    """Degree-ordered triangle counting (compact-forward): identical
    output to ``triangle_counts`` — per-node participation, top
    ``top`` by (tri_cnt DESC, node) — but each edge is re-oriented
    from its lower-(degree, id) endpoint to its higher one before the
    wedge join, so wedges are built only at a node's OUT-neighbors.
    Every node's out-degree under this orientation is O(sqrt(|E|)),
    which bounds total wedge volume by O(|E|^1.5) regardless of skew
    (the id-canonical form is quadratic in the hottest node's degree
    — one celebrity part with d co-purchases makes d²/2 wedges; here
    its edges all point INTO it, so it closes wedges instead of
    fanning them out). This is the 100 TB form; the canonical twin is
    the readable spec it is parity-tested against.

    Correctness: rank nodes by (deg, id) — a strict total order. A
    triangle {x,y,z} with rank x<y<z has oriented edges x→y, x→z,
    y→z; the join builds the wedge x→y→z once and the closing edge
    x→z matches once, so each triangle is enumerated exactly once.

    Scale shape: one degree aggregate (node-domain-sized), two
    broadcast-or-shuffle joins to attach endpoint degrees, then the
    same three-scan self-join as the canonical form over the
    checkpointed ORIENTED edge frame (the checkpoint both shares one
    lineage across the scans and is the Generate-pushdown barrier
    idiom)."""
    e = edges.localCheckpoint(eager=False)
    deg = (
        e.select(F.col("p1").alias("node"))
        .unionAll(e.select(F.col("p2").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("long").alias("deg"))
    )
    j = e.join(
        deg.select(F.col("node").alias("p1"), F.col("deg").alias("d1")),
        "p1",
    ).join(
        deg.select(F.col("node").alias("p2"), F.col("deg").alias("d2")),
        "p2",
    )
    lower_first = (F.col("d1") < F.col("d2")) | (
        (F.col("d1") == F.col("d2")) & (F.col("p1") < F.col("p2"))
    )
    o = j.select(
        F.when(lower_first, F.col("p1")).otherwise(F.col("p2")).alias("src"),
        F.when(lower_first, F.col("p2")).otherwise(F.col("p1")).alias("dst"),
    ).localCheckpoint(eager=False)
    o1, o2, o3 = o.alias("o1"), o.alias("o2"), o.alias("o3")
    tri = (
        o1.join(o2, F.col("o1.dst") == F.col("o2.src"))
        .join(
            o3,
            (F.col("o3.src") == F.col("o1.src"))
            & (F.col("o3.dst") == F.col("o2.dst")),
        )
        .select(
            F.col("o1.src").alias("a"),
            F.col("o1.dst").alias("b"),
            F.col("o2.dst").alias("c"),
        )
    )
    corners = tri.select(F.explode(F.array("a", "b", "c")).alias("node"))
    per = corners.groupBy("node").agg(
        F.count("*").cast("long").alias("tri_cnt")
    )
    return per.orderBy(F.desc("tri_cnt"), F.asc("node")).limit(top)
