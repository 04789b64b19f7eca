"""KMV distinct sketch — estimator accuracy, merge law, and a
pure-Python replay of the full hash/order-statistic/estimator chain
(third leg next to Spark and the DuckDB oracle).

Reference parity note: the reference engine has no sketch analog
(pure extension per the training-pipeline mandate; the verifiable
twin of approx_count_distinct)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from mrgo_spark.operators import sketch
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_kmv(values, k=sketch.KMV_K):
    hs = sorted(
        {
            int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
            for v in values
        }
    )[:k]
    n_kept = len(hs)
    kth = hs[-1]
    est = n_kept if n_kept < k else ((k - 1) * sketch.KMV_SPACE) // kth
    return n_kept, kth, est


def test_kmv_matches_python_replay(spark):
    li = load_table(spark, SF, "lineitem")
    got = {
        r.grp: (r.n_kept, r.kth_min, r.kmv_estimate)
        for r in sketch.kmv_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    rows = li.select("l_returnflag", "l_partkey").collect()
    groups: dict[str, set] = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, set()).add(r.l_partkey)
    want = {g: _py_kmv(vs) for g, vs in groups.items()}
    assert got == want


def test_kmv_estimate_accuracy(spark):
    # relative error ~ 1/sqrt(k-2) ~ 13% at k=64; pin a generous 3x
    li = load_table(spark, SF, "lineitem")
    sk = {
        r.grp: r.kmv_estimate
        for r in sketch.kmv_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    exact = {
        r.grp: r.n
        for r in li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(sk[g] - n) <= max(0.4 * n, 2), (g, sk[g], n)


def test_kmv_small_group_is_exact(spark):
    df = spark.createDataFrame(
        [("a", i % 7) for i in range(100)], "grp string, v long"
    )
    rows = sketch.kmv_distinct(df, "grp", "v").collect()
    assert len(rows) == 1 and rows[0].n_kept == 7
    assert rows[0].kmv_estimate == 7  # below k -> lossless


def test_kmv_merge_equals_single_pass(spark):
    # union-merging two half-sketches must reproduce the one-shot
    # sketch: the mergeability law that makes KMV a real sketch
    li = load_table(spark, SF, "lineitem").select(
        F.col("l_returnflag").alias("grp"),
        sketch.kmv_hash("l_partkey").alias("h"),
    )
    half1 = li.filter(F.col("h") % 2 == 0)
    half2 = li.filter(F.col("h") % 2 == 1)
    k1 = sketch.kmv_merge(half1)
    k2 = sketch.kmv_merge(half2)
    merged = sketch.kmv_merge(k1.unionAll(k2))
    single = sketch.kmv_merge(li)
    key = lambda r: (r.grp, r.h)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, single.collect())
    )


def test_kmv_plan_window_group_limit(spark):
    # the top-k-per-group filter must push into the sort
    # (WindowGroupLimit): only k rows per group survive at scale,
    # not the full distinct-hash set
    from mrgo_spark import plans

    li = load_table(spark, SF, "lineitem")
    df = sketch.kmv_distinct(li, "l_returnflag", "l_partkey")
    assert "WindowGroupLimit" in plans.explain_str(df)
    # two shuffles total: the (grp,h) distinct and the per-group sort
    assert plans.shuffle_count(df) <= 3


# ------------------------------------------------------- Count-Min


def test_cms_one_sided_error_and_replay(spark):
    # one-sided guarantee: estimate >= exact for EVERY value, and the
    # whole sketch replays in pure Python (hash -> cells -> min)
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        F.explode(
            F.split(F.lower(F.col("text")), "[^a-z]+")
        ).alias("tok")
    ).filter(F.col("tok") != "")
    rows = sketch.cms_heavy_hitters(toks, "tok", k=10).collect()
    assert len(rows) == 10
    for r in rows:
        assert r.overestimate >= 0
        assert r.cms_estimate == r.exact_cnt + r.overestimate
    # python replay over the same token stream
    toklist = [r.tok for r in toks.collect()]
    from collections import Counter

    cells: dict[tuple[int, int], int] = {}
    for t in toklist:
        hx = hashlib.md5(t.encode()).hexdigest()
        for i in range(sketch.CMS_D):
            p = int(hx[4 * i : 4 * i + 4], 16) % sketch.CMS_W
            cells[(i, p)] = cells.get((i, p), 0) + 1
    exact = Counter(toklist)
    for r in rows:
        hx = hashlib.md5(r.value.encode()).hexdigest()
        est = min(
            cells[(i, int(hx[4 * i : 4 * i + 4], 16) % sketch.CMS_W)]
            for i in range(sketch.CMS_D)
        )
        assert (r.exact_cnt, r.cms_estimate) == (exact[r.value], est)


def test_cms_counters_merge_by_sum(spark):
    # per-partition sketches add cell-wise: build on two halves,
    # sum, compare to the one-shot build
    docs = load_table(spark, SF, "documents")
    toks = docs.select(
        F.explode(F.split(F.lower("text"), "[^a-z]+")).alias("tok")
    ).filter(F.col("tok") != "")
    # deterministic multiset-safe split: token-hash parity (each
    # token's occurrences all land on one side)
    par = sketch.cms_lane_pos("tok", 0) % 2
    h1 = toks.filter(par == 0)
    h2 = toks.filter(par == 1)
    c1 = sketch.cms_counters(h1, "tok")
    c2 = sketch.cms_counters(h2, "tok")
    summed = (
        c1.unionAll(c2)
        .groupBy("lane", "pos")
        .agg(F.sum("cnt").cast("long").alias("cnt"))
    )
    single = sketch.cms_counters(toks, "tok")
    key = lambda r: (r.lane, r.pos, r.cnt)  # noqa: E731
    assert sorted(map(key, summed.collect())) == sorted(
        map(key, single.collect())
    )


def _bq(spark, df):
    return sketch.bucket_quantile_sketch(
        df, "grp", "v", width=100, qs=(50, 90)
    )


def test_bucket_quantile_matches_python_model(spark):
    import math

    rows = [("a", i * 7 % 1000) for i in range(500)] + [
        ("b", i * i % 800) for i in range(300)
    ]
    df = spark.createDataFrame(rows, "grp string, v long")
    got = {
        (r.grp, r.q): (r.n, r.rank_target, r.bucket, r.est_lo)
        for r in _bq(spark, df).collect()
    }
    data = {}
    for g, v in rows:
        data.setdefault(g, []).append(v)
    for (g, q), (n, rank, bucket, est_lo) in got.items():
        vs = sorted(data[g])
        assert n == len(vs)
        assert rank == math.ceil(q * n / 100)
        true_q = vs[rank - 1]
        # the chosen bucket CONTAINS the true rank-th value
        assert est_lo <= true_q < est_lo + 100
        assert bucket == true_q // 100


def test_bucket_quantile_merge_law(spark):
    """Sketch cells from two halves, summed, give the same quantiles
    as one pass over the whole — the mergeability that makes this a
    sketch (per-day cells roll up to per-month quantiles with no
    re-scan)."""
    rows = [("a", (i * 13) % 997) for i in range(1000)]
    df = spark.createDataFrame(rows, "grp string, v long")
    half1 = df.where(F.col("v") % 2 == 0)
    half2 = df.where(F.col("v") % 2 == 1)
    cells = lambda d: (
        d.groupBy("grp", F.expr("v div 100").alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    merged = (
        cells(half1)
        .unionByName(cells(half2))
        .groupBy("grp", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cells(df)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bucket_quantile_fixture_vs_exact_percentile(spark):
    orders = load_table(spark, SF, "orders")
    got = sketch.bucket_quantile_sketch(
        orders,
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100),
        width=1_000_000,
        qs=(50,),
    ).collect()
    vals = {}
    for r in orders.select("o_orderpriority", "o_totalprice").collect():
        vals.setdefault(r.o_orderpriority, []).append(
            round(float(r.o_totalprice) * 100)
        )
    for r in got:
        vs = sorted(vals[r.grp])
        true_med = vs[r.rank_target - 1]
        assert r.est_lo <= true_med < r.est_lo + 1_000_000


# ----------------------------------------------------- HyperLogLog


def _py_hll(values):
    """(n_regs_hit, s_sum, estimate) replay of the declared chain."""
    regs: dict[int, int] = {}
    for v in values:
        h = int(hashlib.md5(str(v).encode()).hexdigest()[:12], 16)
        j, w = h % sketch.HLL_M, h // sketch.HLL_M
        rho = (
            sketch.HLL_RHO_MAX
            if w == 0
            else sketch.HLL_RHO_MAX - w.bit_length()
        )
        regs[j] = max(regs.get(j, 0), rho)
    s = sum(1 << (sketch.HLL_RHO_MAX - m) for m in regs.values())
    s += (sketch.HLL_M - len(regs)) * (1 << sketch.HLL_RHO_MAX)
    est0 = (
        sketch.HLL_M * sketch.HLL_M * (1 << sketch.HLL_RHO_MAX)
    ) // s
    return (
        len(regs),
        s,
        (sketch.HLL_ALPHA_NUM * est0) // sketch.HLL_ALPHA_DEN,
    )


def test_hll_matches_python_replay(spark):
    li = load_table(spark, SF, "lineitem")
    got = {
        r.grp: (r.n_regs_hit, r.s_sum, r.hll_estimate)
        for r in sketch.hll_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    rows = li.select("l_returnflag", "l_partkey").collect()
    groups: dict[str, set] = {}
    for r in rows:
        groups.setdefault(r.l_returnflag, set()).add(r.l_partkey)
    want = {g: _py_hll(vs) for g, vs in groups.items()}
    assert got == want


def test_hll_estimate_accuracy(spark):
    # relative error ~ 1.04/sqrt(m) ~ 13% at m=64; pin a generous 0.4
    li = load_table(spark, SF, "lineitem")
    sk = {
        r.grp: r.hll_estimate
        for r in sketch.hll_distinct(li, "l_returnflag", "l_partkey").collect()
    }
    exact = {
        r.grp: r.n
        for r in li.groupBy(F.col("l_returnflag").alias("grp"))
        .agg(F.countDistinct("l_partkey").alias("n"))
        .collect()
    }
    for g, n in exact.items():
        assert abs(sk[g] - n) <= max(0.4 * n, 2), (g, sk[g], n)


def test_hll_registers_merge_by_max(spark):
    li = load_table(spark, SF, "lineitem")
    full = sketch.hll_registers(li, "l_returnflag", "l_partkey")
    h1 = sketch.hll_registers(
        li.filter(F.col("l_orderkey") % 2 == 0), "l_returnflag", "l_partkey"
    )
    h2 = sketch.hll_registers(
        li.filter(F.col("l_orderkey") % 2 == 1), "l_returnflag", "l_partkey"
    )
    merged = sketch.hll_merge(h1.unionAll(h2))
    key = lambda r: (r.grp, r.j, r.m_j)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(
        map(key, full.collect())
    )


def test_hll_duplicates_do_not_move_registers(spark):
    # max is idempotent: feeding each value 5x yields the identical
    # sketch (why HLL needs no pre-DISTINCT, unlike KMV's top-k walk)
    vals = [("a", i) for i in range(200)]
    df1 = spark.createDataFrame(vals, "grp string, v long")
    df5 = spark.createDataFrame(vals * 5, "grp string, v long")
    r1 = sorted(
        (r.grp, r.j, r.m_j)
        for r in sketch.hll_registers(df1, "grp", "v").collect()
    )
    r5 = sorted(
        (r.grp, r.j, r.m_j)
        for r in sketch.hll_registers(df5, "grp", "v").collect()
    )
    assert r1 == r5


def test_kmv_jaccard_planted_overlap(spark):
    """Estimator sanity on PLANTED set overlaps: identical sets →
    exactly 1000; disjoint sets → exactly 0; a 50%-overlap pair's
    estimate lands near 1/3 (Jaccard of half-shared sets) within
    sketch error; small groups (< k kept) are EXACT."""
    from fractions import Fraction

    # three groups over integer-string values: a = 0..599,
    # b = 300..899 (|a∩b|=300, |a∪b|=900 → J = 1/3), c = a verbatim,
    # d disjoint
    rows = (
        [("a", str(v)) for v in range(600)]
        + [("b", str(v)) for v in range(300, 900)]
        + [("c", str(v)) for v in range(600)]
        + [("d", str(v)) for v in range(5000, 5600)]
    )
    df = spark.createDataFrame(rows, "grp string, v string")
    out = {
        (r.lang_a, r.lang_b): r
        for r in sketch.kmv_jaccard_pairs(df, "grp", "v").collect()
    }
    assert out[("a", "c")].jaccard_milli == 1000
    assert out[("a", "d")].jaccard_milli == 0
    assert out[("b", "d")].jaccard_milli == 0
    ab = out[("a", "b")].jaccard_milli
    assert 150 <= ab <= 520, ab  # true 333, k=64 sketch error band
    # small groups: sketches are the full sets → exact Jaccard
    small = spark.createDataFrame(
        [("x", str(v)) for v in range(20)]
        + [("y", str(v)) for v in range(10, 30)],
        "grp string, v string",
    )
    r = sketch.kmv_jaccard_pairs(small, "grp", "v").collect()[0]
    want = Fraction(10, 30)
    assert r.jaccard_milli == (1000 * want.numerator) // want.denominator
    assert r.k_used == 30 and r.n_common == 10
