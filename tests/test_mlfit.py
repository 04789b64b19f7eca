"""Exact-OLS fit: fraction math vs pure-Python integers, float value
vs numpy lstsq, and the degenerate constant-x group.

Reference parity note: no reference analog (pure extension — the
closed-form member of the distributed-ML set next to kmeans/pagerank).
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import functions as F

from mrgo_spark.operators import mlfit
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_fit(pts):
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxy = sum(x * y for x, y in pts)
    sxx = sum(x * x for x, _ in pts)
    return (
        n,
        n * sxy - sx * sy,
        n * sxx - sx * sx,
        sy * sxx - sx * sxy,
    )


def test_linreg_matches_python_integers(spark):
    li = load_table(spark, SF, "lineitem")
    got = {
        r.grp: (r.n, r.slope_num, r.slope_den, r.intercept_num)
        for r in mlfit.linreg_fit_exact(
            li, "l_returnflag", F.col("l_quantity"),
            F.round(F.col("l_discount") * 100),
        ).collect()
    }
    pts: dict[str, list] = {}
    for r in li.select("l_returnflag", "l_quantity", "l_discount").collect():
        pts.setdefault(r.l_returnflag, []).append(
            (int(r.l_quantity), round(float(r.l_discount) * 100))
        )
    want = {g: _py_fit(p) for g, p in pts.items()}
    assert got == want


def test_linreg_matches_numpy_lstsq(spark):
    import numpy as np

    li = load_table(spark, SF, "lineitem")
    rows = mlfit.linreg_fit_exact(
        li, "l_returnflag", F.col("l_quantity"),
        F.round(F.col("l_discount") * 100),
    ).collect()
    data = li.select("l_returnflag", "l_quantity", "l_discount").collect()
    for r in rows:
        xs = np.array([float(d.l_quantity) for d in data if d.l_returnflag == r.grp])
        ys = np.array([round(float(d.l_discount) * 100) for d in data if d.l_returnflag == r.grp])
        A = np.vstack([xs, np.ones(len(xs))]).T
        slope, icept = np.linalg.lstsq(A, ys, rcond=None)[0]
        assert abs(Fraction(r.slope_num, r.slope_den) - slope) < 1e-8
        assert abs(Fraction(r.intercept_num, r.intercept_den) - icept) < 1e-8
        # slope_micro truncates toward zero (Spark div == DuckDB //;
        # int(Fraction) truncates the same way — NOT Python's //)
        assert r.slope_micro == int(
            Fraction(1_000_000 * r.slope_num, r.slope_den)
        )


def test_linreg_constant_x_degenerate(spark):
    df = spark.createDataFrame(
        [("a", 5, i) for i in range(10)], "grp string, x long, y long"
    )
    row = mlfit.linreg_fit_exact(df, "grp", "x", "y").collect()[0]
    assert row.slope_den == 0 and row.slope_micro is None


def test_corr_pairs_matches_numpy(spark):
    import numpy as np

    li = load_table(spark, SF, "lineitem")
    rows = mlfit.corr_pairs_exact(
        li,
        "l_returnflag",
        {
            "qty": F.col("l_quantity"),
            "disc": F.round(F.col("l_discount") * 100),
            "tax": F.round(F.col("l_tax") * 100),
        },
    ).collect()
    assert {(r.x_col, r.y_col) for r in rows} == {
        ("qty", "disc"), ("qty", "tax"), ("disc", "tax")
    } and len(rows) == 3 * len({r.grp for r in rows})
    data: dict[str, list] = {}
    for d in li.select(
        "l_returnflag", "l_quantity", "l_discount", "l_tax"
    ).collect():
        data.setdefault(d.l_returnflag, []).append(
            (
                int(d.l_quantity),
                round(float(d.l_discount) * 100),
                round(float(d.l_tax) * 100),
            )
        )
    idx = {"qty": 0, "disc": 1, "tax": 2}
    for r in rows:
        m = np.array(data[r.grp], dtype=float)
        x, y = m[:, idx[r.x_col]], m[:, idx[r.y_col]]
        want = np.corrcoef(x, y)[0, 1]
        got = r.corr_num / (r.varx_num * r.vary_num) ** 0.5
        assert abs(got - want) < 1e-9
        # exact integer legs replay in pure Python
        n = len(x)
        assert r.corr_num == n * int((x * y).sum()) - int(x.sum()) * int(y.sum())


def _py_auc(pairs):
    """Tie-aware AUC: P(score_pos > score_neg) + 0.5*P(equal)."""
    pos = sorted(s for s, p in pairs if p)
    neg = sorted(s for s, p in pairs if not p)
    if not pos or not neg:
        return None
    import bisect

    wins = sum(bisect.bisect_left(neg, s) for s in pos)
    ties = sum(
        bisect.bisect_right(neg, s) - bisect.bisect_left(neg, s)
        for s in pos
    )
    return Fraction(2 * wins + ties, 2 * len(pos) * len(neg))


def test_auc_matches_python_model(spark):
    li = load_table(spark, SF, "lineitem")
    rows = mlfit.auc_exact(
        li,
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100),
        (F.col("l_returnflag") == "R").cast("int"),
    ).collect()
    data: dict[str, list] = {}
    for d in li.select(
        "l_linestatus", "l_extendedprice", "l_returnflag"
    ).collect():
        data.setdefault(d.l_linestatus, []).append(
            (round(float(d.l_extendedprice) * 100), d.l_returnflag == "R")
        )
    for r in rows:
        want = _py_auc(data[r.grp])
        assert Fraction(r.auc_num, r.auc_den) == want
        assert r.auc_micro == int(
            Fraction(1_000_000 * r.auc_num, r.auc_den)
        )


def test_auc_known_tiny_and_degenerate(spark):
    # scores 1..4, positives at 3,4 and a tie at 2 → AUC by hand:
    # pairs (pos,neg): (3>1),(3>2),(3=2 tie? no: scores pos {3,4,2},
    # neg {1,2}) — wins: 3>1,3>2,4>1,4>2,2>1 =5, ties: 2=2 → 1
    # AUC = (5 + 0.5) / (3*2) = 11/12
    df = spark.createDataFrame(
        [("g", 1, 0), ("g", 2, 0), ("g", 2, 1), ("g", 3, 1),
         ("g", 4, 1), ("h", 7, 1), ("h", 9, 1)],
        "grp string, score long, pos long",
    )
    rows = {r.grp: r for r in mlfit.auc_exact(df, "grp", "score", "pos").collect()}
    g = rows["g"]
    assert Fraction(g.auc_num, g.auc_den) == Fraction(11, 12)
    h = rows["h"]  # no negatives → degenerate
    assert h.auc_den == 0 and h.auc_micro is None


def test_corr_single_scan_no_union(spark):
    li = load_table(spark, SF, "lineitem")
    plan = (
        mlfit.corr_pairs_exact(
            li, "l_returnflag", {"qty": "l_quantity", "tax": "l_tax"}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # pair rows unpivot via ONE Generate over the aggregate row —
    # no Union re-running the scan per pair
    assert "Union" not in plan and plan.count("Scan parquet") == 1


def test_pr_at_thresholds_matches_python(spark):
    li = load_table(spark, SF, "lineitem")
    ths = [k * 1_000_000 for k in range(1, 11)]
    rows = mlfit.pr_at_thresholds(
        li,
        "l_linestatus",
        F.round(F.col("l_extendedprice") * 100),
        (F.col("l_returnflag") == "R").cast("int"),
        thresholds=ths,
    ).collect()
    data = {}
    for d in li.select(
        "l_linestatus", "l_extendedprice", "l_returnflag"
    ).collect():
        data.setdefault(d.l_linestatus, []).append(
            (round(float(d.l_extendedprice) * 100), d.l_returnflag == "R")
        )
    assert len(rows) == len(data) * len(ths)
    for r in rows:
        pts = data[r.grp]
        tp = sum(1 for s, p in pts if s >= r.t and p)
        fp = sum(1 for s, p in pts if s >= r.t and not p)
        np_ = sum(1 for _, p in pts if p)
        assert (r.tp, r.fp, r.n_pos) == (tp, fp, np_)
        if tp + fp:
            assert r.precision_micro == 1_000_000 * tp // (tp + fp)
        else:
            assert r.precision_micro is None
        assert r.recall_micro == (1_000_000 * tp // np_ if np_ else None)
    # recall is monotonically non-increasing in t within a group
    for g in data:
        recs = [r.recall_micro for r in sorted(
            (x for x in rows if x.grp == g), key=lambda x: x.t)]
        assert all(a >= b for a, b in zip(recs, recs[1:]))


def test_class_balance_matches_python(spark):
    from collections import Counter

    docs = load_table(spark, SF, "documents")
    rows = {
        r.grp: r
        for r in mlfit.class_balance_exact(docs, "source", "lang").collect()
    }
    data: dict[str, Counter] = {}
    for d in docs.select("source", "lang").collect():
        data.setdefault(d.source, Counter())[d.lang] += 1
    assert set(rows) == set(data)
    for g, ctr in data.items():
        r = rows[g]
        n = sum(ctr.values())
        ss = sum(c * c for c in ctr.values())
        assert (r.n, r.n_classes, r.majority_cnt) == (
            n, len(ctr), max(ctr.values())
        )
        assert (r.gini_num, r.gini_den) == (n * n - ss, n * n)
        assert r.gini_micro == 1_000_000 * (n * n - ss) // (n * n)


def test_class_balance_single_class_gini_zero(spark):
    df = spark.createDataFrame(
        [("g", "only")] * 5, "grp string, cls string"
    )
    r = mlfit.class_balance_exact(df, "grp", "cls").collect()[0]
    assert r.gini_num == 0 and r.gini_micro == 0 and r.n_classes == 1


def test_zipf_fit_slope_negative_and_replays(spark):
    """The declared Zipf audit: slope must be negative on natural-ish
    text, and the integer bit-length points must replay in Python."""
    from collections import Counter

    from mrgo_spark.registry import load as load_registry

    Q, _ = load_registry()
    rows = {r.grp: r for r in Q["zipf_fit_tokens"](spark, SF).collect()}
    import re

    docs = load_table(spark, SF, "documents").select("lang", "text").collect()
    freqs: dict[str, Counter] = {}
    for d in docs:
        for w in re.split(r"[^A-Za-z]+", d.text):
            if w:
                freqs.setdefault(d.lang, Counter())[w] += 1
    for lang, ctr in freqs.items():
        ranked = sorted(ctr.items(), key=lambda kv: (-kv[1], kv[0]))
        pts = [
            ((i + 1).bit_length(), c.bit_length())
            for i, (_, c) in enumerate(ranked)
        ]
        n, sx, sy = len(pts), sum(x for x, _ in pts), sum(y for _, y in pts)
        sxy = sum(x * y for x, y in pts)
        sxx = sum(x * x for x, _ in pts)
        r = rows[lang]
        assert (r.n, r.slope_num, r.slope_den) == (
            n, n * sxy - sx * sy, n * sxx - sx * sx
        )
        assert r.slope_micro < 0  # frequencies fall with rank


def test_corr_cramer_terms_survive_int64_intermediate_overflow(spark):
    """r6 regression (caught by the 10x scale probe on degree
    assortativity): n*Σx² alone may exceed 2^63 while the subtracted
    Cramer value fits — the decimal(38,0) intermediates must return
    the exact value instead of raising ARITHMETIC_OVERFLOW."""
    from mrgo_spark.operators import mlfit

    # x in {3_000_000 ± 50} over 1_000_000 rows: the intermediate
    # n·Σx² ≈ 9e24 >> 2^63, while the true varx = n²·var(x) =
    # 1e12 · 2500 = 2.5e15 fits comfortably.
    df = spark.range(1_000_000).selectExpr(
        "'g' as grp",
        "cast(3000000 + (case when id % 2 = 0 then 50 else -50 end) as long) as x",
        "cast(id % 100 as long) as y",
    )
    rows = mlfit.corr_pairs_exact(df, "grp", {"x": "x", "y": "y"}).collect()
    assert len(rows) == 1
    r = rows[0]
    n = 1_000_000
    xs_even = n // 2  # x = 3000050
    # python bigint replay
    sx = (3000050 * xs_even) + (2999950 * (n - xs_even))
    sxx = (3000050**2 * xs_even) + (2999950**2 * (n - xs_even))
    assert n * sxx > 2**63  # the intermediate really is overflow territory
    want_varx = n * sxx - sx * sx
    assert want_varx < 2**63  # ... while the true value fits
    assert r.varx_num == want_varx


def test_fleiss_kappa_matches_fraction_model(spark):
    """Fleiss' kappa vs a Fraction replay (trunc division — engine
    div truncates toward zero, matched explicitly for negative
    kappas); unanimous-everywhere group → NULL; a perfectly
    disagreeing panel goes negative."""
    from fractions import Fraction

    from pyspark.sql import functions as F

    from mrgo_spark.operators import mlfit

    rows = []
    # grp 0: mixed agreement
    votes0 = [(1, 1, 1), (0, 0, 0), (1, 0, 1), (1, 1, 0), (0, 1, 0)]
    rows += [("g0", a, b, c) for a, b, c in votes0]
    # grp 1: unanimous keep on every item → pe = 1 → NULL
    rows += [("g1", 1, 1, 1)] * 4
    # grp 2: maximal disagreement (every item 2-1 splits, balanced)
    rows += [("g2", 1, 1, 0), ("g2", 0, 0, 1)] * 3
    df = spark.createDataFrame(rows, "grp string, a int, b int, c int")
    out = {
        r.grp: r
        for r in mlfit.fleiss_kappa_agreement(
            df,
            "grp",
            [F.col("a") == 1, F.col("b") == 1, F.col("c") == 1],
        ).collect()
    }

    def model(votes):
        m = 3
        n = len(votes)
        k1s = [sum(v) for v in votes]
        S = sum(k * (k - 1) + (m - k) * (m - k - 1) for k in k1s)
        t1 = sum(k1s)
        t0 = m * n - t1
        po = Fraction(S, n * m * (m - 1))
        pe = Fraction(t1 * t1 + t0 * t0, m * m * n * n)
        if pe == 1:
            return n, S, t1, None
        kap = (po - pe) / (1 - pe)
        num, den = (1000 * kap).numerator, (1000 * kap).denominator
        trunc = (abs(num) // den) * (1 if num >= 0 else -1)
        return n, S, t1, trunc

    v = {"g0": votes0, "g1": [(1, 1, 1)] * 4,
         "g2": [(1, 1, 0), (0, 0, 1)] * 3}
    for g, votes in v.items():
        n, S, t1, kap = model(votes)
        r = out[g]
        assert (r.n, r.s_sum, r.t_keep) == (n, S, t1), g
        assert r.kappa_milli == kap, (g, r.kappa_milli, kap)
    assert out["g1"].kappa_milli is None
    assert out["g2"].kappa_milli is not None and out["g2"].kappa_milli < 0
