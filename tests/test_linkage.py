"""Record linkage (r13): sorted-neighborhood blocking + Fellegi-
Sunter weights — Python differential, pair-count law, planted dup."""

from pyspark.sql import functions as F

from mrgo_spark.operators import linkage
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _python_replay(rows, window):
    """Pure-Python SNM + FS over (ck, nk, seg, nm1, bal_cents)."""
    wts = linkage.fs_weights()
    by_block = {}
    for r in rows:
        by_block.setdefault(r[1], []).append(r)
    out = {}
    for nk, rs in by_block.items():
        rs.sort(key=lambda r: (r[4], r[0]))
        for i, a in enumerate(rs):
            for j in range(i + 1, min(i + 1 + window, len(rs))):
                b = rs[j]
                ag = {
                    "seg": a[2] == b[2],
                    "nm1": a[3] == b[3],
                    "bal": abs(a[4] - b[4]) <= 10000,
                    "sgn": (a[4] >= 0) == (b[4] >= 0),
                }
                wt = sum(
                    wts[f][0] if ag[f] else wts[f][1] for f in ag
                )
                verdict = (
                    "match"
                    if wt >= linkage.FS_MATCH_MILLI
                    else "possible"
                    if wt >= linkage.FS_POSSIBLE_MILLI
                    else "non_match"
                )
                out[(a[0], b[0])] = (
                    nk,
                    *(int(ag[f]) for f in ("seg", "nm1", "bal", "sgn")),
                    wt,
                    verdict,
                )
    return out


def test_fs_linkage_matches_python_replay(spark):
    cust = load_table(spark, SF, "customer")
    got = {
        (r.custkey_a, r.custkey_b): (
            r.c_nationkey,
            r.agree_seg,
            r.agree_nm1,
            r.agree_bal,
            r.agree_sgn,
            r.weight_milli,
            r.verdict,
        )
        for r in linkage.fs_link_customers(cust).collect()
    }
    rows = [
        (
            r.c_custkey,
            r.c_nationkey,
            r.c_mktsegment,
            r.c_name[-1],
            round(r.c_acctbal * 100),
        )
        for r in cust.collect()
    ]
    want = _python_replay(rows, linkage.SNM_WINDOW)
    assert got == want
    assert len(got) > 100  # the declared surface is non-trivial


def test_snm_pair_count_law(spark):
    """|pairs| == Σ_block Σ_{off=1..w} max(n_block − off, 0) — the
    linear-volume contract of sorted-neighborhood blocking."""
    cust = load_table(spark, SF, "customer")
    w = linkage.SNM_WINDOW
    sizes = [
        r.n
        for r in cust.groupBy("c_nationkey")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    want = sum(max(n - off, 0) for n in sizes for off in range(1, w + 1))
    assert linkage.fs_link_customers(cust).count() == want


def test_fs_weights_pinned():
    """The milli-log2 constants are part of the declared contract —
    a silent parameter change must fail loudly."""
    assert linkage.fs_weights() == {
        "seg": (2169, -3000),
        "nm1": (3087, -2585),
        "bal": (4247, -4248),
        "sgn": (169, -1000),
    }


def test_planted_duplicate_scores_match(spark):
    """A planted near-duplicate (same segment, same name suffix,
    balance within $100) lands in the match band; an all-disagree
    neighbor lands in non_match."""
    rows = [
        (1, "Customer#000000001", 7, 100.00, "BUILDING"),
        (2, "Customer#000000011", 7, 150.00, "BUILDING"),  # dup of 1
        (3, "Customer#000000004", 7, -9000.00, "MACHINERY"),
    ]
    df = spark.createDataFrame(
        rows,
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )
    got = {
        (r.custkey_a, r.custkey_b): r.verdict
        for r in linkage.fs_link_customers(df).collect()
    }
    assert got[(1, 2)] == "match"
    assert got[(3, 1)] == "non_match"


def test_snm_plan_no_cartesian(spark):
    """The offset-explode equi-join never degrades to a range join:
    no CartesianProduct / BroadcastNestedLoopJoin in the plan."""
    cust = load_table(spark, SF, "customer")
    plan = (
        linkage.fs_link_customers(cust)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_snm_single_source_pass(spark):
    """The ranked frame is checkpointed once — both join sides replay
    from ExistingRDD; the source is scanned exactly once (for the
    checkpoint), not once per side."""
    cust = load_table(spark, SF, "customer")
    plan = (
        linkage.fs_link_customers(cust)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in plan
    assert "customer.parquet" not in plan
