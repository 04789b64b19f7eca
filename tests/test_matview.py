"""Incremental view maintenance (r13): merge semantics + the
maintained == recomputed equivalence on the fixture."""

from pyspark.sql import functions as F

from mrgo_spark.operators import matview
from mrgo_spark.operators.queries_relational import (
    q_matview_maintenance_orders,
)
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_maintained_equals_recompute_fixture(spark):
    """The Spark-side equivalence twin of the oracle: maintaining the
    base rollup under the CDC batch equals recomputing over the
    effective corpus."""
    got = sorted(
        map(tuple, q_matview_maintenance_orders(spark, SF).collect())
    )
    orders = load_table(spark, SF, "orders")
    pricec = F.expr("cast(round(o_totalprice * 100) as bigint)")
    ym = (F.year("o_orderdate") * 100 + F.month("o_orderdate")).cast(
        "long"
    )
    eff = orders.filter(
        (
            (F.col("o_orderkey") % 7 != 0)
            & (F.col("o_orderkey") % 5 != 0)
        )
        | (F.col("o_orderkey") % 7 == 0)
    )
    want = sorted(
        map(
            tuple,
            eff.groupBy("o_orderpriority", ym.alias("ym"))
            .agg(
                F.count("*").cast("long").alias("n_orders"),
                F.sum(pricec).cast("long").alias("sum_price_cents"),
            )
            .collect(),
        )
    )
    assert got == want and len(got) > 50


def test_merge_hand_cases(spark):
    """Zero-count groups drop; insert-only groups appear; the
    untouched group passes through unchanged."""
    base = spark.createDataFrame(
        [("a", 2, 100), ("b", 1, 50), ("c", 3, 300)],
        "k string, n long, s long",
    )
    delta = spark.createDataFrame(
        # delete both 'a' rows; insert a brand-new 'd'. Deltas carry
        # RAW measure values — sign applies to count AND measures.
        [("a", -1, 60), ("a", -1, 40), ("d", 1, 7)],
        "k string, sign int, s long",
    )
    got = {
        r.k: (r.n, r.s)
        for r in matview.maintain_groupby(
            base, delta, ["k"], "n", ["s"]
        ).collect()
    }
    assert got == {"b": (1, 50), "c": (3, 300), "d": (1, 7)}


def test_maintenance_plan_is_base_free(spark):
    """The maintained view's plan replays the stored base aggregate
    from its checkpoint (ExistingRDD) — the base table is scanned by
    the DELTA branches only, each with the CDC predicate pushed."""
    df = q_matview_maintenance_orders(spark, SF)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ExistingRDD" in plan
    assert plan.count("orders.parquet") == 2  # insert + delete branch


def test_merge_is_null_safe_on_keys(spark):
    """r13 review fix: a NULL group key merges its base and delta
    rows exactly like the recompute's GROUP BY — one row, not a
    base/delta split."""
    base = spark.createDataFrame(
        [("a", 1, 10), (None, 2, 20)], "k string, n long, s long"
    )
    delta = spark.createDataFrame(
        [(None, 1, 5), ("b", 1, 7)], "k string, sign int, s long"
    )
    got = {
        r.k: (r.n, r.s)
        for r in matview.maintain_groupby(
            base, delta, ["k"], "n", ["s"]
        ).collect()
    }
    assert got == {"a": (1, 10), None: (3, 25), "b": (1, 7)}


def test_merge_surfaces_overdeletion(spark):
    """An over-deleted group stays VISIBLE with a negative count
    (the != 0 filter keeps it) — callers assert n >= 0 downstream."""
    base = spark.createDataFrame([("a", 1, 10)], "k string, n long, s long")
    delta = spark.createDataFrame(
        [("a", -1, 10), ("a", -1, 3)], "k string, sign int, s long"
    )
    rows = matview.maintain_groupby(
        base, delta, ["k"], "n", ["s"]
    ).collect()
    assert len(rows) == 1 and rows[0].n == -1
