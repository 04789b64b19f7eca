"""Approximate-aggregate error bounds (rows-only declared surface)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrgo_spark.operators.queries_relational import q_approx
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_approx_within_bounds(spark):
    got = {r.l_returnflag: r for r in q_approx(spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    exact = {
        r.l_returnflag: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_partkey").alias("parts"),
            F.median("l_extendedprice").alias("med"),
        )
        .collect()
    }
    for flag, g in got.items():
        e = exact[flag]
        assert abs(g.approx_parts - e.parts) / e.parts < 0.1  # HLL ~2% typical
        assert abs(g.approx_median_price - e.med) / e.med < 0.2
