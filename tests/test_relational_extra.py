"""Approximate-aggregate error bounds (rows-only declared surface)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from mrgo_spark.operators.queries_relational import q_approx, q_sessionize
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_sessionize_subsecond_boundary(spark, tmp_path):
    """Gaps within 1 s of the 30-min boundary, with sub-second
    timestamp components, classify at MICROsecond precision.

    Whole-second gap math (``ts.cast('long')``) would call the
    1800.5 s gap 1800 s (same session) and the 1799.5 s gap 1799 s —
    indistinguishable from the true boundary; these rows pin the
    microsecond semantics to the oracle's ``> INTERVAL 30 MINUTE``.
    """
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0, 250_000)

    def at(seconds):
        return t0 + datetime.timedelta(seconds=seconds)

    rows = [
        # u1: gap 1800.5 s  -> strictly over 30 min -> 2 sessions
        ("u1", at(0), 1),
        ("u1", at(1800.5), 2),
        # u2: gap 1799.5 s  -> under 30 min -> 1 session
        ("u2", at(0), 3),
        ("u2", at(1799.5), 4),
        # u3: gap exactly 1800 s -> NOT strictly greater -> 1 session
        ("u3", at(0), 5),
        ("u3", at(1800), 6),
    ]
    df = spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    got = {r.user_id: r.n_sessions for r in q_sessionize(spark, sf_dir).collect()}
    assert got == {"u1": 2, "u2": 1, "u3": 1}


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
