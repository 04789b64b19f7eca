"""Z-order layout key: model differential + the locality property
that justifies the layout (bounded per-bucket extents in BOTH
dimensions)."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from mrgo_spark.operators import layout
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_z(a: int, b: int, bits: int = layout.Z_BITS) -> int:
    z = 0
    for i in range(bits):
        z |= ((a >> i) & 1) << (2 * i)
        z |= ((b >> i) & 1) << (2 * i + 1)
    return z


def test_zorder_known_values(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (0b101, 0b011), (2**20 - 1, 2**20 - 1)],
        "a long, b long",
    )
    got = [r.z for r in df.select(layout.zorder_key("a", "b").alias("z")).collect()]
    assert got == [0, 1, 2, 3, _py_z(0b101, 0b011), 4**20 - 1]
    # 0b101 ⨯ 0b011: a bits at even positions, b bits at odd
    assert _py_z(0b101, 0b011) == 0b011011


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=2**20 - 1),
            st.integers(min_value=0, max_value=2**20 - 1),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_zorder_matches_python_model(spark, pairs):
    df = spark.createDataFrame(pairs, "a long, b long")
    got = sorted(
        (r.a, r.b, r.z)
        for r in df.select(
            "a", "b", layout.zorder_key("a", "b").alias("z")
        ).collect()
    )
    want = sorted((a, b, _py_z(a, b)) for a, b in pairs)
    assert got == want


def test_zorder_audit_locality_bound(spark):
    # a z-bucket of width 2^16 spans at most 2^8 values per dimension
    # — the pruning property that makes the layout useful
    li = load_table(spark, SF, "lineitem")
    rows = layout.zorder_audit(li, "l_partkey", "l_suppkey").collect()
    assert rows and sum(r.n_rows for r in rows) == li.count()
    for r in rows:
        assert r.c1_max - r.c1_min < 256
        assert r.c2_max - r.c2_min < 256


def test_zorder_plan_is_map_side(spark):
    # bit arithmetic must stay codegen'd: a single aggregate over the
    # scan, no window, no join
    li = load_table(spark, SF, "lineitem")
    plan = (
        layout.zorder_audit(li, "l_partkey", "l_suppkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Window" not in plan and "Join" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final


def test_zorder_negative_key_raises(spark):
    # shiftright sign-extends; a negative key must fail loudly, not
    # silently alias every interleave bit (ADVICE r4)
    import pytest
    from pyspark.sql import functions as F

    df = spark.range(1).select(
        F.lit(-1).cast("long").alias("a"), F.lit(3).cast("long").alias("b")
    )
    with pytest.raises(Exception, match="negative input key"):
        df.select(layout.zorder_key("a", "b", 8).alias("z")).collect()
