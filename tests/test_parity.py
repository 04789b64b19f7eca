"""Differential test of every declared query vs the DuckDB oracle.

Mirrors the driver's t2 gate (BASELINE.json) at sf0.001 for speed;
the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest

from mrgo_spark.registry import load

from .parity import compare

QUERIES, ORACLES = load()
DECLARED = sorted(ORACLES.keys())


@pytest.mark.parametrize("name", DECLARED)
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
