"""Differential test of every declared query vs the DuckDB oracle.

Mirrors the driver's t2 gate (BASELINE.json) at sf0.001 for speed;
the driver runs the same comparison at sf0.01.
"""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from mrgo_spark.registry import DRIVER_WINDOW, load

from .parity import compare

QUERIES, ORACLES = load()
DECLARED = sorted(ORACLES.keys())

# The driver's comparator canonicalizes results with pandas
# sort_values, which throws on array/map/struct cells — r3 shipped 3
# red rows (embedding_normalize/centroids/quantize) exactly this way.
# Every entry inside the gate window must emit scalar columns only.
GATE_WINDOW = set(list(QUERIES)[:DRIVER_WINDOW])
_COMPLEX = (T.ArrayType, T.MapType, T.StructType)


@pytest.mark.parametrize("name", DECLARED)
def test_oracle_parity(spark, sf_dir, name):
    ok, msg = compare(spark, sf_dir, QUERIES[name], ORACLES[name])
    assert ok, f"{name}: {msg}"


@pytest.mark.parametrize("name", sorted(QUERIES.keys()))
def test_query_runs(spark, sf_dir, name):
    df = QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
    assert len(df.columns) > 0
    if name in GATE_WINDOW:
        bad = [f.name for f in df.schema.fields if isinstance(f.dataType, _COMPLEX)]
        assert not bad, (
            f"{name} is inside the driver's {DRIVER_WINDOW}-slot gate window "
            f"but emits non-scalar columns {bad}; the driver's pandas "
            f"canonicalizer cannot sort these (r3 red-row class)"
        )
