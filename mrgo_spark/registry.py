"""Declared-query registry: the t2 correctness surface.

Each entry pairs a Spark query (callable ``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL string the DuckDB oracle runs
on the same parquet fixtures (views: region nation customer supplier
part orders lineitem events documents embeddings). Column names and
types are aligned on both sides because the driver's compare hashes
values after sorting columns by name.

Entries without oracle SQL (seed-dependent or non-SQL-expressible
operators) get a rows-only check from the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def declare(name: str, oracle: str | None = None):
    """Register a query; decorator form keeps query + oracle adjacent."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def _load_all() -> None:
    # Import for side effects: each module declares its queries.
    from .operators import queries_mrapps  # noqa: F401
    from .operators import queries_relational  # noqa: F401
    from .operators import queries_kv  # noqa: F401
    from .operators import queries_llm  # noqa: F401
    from .operators import queries_scalar  # noqa: F401
    from .operators import queries_timeseries  # noqa: F401


_LOADED = False


def load() -> tuple[dict, dict]:
    global _LOADED
    if not _LOADED:
        _load_all()
        _LOADED = True
    return QUERIES, ORACLES
