"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over ``mrgo_spark.registry`` — every implemented operator
from SURVEY.md §2 registers its Spark query and DuckDB-oracle SQL
there; this module re-exports them in the driver's shape.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from pyspark.sql import DataFrame, SparkSession

from mrgo_spark.registry import load as _load_registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: word count over documents at sf0.001.

    Exercises the reference's only real end-to-end pipeline
    (scan → tokenize/flatMap → shuffle → aggregate; SURVEY §3.1).
    """
    queries, _ = _load_registry()
    return queries["wordcount"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    q, _ = _load_registry()
    return dict(q)


def oracle_sql() -> dict[str, str]:
    _, o = _load_registry()
    return dict(o)
