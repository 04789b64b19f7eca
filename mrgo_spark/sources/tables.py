"""Fixture table loaders.

The driver's synthetic fixtures (TESTDATA.md) are one parquet file per
table under ``/root/testdata/sf*/``. Parquet scans get predicate
pushdown + column pruning from Catalyst for free; loaders stay thin.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one fixture table.

    ``events.ts`` is stored as parquet TIMESTAMP(NANOS), which Spark's
    reader rejects by default; read it as long (runtime-settable
    legacy conf) and floor to microsecond timestamps. The fixture has
    no sub-microsecond components, so this is lossless, and the DuckDB
    oracle's ns→µs cast truncates identically.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: load_table(spark, sf_dir, t) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for spark.sql)."""
    for t in TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
