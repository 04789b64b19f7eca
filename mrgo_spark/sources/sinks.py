"""Sinks: the reference's golden-output format + engine-native writers.

The reference's only sink is space-separated text lines
``"%v %v\n"`` to ``mr-out-N`` (reference mr/worker.go:163-179), with
correctness checked after a global sort (test-mr.sh:56). ``write_mr_text``
reproduces that contract; the parquet/csv/json writers are the
engine-native additions (SURVEY §2.5 scans/sinks row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_mr_text(kv: DataFrame, path: str, n_out: int | None = 10) -> None:
    """Write (key, value) rows as "key value" text lines.

    ``n_out`` mirrors nReduce=10 output partitioning
    (mr/master.go; one mr-out-N per reducer). Pass None to keep the
    upstream partitioning. Output order within files is partition
    order; the golden comparison sorts globally, as the reference's
    harness does.

    Contract (same as the reference format): keys must not contain
    the space separator — values may. ``read_mr_text`` splits at the
    FIRST space, which is unambiguous exactly under that contract
    (e.g. the indexer's "2 a,b" value round-trips).
    """
    cols = kv.columns
    lines = kv.select(
        F.concat_ws(" ", F.col(cols[0]).cast("string"), F.col(cols[1]).cast("string")).alias(
            "value"
        )
    )
    if n_out is not None:
        lines = lines.repartition(n_out, F.spark_partition_id() + F.crc32(F.col("value")))
    lines.write.mode("overwrite").text(path)


def read_mr_text(spark, path: str) -> DataFrame:
    """Read "key value" lines back as (key, value) — inverse of
    write_mr_text for round-trip checks."""
    lines = spark.read.text(path)
    sep = F.instr("value", " ")
    return lines.select(
        F.expr("substring(value, 1, instr(value, ' ') - 1)").alias("key"),
        F.expr("substring(value, instr(value, ' ') + 1)").alias("value"),
    )


def write_parquet(df: DataFrame, path: str, partition_by: list[str] | None = None) -> None:
    w = df.write.mode("overwrite")
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(df: DataFrame, path: str) -> None:
    df.write.mode("overwrite").option("header", True).csv(path)


def write_jsonl(df: DataFrame, path: str) -> None:
    """JSON-lines — the reference's intermediate codec (O4,
    mr/worker.go:117-118) as an engine-native sink."""
    df.write.mode("overwrite").json(path)
