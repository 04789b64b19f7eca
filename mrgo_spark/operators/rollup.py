"""Hypertable-style continuous rollup: multi-grain time aggregates.

The continuous-aggregate pattern: aggregate the raw stream ONCE at the
finest grain (map-side partial agg + one shuffle), then compute every
coarser grain FROM the finer aggregate — a re-aggregation of rows
already reduced by orders of magnitude, never a second scan of raw
data. At 100 TB the minute grain is a materialized table partitioned
by bucket date (each refresh touches only new partitions); hour/day
refreshes read the minute table. The reference has no time-series
surface at all (SURVEY §2.5 ABSENT rows) — engine-native addition.

Counts and fixed-point cent sums re-aggregate losslessly (sums of
sums); the final division to doubles happens once per emitted row, so
every grain is bit-identical to aggregating raw data directly — which
is exactly what the DuckDB oracle for ``hypertable_rollup`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GRAINS = ["minute", "hour", "day"]


def continuous_rollup(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> dict[str, DataFrame]:
    """Per-grain aggregates (n, cents) keyed by (bucket, key).

    Returns {grain: DataFrame(bucket, key, n, cents)}; each coarser
    grain is built from the previous grain's DataFrame. Callers
    materialize each grain in production (write → read the finer
    table) so nothing is recomputed across refreshes.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    out: dict[str, DataFrame] = {}
    fine = (
        events.groupBy(
            F.date_trunc("minute", F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("key"),
        )
        .agg(F.count("*").alias("n"), F.sum(cents).alias("cents"))
    )
    out["minute"] = fine
    for grain in GRAINS[1:]:
        fine = (
            fine.groupBy(
                F.date_trunc(grain, F.col("bucket")).alias("bucket"), "key"
            )
            .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        )
        out[grain] = fine
    return out


def rollup_union(events: DataFrame) -> DataFrame:
    """Declared form: all grains in one frame.
    Columns: (grain, bucket, event_type, n, total_value).

    Single-pass shape: a UNION of per-grain aggregates would rescan
    raw events once per grain (Catalyst does not reliably reuse the
    minute-agg exchange across branches — verified on the physical
    plan); instead the minute aggregate is exploded into the three
    (grain, bucket) rows it contributes to and re-aggregated once.
    One raw scan, two shuffles total, and the second shuffle moves
    pre-reduced rows only.
    """
    minute = (
        events.groupBy(
            F.date_trunc("minute", F.col("ts")).alias("bucket"),
            F.col("event_type").alias("key"),
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
        )
    )
    grains = F.array(
        F.struct(F.lit("minute").alias("grain"), F.col("bucket").alias("b")),
        F.struct(
            F.lit("hour").alias("grain"),
            F.date_trunc("hour", F.col("bucket")).alias("b"),
        ),
        F.struct(
            F.lit("day").alias("grain"),
            F.date_trunc("day", F.col("bucket")).alias("b"),
        ),
    )
    # generators can't nest inside expressions: explode in its own select
    exploded = minute.select(
        F.explode(grains).alias("g"), "key", "n", "cents"
    ).select(
        F.col("g.grain").alias("grain"),
        F.col("g.b").alias("bucket"),
        "key",
        "n",
        "cents",
    )
    return (
        exploded.groupBy("grain", "bucket", "key")
        .agg(F.sum("n").alias("n"), F.sum("cents").alias("cents"))
        .select(
            "grain",
            "bucket",
            F.col("key").alias("event_type"),
            "n",
            (F.col("cents") / 100.0).alias("total_value"),
        )
    )
