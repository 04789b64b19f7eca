"""Range/interval join: points against [start, end] intervals.

Spark plans a raw ``p.ts BETWEEN i.start AND i.end`` predicate as a
nested-loop (BroadcastNestedLoopJoin) — O(|points|·|intervals|), a
scale-killer. The scale path here reduces the theta-join to an
equi-join: intervals are exploded into the fixed-width time bins they
cover, points carry their single bin, and the join key is
(optional equi keys..., bin) with the exact containment predicate
applied AFTER the hash join. Cost is |points| + |intervals|·(spanned
bins) shuffled on the bin key — linear, AQE-skew-splittable.

A point's bin is unique, so a matching (point, interval) pair meets
in exactly one bin: no post-join dedup is needed.

The same reduction is how the reference's world would shard a time
index; there is no analogous operator there (SURVEY §2.5 ABSENT
rows) — this is engine-native surface. The O(n·m) form exists only
inside the oracle SQL that verifies this operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HOUR_US = 3600 * 1_000_000


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    on: list[str] | None = None,
    bin_width_us: int = HOUR_US,
) -> DataFrame:
    """Inner join: every (point, interval) pair with
    ``start <= ts <= end`` (timestamps as epoch microseconds, bounds
    inclusive) and equality on ``on``. Returns all columns from both
    sides; callers aggregate or project.

    ``bin_width_us`` trades shuffle fan-out for candidate precision:
    an interval is replicated once per spanned bin (width ≈ typical
    interval length keeps that ~2); points are never replicated.
    """
    on = on or []
    pbin = (F.col(point_ts) / F.lit(bin_width_us)).cast("long")
    ibins = F.sequence(
        (F.col(start_ts) / F.lit(bin_width_us)).cast("long"),
        (F.col(end_ts) / F.lit(bin_width_us)).cast("long"),
    )
    p = points.withColumn("_bin", pbin)
    i = intervals.withColumn("_bin", F.explode(ibins))
    return (
        p.join(i, on + ["_bin"])
        .filter(
            (F.col(point_ts) >= F.col(start_ts))
            & (F.col(point_ts) <= F.col(end_ts))
        )
        .drop("_bin")
    )


def errors_within_hour_of_purchase(events: DataFrame) -> DataFrame:
    """Declared form: per purchase event, how many error events the
    same user produced within the following hour (bounds inclusive).
    Purchases with no errors count 0 (left semantics via count
    re-join). Columns: (purchase_id, user_id, n_errors_1h).
    """
    us = F.unix_micros(F.col("ts"))
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        us.alias("w_start"),
        (us + F.lit(HOUR_US)).alias("w_end"),
    )
    errors = events.filter(F.col("event_type") == "error").select(
        "user_id", us.alias("err_us")
    )
    matched = interval_join(
        errors,
        purchases,
        point_ts="err_us",
        start_ts="w_start",
        end_ts="w_end",
        on=["user_id"],
    )
    counts = matched.groupBy("purchase_id").agg(
        F.count("*").alias("n_errors_1h")
    )
    return (
        purchases.join(counts, "purchase_id", "left")
        .select(
            "purchase_id",
            "user_id",
            F.coalesce(F.col("n_errors_1h"), F.lit(0)).cast("long").alias(
                "n_errors_1h"
            ),
        )
    )
