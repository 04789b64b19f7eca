"""As-of (temporal) join — an operator Spark lacks natively.

Composition of built-ins (preference (a) from the build mandate): tag
both sides, union, one window pass with ``last(..., ignorenulls)`` —
a single shuffle on the key, no range cross-product, no Python. This
is the scale-safe formulation: state per key is one running value,
skew handled by AQE like any window.

(The pandas alternative — ``applyInPandas`` + ``pd.merge_asof`` per
key group — is strictly worse here: Arrow round-trip plus per-group
Python. Kept out deliberately.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    value_cols: list[str],
    direction: str = "backward",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right_ts <= left_ts (direction='backward'; 'forward' mirrors).

    Right rows should be unique per (on, right_ts) — pre-aggregate if
    not, or the tie is resolved by union order nondeterministically.
    Output: all left columns + value_cols (nullable when no match).
    """
    lcols = left.columns
    l_tagged = left.select(
        *lcols,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"_r_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols],
    ).select(*lcols, "_ts", "_side", *[f"_r_{c}" for c in value_cols])

    u = l_tagged.unionByName(r_tagged)
    if direction == "backward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("_ts"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    elif direction == "forward":
        w = (
            Window.partitionBy(on)
            .orderBy(F.desc("_ts"), F.asc("_side"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
    else:
        raise ValueError(f"unknown direction: {direction}")

    filled = u.select(
        *lcols,
        "_side",
        *[
            F.last(f"_r_{c}", ignorenulls=True).over(w).alias(c)
            for c in value_cols
        ],
    )
    return filled.filter(F.col("_side") == 1).drop("_side")
