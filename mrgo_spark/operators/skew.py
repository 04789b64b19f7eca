"""Skew-mitigation utilities.

AQE's skew-join splitting covers joins; for *aggregations* with
pathological hot keys (a stopword at 100 TB, a bot user_id) the
classic remedy is salting: aggregate on (key, salt) first, then
re-aggregate on key. Results are identical for any algebraic
aggregate; the first stage spreads one hot key over ``n_salt``
reducers.

Only worth it when a single key exceeds what one task should hold —
partial (map-side) aggregation already absorbs ordinary skew, which
is why the declared queries don't salt by default (SCALE.md).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# (partial_expr, final_expr) pairs per supported algebraic aggregate:
# stage 1 computes partial_expr as column `c`, stage 2 folds the
# partials with final_expr.
_ALGEBRAIC: dict[str, tuple[Callable[[str], Column], Callable[[str], Column]]] = {
    "count": (lambda c: F.count(c), lambda c: F.sum(c)),
    "sum": (lambda c: F.sum(c), lambda c: F.sum(c)),
    "min": (lambda c: F.min(c), lambda c: F.min(c)),
    "max": (lambda c: F.max(c), lambda c: F.max(c)),
}


def salted_agg(
    df: DataFrame,
    key: str,
    aggs: dict[str, tuple[str, str]],
    n_salt: int = 16,
) -> DataFrame:
    """Two-stage salted aggregation.

    ``aggs`` maps output column -> (agg_name, input_column), e.g.
    ``{"cnt": ("count", "*"), "total": ("sum", "v")}``.
    Salt is derived from the full row via crc32 of the input column
    (or a random-free deterministic spread for '*'), so re-runs are
    deterministic.
    """
    for name, (fn, _col) in aggs.items():
        if fn not in _ALGEBRAIC:
            raise ValueError(f"{name}: '{fn}' is not algebraic-salted-safe")

    salt = F.pmod(F.crc32(F.concat_ws("\x00", *df.columns)), F.lit(n_salt))
    stage1 = (
        df.withColumn("_salt", salt)
        .groupBy(key, "_salt")
        .agg(
            *[
                _ALGEBRAIC[fn][0]("*" if col == "*" else col).alias(f"_p_{name}")
                for name, (fn, col) in aggs.items()
            ]
        )
    )
    return stage1.groupBy(key).agg(
        *[
            _ALGEBRAIC[fn][1](f"_p_{name}").alias(name)
            for name, (fn, col) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    other: DataFrame,
    key: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Salted equi-join: spread each hot key of ``big`` over n_salt
    shuffle partitions by salting big's rows and replicating ``other``
    n_salt× (explode of a literal range — map-side, no shuffle to
    build). Row-identical to ``big.join(other, key, how)`` for inner/
    left joins.

    When to use: BOTH sides too big to broadcast and the key
    distribution has heavy hitters (a handful of event types over
    billions of rows) — without salting every hot key lands on one
    reducer regardless of shuffle partition count. AQE's skew-join
    split handles sort-merge skew after the fact; explicit salting is
    the declarative form that also survives plan shapes AQE won't
    touch (e.g. pre-aggregations sharing the exchange). Cost: other
    is shuffled at n_salt× its size — keep ``other`` the smaller side.
    """
    assert how in ("inner", "left"), "salted_join: row-identity proven for inner/left"
    salt = F.pmod(F.crc32(F.concat_ws("\x00", *big.columns)), F.lit(n_salt))
    b = big.withColumn("_salt", salt)
    o = other.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(o, [key, "_salt"], how).drop("_salt")
