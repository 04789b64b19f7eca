"""Data profiling: per-column summary statistics in one pass (r5).

The ubiquitous engine utility a pipeline runs before trusting a new
table: null counts, exact distinct counts, min/max per column —
computed in a SINGLE aggregate over the table (Spark expands the
multi-distinct into one Expand + partial-agg plan; no per-column
re-scan) and unpivoted into one row per column with the corr-matrix
explode idiom (a k-way UNION would re-run the aggregate per column).

Min/max are computed on the NATIVE type and cast to string only for
the uniform output schema — casting before the extremum would order
"10" < "9". Caller contract: pass double columns pre-scaled to
integers (cents) — double→string formatting differs across engines
and would poison the hash surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: dict) -> DataFrame:
    """Profile the given columns: (col_name, n_rows, null_cnt,
    distinct_cnt, min_s, max_s). ``cols`` maps output name →
    column/Column (already normalized to hash-portable types).
    distinct_cnt is exact and excludes NULL (count(DISTINCT x)
    semantics in both engines); null_cnt = rows − non-null."""
    names = list(cols)
    sel = [
        (c if not isinstance(c, str) else F.col(c)).alias(f"_c_{n}")
        for n, c in cols.items()
    ]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_rows")]
    for n in names:
        aggs += [
            F.count(f"_c_{n}").cast("long").alias(f"_nn_{n}"),
            F.countDistinct(f"_c_{n}").cast("long").alias(f"_d_{n}"),
            F.min(f"_c_{n}").cast("string").alias(f"_min_{n}"),
            F.max(f"_c_{n}").cast("string").alias(f"_max_{n}"),
        ]
    g = df.select(*sel).agg(*aggs)
    structs = [
        F.struct(
            F.lit(n).alias("col_name"),
            (F.col("n_rows") - F.col(f"_nn_{n}"))
            .cast("long")
            .alias("null_cnt"),
            F.col(f"_d_{n}").alias("distinct_cnt"),
            F.col(f"_min_{n}").alias("min_s"),
            F.col(f"_max_{n}").alias("max_s"),
        )
        for n in names
    ]
    ex = g.select("n_rows", F.explode(F.array(*structs)).alias("_p"))
    return ex.select(
        F.col("_p.col_name").alias("col_name"),
        "n_rows",
        F.col("_p.null_cnt").alias("null_cnt"),
        F.col("_p.distinct_cnt").alias("distinct_cnt"),
        F.col("_p.min_s").alias("min_s"),
        F.col("_p.max_s").alias("max_s"),
    )
