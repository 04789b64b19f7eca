"""Mergeable distinct-count sketches (KMV / k-minimum-values).

The 100 TB cardinality tool: Spark's ``approx_count_distinct`` (HLL)
is fast but engine-opaque — its registers can never be replayed in a
second engine, so it is only ever rows-only evidence. KMV (Bar-Yossef
et al. 2002; Beyer et al. SIGMOD 2007) over an md5-derived 48-bit
uniform hash is just as mergeable (the union of two sketches is the
k smallest of the combined hash sets — the same pipeline run again)
but every intermediate is a deterministic integer, so the sketch AND
its estimate replay bit-for-bit in DuckDB: the portable-hash recipe
(winnowing / SRP / md5-MinHash) applied to cardinality estimation.

Estimator: with h_(k) the k-th smallest distinct hash on [0, 2^48),
D-hat = (k-1) * 2^48 / h_(k), exact integer division; groups with
fewer than k distinct hashes report their exact count (the sketch is
lossless below k). Relative error ~ 1/sqrt(k-2) (~13% at k=64).

Scale shape: one DISTINCT on (group, hash) — a partial-aggregated
shuffle — then a per-group top-k window (WindowGroupLimit pushes the
rank filter into the sort at scale; k rows per group survive). No
driver state; sketches for different partitions/days merge by
unioning their (group, h) rows and re-running the same top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

KMV_K = 64
KMV_SPACE = 1 << 48  # md5 12-hex-prefix hash domain


def kmv_hash(col) -> F.Column:
    """Uniform 48-bit integer hash of a column's string form — first
    12 hex chars of md5, the repo's engine-portable hash recipe."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 12), 16, 10).cast(
        "long"
    )


def kmv_distinct(
    df: DataFrame,
    group_col: str,
    value_col: str,
    k: int = KMV_K,
) -> DataFrame:
    """(group, n_kept, kth_min, kmv_estimate) per group.

    n_kept < k means the group had fewer than k distinct hashes and
    kmv_estimate IS the exact distinct count; otherwise the estimate
    is (k-1)*2^48 div kth_min (integer division — floor == truncate
    for the all-positive operands, so DuckDB ``//`` replays it)."""
    assert (k - 1) * KMV_SPACE < (1 << 63), "estimator numerator overflows"
    dh = (
        df.select(
            F.col(group_col).alias("grp"), kmv_hash(value_col).alias("h")
        )
        .distinct()
    )
    w = Window.partitionBy("grp").orderBy("h")
    kept = (
        dh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_kept"),
            F.max("h").alias("kth_min"),
        )
    )
    est = F.when(F.col("n_kept") < k, F.col("n_kept")).otherwise(
        F.expr(f"{(k - 1) * KMV_SPACE}L div kth_min")
    )
    return kept.select(
        "grp", "n_kept", "kth_min", est.cast("long").alias("kmv_estimate")
    )


def kmv_merge(sketch_rows: DataFrame, k: int = KMV_K) -> DataFrame:
    """Union-merge raw sketch rows (grp, h) from any number of
    partial sketches: the k smallest of the combined distinct hashes
    — demonstrating that KMV composes across files/days/clusters
    exactly like HLL register-max, but verifiably."""
    dh = sketch_rows.select("grp", "h").distinct()
    w = Window.partitionBy("grp").orderBy("h")
    return (
        dh.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("grp", "h")
    )
