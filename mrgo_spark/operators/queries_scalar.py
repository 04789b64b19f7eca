"""Declared queries: scalar-function batteries, cube, as-of join.

Scalar coverage policy: only IEEE-exact or integer-exact functions
are declared (abs/ceil/floor/sqrt/mod, string ops, date parts) —
transcendentals (ln/exp/sin) differ in the last ulp between libm
implementations, so they stay engine-native (still available, just
not oracle-declared).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..registry import declare
from ..sources.tables import load_table
from . import asof


@declare(
    "scalar_string_battery",
    """
    SELECT n_nationkey,
           upper(n_name) AS up,
           lower(n_name) AS lo,
           substr(n_name, 1, 3) AS sub3,
           length(n_name) AS len,
           concat(n_name, '#', CAST(n_regionkey AS VARCHAR)) AS tagged,
           replace(n_name, 'A', '@') AS repl,
           lpad(n_name, 12, '.') AS padded,
           trim(concat(' ', n_name, ' ')) AS trimmed,
           reverse(n_name) AS rev,
           CASE WHEN n_name LIKE '%IA%' THEN 1 ELSE 0 END AS has_ia,
           regexp_replace(n_name, '[AEIOU]', '_', 'g') AS devowel,
           split_part(n_name, ' ', 1) AS first_word
    FROM nation
    """,
)
def q_scalar_string(spark, sf_dir):
    """String scalar functions (reference surface: SURVEY §2.5 scalar
    row — the reference had only split/len/itoa/join/sprintf)."""
    n = load_table(spark, sf_dir, "nation")
    c = F.col("n_name")
    return n.select(
        "n_nationkey",
        F.upper(c).alias("up"),
        F.lower(c).alias("lo"),
        F.substring(c, 1, 3).alias("sub3"),
        F.length(c).alias("len"),
        F.concat(c, F.lit("#"), F.col("n_regionkey").cast("string")).alias("tagged"),
        F.replace(c, F.lit("A"), F.lit("@")).alias("repl"),
        F.lpad(c, 12, ".").alias("padded"),
        F.trim(F.concat(F.lit(" "), c, F.lit(" "))).alias("trimmed"),
        F.reverse(c).alias("rev"),
        F.when(c.like("%IA%"), 1).otherwise(0).alias("has_ia"),
        F.regexp_replace(c, "[AEIOU]", "_").alias("devowel"),
        F.split_part(c, F.lit(" "), F.lit(1)).alias("first_word"),
    )


@declare(
    "scalar_math_battery",
    """
    SELECT o_orderkey,
           abs(o_totalprice - 100000.0) AS dist,
           CAST(ceil(o_totalprice) AS BIGINT) AS up_int,
           CAST(floor(o_totalprice) AS BIGINT) AS down_int,
           sqrt(CAST(o_orderkey AS DOUBLE)) AS root,
           o_orderkey % 7 AS m7,
           CAST(round(o_totalprice, 1)*10 AS BIGINT) AS tenth_cents,
           greatest(o_totalprice, 100000.0) AS hi,
           least(o_totalprice, 100000.0) AS lo,
           CAST(sign(o_totalprice - 100000.0) AS INT) AS sgn
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def q_scalar_math(spark, sf_dir):
    """Math scalars (IEEE-exact subset: abs/ceil/floor/sqrt/mod/sign).

    round(x,1)*10 is compared as integer to avoid representational
    drift on the .1 decimal."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    p = F.col("o_totalprice")
    return o.select(
        "o_orderkey",
        F.abs(p - 100000.0).alias("dist"),
        F.ceil(p).cast("bigint").alias("up_int"),
        F.floor(p).cast("bigint").alias("down_int"),
        F.sqrt(F.col("o_orderkey").cast("double")).alias("root"),
        (F.col("o_orderkey") % 7).alias("m7"),
        (F.round(p, 1) * 10).cast("bigint").alias("tenth_cents"),
        F.greatest(p, F.lit(100000.0)).alias("hi"),
        F.least(p, F.lit(100000.0)).alias("lo"),
        F.signum(p - 100000.0).cast("int").alias("sgn"),
    )


@declare(
    "scalar_date_battery",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INT) AS y,
           CAST(month(o_orderdate) AS INT) AS m,
           CAST(day(o_orderdate) AS INT) AS d,
           CAST(dayofweek(o_orderdate) AS INT) + 1 AS dow,
           CAST(quarter(o_orderdate) AS INT) AS q,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate + INTERVAL 30 DAY AS DATE) AS plus30,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS age_days
    FROM orders WHERE o_orderkey % 100 = 0
    """,
)
def q_scalar_date(spark, sf_dir):
    """Date/time scalars. DuckDB dayofweek is 0=Sunday; Spark dayofweek
    is 1=Sunday — oracle adds 1 to align."""
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 100 == 0)
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.dayofweek(d).alias("dow"),
        F.quarter(d).alias("q"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        F.date_add(d.cast("date"), 30).alias("plus30"),
        F.datediff(d.cast("date"), F.lit("1995-01-01").cast("date")).cast(
            "bigint"
        ).alias("age_days"),
    )


@declare(
    "array_battery",
    """
    SELECT vec_id,
           len(embedding) AS dim,
           CAST(round(CAST(embedding[1] AS DOUBLE) * 1000000) AS BIGINT) AS first_fx,
           CAST(round(CAST(embedding[len(embedding)] AS DOUBLE) * 1000000) AS BIGINT)
               AS last_fx,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           CAST(round(CAST(list_max(embedding) AS DOUBLE) * 1000000) AS BIGINT)
               AS max_fx,
           len(list_distinct([CAST(x > 0 AS INT) for x in embedding])) AS n_signs
    FROM embeddings WHERE vec_id % 50 = 0
    """,
)
def q_array_battery(spark, sf_dir):
    """Array/higher-order functions over the embedding column (X5
    multimodal-adjacent: typed array columns are first-class)."""
    e = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") % 50 == 0)
    emb = F.col("embedding")
    fx = lambda c: F.round(c.cast("double") * 1000000).cast("bigint")  # noqa: E731
    return e.select(
        "vec_id",
        F.size(emb).alias("dim"),
        fx(F.element_at(emb, 1)).alias("first_fx"),
        fx(F.element_at(emb, -1)).alias("last_fx"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        fx(F.array_max(emb)).alias("max_fx"),
        F.size(
            F.array_distinct(F.transform(emb, lambda x: (x > 0).cast("int")))
        ).alias("n_signs"),
    )


@declare(
    "cube_order_status",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT) AS cents
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q_cube(spark, sf_dir):
    """CUBE grouping sets (completes rollup coverage)."""
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.round(F.col("o_totalprice") * 100).cast("bigint")).alias("cents"),
        )
    )


@declare(
    "asof_last_purchase",
    """
    WITH purchases AS (
        SELECT user_id, ts, max(value) AS pvalue
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ),
    errors AS (
        SELECT event_id, user_id, ts FROM events WHERE event_type = 'error'
    )
    SELECT e.event_id, e.user_id, p.pvalue AS last_purchase_value
    FROM errors e ASOF LEFT JOIN purchases p
      ON e.user_id = p.user_id AND e.ts >= p.ts
    """,
)
def q_asof(spark, sf_dir):
    """As-of join: for each error event, the user's most recent
    purchase value at or before that moment. Right side deduped per
    (user, ts) so the match is unique → deterministic."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("pvalue"))
    )
    out = asof.asof_join(
        errors,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        value_cols=["pvalue"],
    )
    return out.select(
        "event_id", "user_id", F.col("pvalue").alias("last_purchase_value")
    )


@declare(
    "json_extract_props",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
               AS sum_k,
           MIN(CAST(json_extract(props, '$.k') AS BIGINT)) AS min_k,
           MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def q_json_props(spark, sf_dir):
    """JSON scalar functions over the events.props column (the
    reference's only JSON use was the shuffle codec, O4; here JSON is
    a first-class column format)."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(k).alias("sum_k"),
        F.min(k).alias("min_k"),
        F.max(k).alias("max_k"),
    )


@declare(
    "salted_hot_key_agg",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents,
           MIN(user_id) AS min_user,
           MAX(user_id) AS max_user
    FROM events GROUP BY event_type
    """,
)
def q_salted_agg(spark, sf_dir):
    """Skew-mitigation surface as a declared query: a two-stage
    salted aggregation over a low-cardinality key (event_type — the
    hot-key shape where one reducer would otherwise take the whole
    group). Salting spreads each key across 16 reducers in stage 1;
    stage 2 folds the partials. Result is provably identical to the
    direct aggregate — the oracle IS the direct aggregate."""
    from .skew import salted_agg

    e = load_table(spark, sf_dir, "events").withColumn(
        "cents_part", F.round(F.col("value") * 100).cast("long")
    )
    out = salted_agg(
        e,
        key="event_type",
        aggs={
            "n_events": ("count", "*"),
            "cents": ("sum", "cents_part"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
    )
    return out.select(
        "event_type", "n_events", "cents", "min_user", "max_user"
    )


@declare(
    "salted_skew_join",
    """
    WITH dim AS (
        SELECT DISTINCT event_type, length(event_type) AS w FROM events
    )
    SELECT e.event_type, d.w,
           COUNT(*) AS n,
           CAST(SUM(e.event_id) AS BIGINT) AS sum_id
    FROM events e JOIN dim d USING (event_type)
    GROUP BY 1, 2
    """,
)
def q_salted_skew_join(spark, sf_dir):
    """Skewed JOIN salting: events' 5-value event_type key means a
    plain shuffle join lands each key on ONE reducer no matter how
    many partitions exist. salted_join spreads each key over n_salt
    partitions by salting the fact side and replicating the dim —
    provably row-identical to the plain join, so the oracle IS the
    plain join (the sum over event_id pins exact row multiplicity).
    tests/test_plans.py asserts the salted exchange shape with
    broadcast disabled."""
    from .skew import salted_join

    e = load_table(spark, sf_dir, "events").select("event_id", "event_type")
    dim = (
        e.select("event_type")
        .distinct()
        .select("event_type", F.length("event_type").alias("w"))
    )
    joined = salted_join(e, dim, "event_type", n_salt=8)
    return joined.groupBy("event_type", "w").agg(
        F.count("*").alias("n"),
        F.sum("event_id").alias("sum_id"),
    )


@declare(
    "map_battery",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(len(json_keys(props))) AS BIGINT) AS total_keys,
           CAST(SUM(CASE WHEN json_extract(props, '$.k') IS NOT NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS has_k
    FROM events GROUP BY event_type
    """,
)
def q_map_battery(spark, sf_dir):
    """Map-type functions: JSON props parsed to map<string,bigint>,
    then map_keys/map_contains_key aggregates (the engine's map
    column surface; reference had no map type at all)."""
    e = load_table(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,bigint>")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.size(F.map_keys(m))).alias("total_keys"),
        F.sum(F.when(F.map_contains_key(m, "k"), 1).otherwise(0)).alias("has_k"),
    )
