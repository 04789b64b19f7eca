"""Declared queries: time-series / product-analytics surface.

Hypertable-style operators beyond the continuous rollup
(rollup.py): gap-filled buckets with last-observation-carried-forward
interpolation, cohort retention, ordered funnel conversion, numeric
histograms, fixed-point z-score outlier detection, and deterministic
per-group sampling. The reference engine has none of these natively
(SURVEY §2.5 ABSENT rows) — they are part of the engine-native
capability a user gains by switching.

Determinism: every aggregate over doubles goes through fixed-point
(per-row ``round(x*100)`` → bigint → exact sum); z-scores are
computed from those exact integers with an expression tree written
identically on both engines (IEEE ops on identical inputs are
bit-stable). Sampling orders by md5 hex (engine-portable), never by
partition or input order.

Scale notes (100 TB):
- gapfill's spine is |event_types| x |buckets| — a function of the
  TIME RANGE and grain, not of row count; the raw table is touched by
  exactly one partial-agg shuffle. The LOCF window partitions by
  series key, so no global ordering exists anywhere.
- funnel stages aggregate and join on user_id only; every shuffle in
  the chain shares the user_id hash partitioning, so Spark reuses the
  exchange (stage N's output feeds stage N+1 without repartitioning).
- cohort joins a per-user 1-row frame back to events on user_id —
  a co-partitioned shuffle join at scale, broadcast under AQE when
  the cohort side is small.
- the histogram and z-score are single partial-agg shuffles; the
  z-score stats frame is 1 row per event_type (broadcast join back).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ..registry import declare
from ..sources.tables import load_table


def _cents(col):
    c = F.col(col) if isinstance(col, str) else col
    return F.round(c * 100).cast("long")


@declare(
    "events_gapfill_locf",
    """
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY 1, 2
    ),
    bounds AS (
        SELECT date_trunc('hour', min(ts)) AS b0,
               date_trunc('hour', max(ts)) AS b1
        FROM events
    ),
    spine AS (
        SELECT t.event_type,
               unnest(generate_series(b0, b1, INTERVAL 1 HOUR)) AS bucket
        FROM (SELECT DISTINCT event_type FROM events) t, bounds
    ),
    joined AS (
        SELECT s.event_type, s.bucket,
               COALESCE(a.n, 0) AS n_events, a.cents AS cents_raw
        FROM spine s
        LEFT JOIN agg a ON s.event_type = a.event_type
                       AND s.bucket = a.bucket
    )
    SELECT event_type, bucket,
           CAST(n_events AS BIGINT) AS n_events,
           CAST(COALESCE(last_value(cents_raw IGNORE NULLS) OVER w, 0)
                AS BIGINT) AS cents_locf,
           (cents_raw IS NULL) AS filled
    FROM joined
    WINDOW w AS (PARTITION BY event_type ORDER BY bucket
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
)
def q_gapfill(spark, sf_dir):
    """Gap-filled hourly buckets with LOCF interpolation.

    The timescale-style ``time_bucket_gapfill`` + ``locf`` pair: every
    (event_type, hour) in the observed range gets a row; hours with no
    events carry the last seen value forward (0 before first
    observation). The spine is generated from the range — its size is
    grain-bound, independent of data volume.
    """
    ev = load_table(spark, sf_dir, "events")
    agg = ev.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("bucket")
    ).agg(F.count("*").alias("n"), F.sum(_cents("value")).alias("cents"))
    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("b0"),
        F.date_trunc("hour", F.max("ts")).alias("b1"),
    )
    types = ev.select("event_type").distinct()
    spine = types.crossJoin(F.broadcast(bounds)).select(
        "event_type",
        F.explode(
            F.sequence("b0", "b1", F.expr("INTERVAL 1 HOUR"))
        ).alias("bucket"),
    )
    j = spine.join(agg, ["event_type", "bucket"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "event_type",
        "bucket",
        F.coalesce("n", F.lit(0)).cast("bigint").alias("n_events"),
        F.coalesce(F.last("cents", ignorenulls=True).over(w), F.lit(0))
        .cast("bigint")
        .alias("cents_locf"),
        F.col("cents").isNull().alias("filled"),
    )


@declare(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT f.cohort_day,
           CAST(date_diff('day', f.cohort_day, CAST(e.ts AS DATE))
                AS INTEGER) AS day_offset,
           COUNT(DISTINCT e.user_id) AS n_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def q_cohort(spark, sf_dir):
    """Cohort retention matrix: users grouped by first-seen day,
    counted at each day offset they return. Two shuffles, both hashed
    on user_id (the per-user firsts frame re-joins co-partitioned)."""
    ev = load_table(spark, sf_dir, "events")
    firsts = ev.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    return (
        ev.join(firsts, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.to_date("ts"), F.col("cohort_day")).alias(
                "day_offset"
            ),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@declare(
    "funnel_conversion",
    """
    WITH v AS (
        SELECT user_id, min(ts) AS v_ts FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
        SELECT e.user_id, min(e.ts) AS c_ts
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'click' AND e.ts > v.v_ts
        GROUP BY e.user_id
    ),
    p AS (
        SELECT e.user_id, min(e.ts) AS p_ts
        FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.c_ts
        GROUP BY e.user_id
    )
    SELECT 1 AS stage_no, 'view' AS stage, (SELECT COUNT(*) FROM v) AS users
    UNION ALL
    SELECT 2, 'click_after_view', (SELECT COUNT(*) FROM c)
    UNION ALL
    SELECT 3, 'purchase_after_click', (SELECT COUNT(*) FROM p)
    """,
)
def q_funnel(spark, sf_dir):
    """Strictly-ordered funnel: first view, then a click AFTER that
    view, then a purchase AFTER that click (not the weaker min-ts
    ordering heuristic). Every stage aggregates and joins on user_id,
    so the whole chain rides one hash partitioning."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("v_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("c_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("c_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )

    def stage(df, no, name):
        return df.agg(F.count("*").alias("users")).select(
            F.lit(no).alias("stage_no"),
            F.lit(name).alias("stage"),
            "users",
        )

    return (
        stage(v, 1, "view")
        .unionAll(stage(c, 2, "click_after_view"))
        .unionAll(stage(p, 3, "purchase_after_click"))
    )


@declare(
    "orders_price_histogram",
    """
    SELECT CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS bucket_id,
           COUNT(*) AS n,
           MIN(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS min_cents,
           MAX(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS max_cents,
           CAST(SUM(CAST(ROUND(o_totalprice*100) AS BIGINT)) AS BIGINT)
               AS sum_cents
    FROM orders GROUP BY 1
    """,
)
def q_histogram(spark, sf_dir):
    """width_bucket-style numeric histogram over order value — one
    partial-agg shuffle; bucket ids come from a float division both
    engines evaluate identically (IEEE division + floor)."""
    o = load_table(spark, sf_dir, "orders")
    cents = _cents("o_totalprice")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 25000.0).alias("bucket_id")
        ).agg(
            F.count("*").alias("n"),
            F.min(cents).alias("min_cents"),
            F.max(cents).alias("max_cents"),
            F.sum(cents).alias("sum_cents"),
        )
    )


@declare(
    "events_zscore_outliers",
    """
    WITH stats AS (
        SELECT event_type,
               COUNT(*) AS n,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS s,
               CAST(SUM(CAST(ROUND(value*100) AS BIGINT)
                        * CAST(ROUND(value*100) AS BIGINT)) AS BIGINT) AS ss
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type,
           CAST(ROUND(e.value*100) AS BIGINT) AS value_cents,
           CAST(ROUND(
               ((CAST(ROUND(e.value*100) AS BIGINT) - (s / n))
                / sqrt((ss / n) - (s / n) * (s / n))) * 1000
           ) AS BIGINT) AS z_milli
    FROM events e JOIN stats st ON e.event_type = st.event_type
    WHERE abs((CAST(ROUND(e.value*100) AS BIGINT) - (s / n))
              / sqrt((ss / n) - (s / n) * (s / n))) > 3.0
    """,
)
def q_zscore(spark, sf_dir):
    """Per-series z-score outlier detection.

    Moments are exact integer sums of fixed-point cents (sum and sum
    of squares — cents <= ~56k so squares stay far inside bigint even
    at sf100); mean/variance/z are then IEEE doubles computed with an
    expression tree written identically in the oracle, so the >3-sigma
    cut is bit-stable across engines. Stats frame is one row per
    event_type — broadcast back onto the fact scan.
    """
    ev = load_table(spark, sf_dir, "events")
    cents = _cents("value")
    stats = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(cents).alias("s"),
        F.sum(cents * cents).alias("ss"),
    )
    mean = F.col("s") / F.col("n")
    z = (cents - mean) / F.sqrt(
        (F.col("ss") / F.col("n")) - mean * mean
    )
    return (
        ev.join(F.broadcast(stats), "event_type")
        .filter(F.abs(z) > 3.0)
        .select(
            "event_id",
            "event_type",
            cents.alias("value_cents"),
            F.round(z * 1000).cast("bigint").alias("z_milli"),
        )
    )


@declare(
    "documents_group_sample",
    """
    SELECT source, doc_id, rk FROM (
        SELECT source, doc_id,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('sample:' || CAST(doc_id AS VARCHAR)),
                            doc_id) AS rk
        FROM documents
    ) WHERE rk <= 5
    """,
)
def q_group_sample(spark, sf_dir):
    """Deterministic per-group sample: 5 docs per source, picked by
    md5 order (engine-portable, input-order independent — the same
    salt-and-hash discipline as pipeline.dataset_split). The window
    partitions by group, so at scale each group ranks locally after
    one hash shuffle; no global ordering."""
    d = load_table(spark, sf_dir, "documents")
    key = F.md5(
        F.concat(F.lit("sample:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy(key, "doc_id")
    return (
        d.select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= 5)
    )


@declare(
    "event_transition_matrix",
    """
    WITH t AS (
        SELECT event_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   AS next_type
        FROM events),
    c AS (
        SELECT event_type AS from_type, next_type AS to_type,
               CAST(count(*) AS BIGINT) AS cnt
        FROM t WHERE next_type IS NOT NULL
        GROUP BY 1, 2),
    f AS (
        SELECT from_type, CAST(sum(cnt) AS BIGINT) AS from_total
        FROM c GROUP BY 1)
    SELECT c.from_type, c.to_type, c.cnt, f.from_total,
           CAST((1000000 * c.cnt) // f.from_total AS BIGINT)
               AS prob_micro
    FROM c JOIN f USING (from_type)
    """,
)
def q_event_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    streams (the product-analytics "what happens after X" table):
    lead() within (user_id ORDER BY ts, event_id — deterministic
    under equal timestamps) pairs each event with its successor, one
    groupBy counts transitions, and the row-normalized probability is
    an exact integer fraction (prob_micro floors a non-negative
    numerator, so Spark div == DuckDB //). Scale: the window
    partitions by user (no global order); the transition table is
    |types|² rows, so the normalizing join is a broadcast."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    t = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    )
    c = (
        t.where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    f = c.groupBy("from_type").agg(
        F.sum("cnt").cast("long").alias("from_total")
    )
    return c.join(F.broadcast(f), "from_type").select(
        "from_type",
        "to_type",
        "cnt",
        "from_total",
        F.expr("(1000000L * cnt) div from_total")
        .cast("long")
        .alias("prob_micro"),
    )


@declare(
    "trajectory_returns_events",
    """
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE event_type WHEN 'purchase' THEN 10
                               WHEN 'signup' THEN 5
                               WHEN 'error' THEN -3
                               ELSE 1 END AS r,
               CASE WHEN epoch_us(ts) - epoch_us(
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
    ep AS (
        SELECT user_id, event_id, ts, r,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS episode
        FROM g)
    SELECT user_id, episode,
           CAST(row_number() OVER (PARTITION BY user_id, episode
                                   ORDER BY ts, event_id) AS BIGINT)
             AS step,
           event_id,
           CAST(r AS BIGINT) AS reward_fp,
           CAST(sum(r) OVER (PARTITION BY user_id, episode
                             ORDER BY ts, event_id
                             ROWS BETWEEN CURRENT ROW
                             AND UNBOUNDED FOLLOWING) AS BIGINT)
             AS return_to_go
    FROM ep
    """,
)
def q_trajectory_returns(spark, sf_dir):
    """RL trajectory assembly (r10, pipeline.trajectory_returns):
    events sessionized into episodes (the 30-min gap rule shared
    with events_sessionize) with per-step RETURN-TO-GO — the suffix
    sum of a deterministic event-type reward (purchase 10, signup 5,
    error −3, else 1) to the episode end. The decision-transformer /
    offline-RL data step over interaction logs: (user, episode,
    step, reward, return-to-go) rows, exact integers. One shuffle by
    user; the episode/step/suffix windows all sub-partition it.
    Gap math at microsecond precision (the sessionize lesson)."""
    from pyspark.sql import functions as F

    from . import pipeline

    e = load_table(spark, sf_dir, "events")
    reward = (
        F.when(F.col("event_type") == "purchase", 10)
        .when(F.col("event_type") == "signup", 5)
        .when(F.col("event_type") == "error", -3)
        .otherwise(1)
    )
    return pipeline.trajectory_returns(e, reward)


def _disc_coef_sql() -> str:
    from . import pipeline

    return (
        "[" + ", ".join(str(c) for c in pipeline.disc_coefs()) + "]"
    )


def _disc_hm1() -> int:
    from . import pipeline

    return pipeline.DISC_HORIZON - 1


@declare(
    "discounted_returns_events",
    f"""
    WITH g AS (
        SELECT user_id, event_id, ts,
               CASE event_type WHEN 'purchase' THEN 10
                               WHEN 'signup' THEN 5
                               WHEN 'error' THEN -3
                               ELSE 1 END AS r,
               CASE WHEN epoch_us(ts) - epoch_us(
                         lag(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                         > 1800000000
                    OR lag(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS new_sess
        FROM events),
    ep AS (
        SELECT user_id, event_id, ts, r,
               CAST(SUM(new_sess) OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS BIGINT) AS episode
        FROM g),
    tr AS MATERIALIZED (
        SELECT user_id, episode,
               CAST(row_number() OVER (PARTITION BY user_id, episode
                                       ORDER BY ts, event_id) AS BIGINT)
                 AS step,
               event_id,
               CAST(r AS BIGINT) AS reward_fp,
               CAST(sum(r) OVER (PARTITION BY user_id, episode
                                 ORDER BY ts, event_id
                                 ROWS BETWEEN CURRENT ROW
                                 AND UNBOUNDED FOLLOWING) AS BIGINT)
                 AS return_to_go
        FROM ep),
    trl AS (
        SELECT *, list(reward_fp) OVER (
                   PARTITION BY user_id, episode ORDER BY step
                   ROWS BETWEEN CURRENT ROW
                   AND {_disc_hm1()} FOLLOWING) AS l
        FROM tr)
    SELECT user_id, episode, step, event_id, reward_fp, return_to_go,
           CAST(list_sum([l[i] * ({_disc_coef_sql()})[i]
                          for i in generate_series(1, len(l))])
                AS BIGINT) AS disc_return_fp
    FROM trl
    """,
)
def q_discounted_returns(spark, sf_dir):
    """Discounted n-step return-to-go (r13,
    pipeline.discounted_returns): trajectory_returns' suffix sum at
    γ = 3/4 exact — every term rational with a 4^k denominator, the
    16-step truncation bounding it, so disc_return_fp (scaled by
    4^15) is an exact integer and the offline-RL VALUE TARGET itself
    oracle-checks. Arbitrary γ needs pow() (the ln() lesson); 3/4
    with a fixed horizon is the engine-portable member. Same ONE
    user shuffle as the undiscounted form (the reward window
    sub-partitions it); per-row state is a ≤16-long array."""
    from pyspark.sql import functions as F

    from . import pipeline

    e = load_table(spark, sf_dir, "events")
    reward = (
        F.when(F.col("event_type") == "purchase", 10)
        .when(F.col("event_type") == "signup", 5)
        .when(F.col("event_type") == "error", -3)
        .otherwise(1)
    )
    return pipeline.discounted_returns(e, reward)
