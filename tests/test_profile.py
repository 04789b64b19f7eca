"""profile_columns: single-aggregate profiling vs a pure-Python scan,
plus the null-handling and native-type-extremum contracts.

Reference parity note: no reference analog (engine-native utility —
the pre-flight table audit of a data pipeline)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrgo_spark.operators import profile
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_profile_matches_python_scan(spark):
    cust = load_table(spark, SF, "customer")
    got = {
        r.col_name: (r.n_rows, r.null_cnt, r.distinct_cnt, r.min_s, r.max_s)
        for r in profile.profile_columns(
            cust,
            {
                "c_custkey": F.col("c_custkey"),
                "c_mktsegment": F.col("c_mktsegment"),
            },
        ).collect()
    }
    data = cust.select("c_custkey", "c_mktsegment").collect()
    for name, vals in (
        ("c_custkey", [r.c_custkey for r in data]),
        ("c_mktsegment", [r.c_mktsegment for r in data]),
    ):
        nn = [v for v in vals if v is not None]
        assert got[name] == (
            len(vals),
            len(vals) - len(nn),
            len(set(nn)),
            str(min(nn)),
            str(max(nn)),
        )


def test_profile_nulls_and_native_extrema(spark):
    # min/max must be computed on the NATIVE type: with string-cast
    # ordering min would be "10" < "9".
    df = spark.createDataFrame(
        [(9,), (10,), (None,), (2,)], "x long"
    )
    r = profile.profile_columns(df, {"x": F.col("x")}).collect()[0]
    assert (r.n_rows, r.null_cnt, r.distinct_cnt) == (4, 1, 3)
    assert (r.min_s, r.max_s) == ("2", "10")


def test_profile_single_aggregate_plan(spark):
    cust = load_table(spark, SF, "customer")
    plan = (
        profile.profile_columns(
            cust, {"a": "c_custkey", "b": "c_mktsegment"}
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # one table scan feeding one (expanded) aggregate — no per-column
    # re-scan, no union
    assert plan.count("Scan parquet") == 1 and "Union" not in plan


def test_corpus_datacard_consistent_with_component_contracts(spark):
    from mrgo_spark.operators import dedup, profile, textstats
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    card = {r.lang: r for r in profile.corpus_datacard(docs).collect()}
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    assert set(card) == langs

    scores = textstats.classifier_quality_scores(docs).collect()
    lang_of = {
        r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()
    }
    ckeep: dict = {}
    ntok: dict = {}
    for r in scores:
        lg = lang_of[r.doc_id]
        ckeep[lg] = ckeep.get(lg, 0) + (1 if r.score >= 0 else 0)
        ntok[lg] = ntok.get(lg, 0) + r.n_tokens
    from pyspark.sql import functions as F

    hkeep_rows = docs.select(
        "lang", textstats.quality_keep("text").cast("int").alias("k")
    ).collect()
    hkeep: dict = {}
    for r in hkeep_rows:
        hkeep[r.lang] = hkeep.get(r.lang, 0) + r.k
    fp_rows = docs.select(
        "lang", dedup.fingerprint("text").alias("fp")
    ).collect()
    fps: dict = {}
    for r in fp_rows:
        fps.setdefault(r.lang, set()).add(r.fp)
    for lg, row in card.items():
        assert row.classifier_keep == ckeep[lg]
        assert row.total_tokens == ntok[lg]
        assert row.heuristic_keep == hkeep[lg]
        assert row.distinct_fingerprints == len(fps[lg])
        assert row.dup_docs == row.n_docs - len(fps[lg])
