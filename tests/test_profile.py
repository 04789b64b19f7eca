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


def test_l_diversity_planted_homogeneous_class(spark):
    """A big-but-homogeneous class fails both l-tests (the
    homogeneity attack k-anonymity misses); a diverse class passes
    distinct-l; recursive (c,l) follows the paper's inequality —
    all re-derived in pure Python."""
    from collections import Counter

    from mrgo_spark.operators import profile as profile_ops

    rows = (
        [("a", 1, "x")] * 10                       # homogeneous
        + [("b", 1, s) for s in "xyz" * 4]         # diverse, balanced
        + [("c", 2, "x")] * 8 + [("c", 2, "y"), ("c", 2, "z")]
        # skewed: 3 distinct but top_freq 8 vs tail — recursive fails
    )
    df = spark.createDataFrame(rows, "q1 string, q2 int, sv string")
    out = {
        (r.q1, r.q2): r
        for r in profile_ops.l_diversity_audit(
            df, ["q1", "q2"], "sv", l=3, c=2
        ).collect()
    }
    # python differential
    groups: dict = {}
    for q1, q2, sv in rows:
        groups.setdefault((q1, q2), []).append(sv)
    for k, svs in groups.items():
        cnt = Counter(svs)
        freqs = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        tail = sum(c for _v, c in freqs[2:])  # l=3 → 3rd onward
        r = out[k]
        assert r.n == len(svs)
        assert r.n_distinct_sv == len(cnt)
        assert r.distinct_l_ok == (len(cnt) >= 3)
        assert r.top_freq == freqs[0][1]
        assert r.tail_from_l == tail
        assert r.recursive_cl_ok == (freqs[0][1] < 2 * tail)
    assert not out[("a", 1)].distinct_l_ok
    assert out[("b", 1)].distinct_l_ok and out[("b", 1)].recursive_cl_ok
    assert out[("c", 2)].distinct_l_ok and not out[("c", 2)].recursive_cl_ok


def test_t_closeness_exact_emd_differential(spark):
    """emd_milli equals the exact rational ½Σ|p−q| computed with
    Fraction arithmetic; a class mirroring the global distribution
    scores 0; a fully-skewed singleton-value class scores the
    complement mass."""
    from collections import Counter
    from fractions import Fraction

    from mrgo_spark.operators import profile as profile_ops

    rows = (
        [("m", "x")] * 6 + [("m", "y")] * 3 + [("m", "z")] * 3
        + [("s", "x")] * 4            # all-x: maximally skewed
        + [("u", "y"), ("u", "z")]
    )
    df = spark.createDataFrame(rows, "q string, sv string")
    out = {
        r.q: r
        for r in profile_ops.t_closeness_audit(
            df, ["q"], "sv", t_milli=300
        ).collect()
    }
    glob = Counter(sv for _q, sv in rows)
    n_tot = len(rows)
    groups: dict = {}
    for q, sv in rows:
        groups.setdefault(q, []).append(sv)
    for q, svs in groups.items():
        cnt = Counter(svs)
        emd = (
            sum(
                abs(Fraction(cnt.get(v, 0), len(svs)) - Fraction(g, n_tot))
                for v, g in glob.items()
            )
            / 2
        )
        want_milli = (1000 * emd.numerator) // emd.denominator
        r = out[q]
        assert r.n == len(svs)
        assert r.emd_milli == want_milli
        assert r.t_violated == (want_milli > 300)
    assert out["s"].t_violated  # all-x skew
