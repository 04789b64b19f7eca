"""Round-11 operators: phrase search, snapshot diff, LSH recall eval,
handoff GC / transfer serving covered in test_kv.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrgo_spark.operators import dedup, retrieval


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _phrases(spark, rows):
    return spark.createDataFrame(rows, "phrase_id long, role int, tok string")


def test_phrase_search_consecutive_only(spark):
    """A phrase matches only at CONSECUTIVE positions: scattered
    tokens and reordered tokens don't count; repeated occurrences
    count each anchor."""
    docs = _docs(
        spark,
        [
            (1, "alpha beta gamma end"),          # 1 occurrence
            (2, "alpha beta gamma alpha beta gamma"),  # 2 occurrences
            (3, "alpha x beta y gamma"),          # scattered → no
            (4, "gamma beta alpha"),              # reordered → no
            (5, "Alpha, BETA; gamma!"),           # case/punct-blind → 1
        ],
    )
    ph = _phrases(
        spark, [(100, 1, "alpha"), (100, 2, "beta"), (100, 3, "gamma")]
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in retrieval.phrase_search(docs, ph, phrase_len=3).collect()
    }
    assert got == {(100, 1): 1, (100, 2): 2, (100, 5): 1}


def test_phrase_search_repeated_token_phrase(spark):
    """A phrase with a repeated token ('a b a') must not false-match
    on 'a b' alone — every role's position is anchored."""
    docs = _docs(
        spark,
        [
            (1, "a b a tail"),   # match at anchor 0
            (2, "a b c a"),      # no 'a' at position 2 → no match
            (3, "a a b a"),      # match at positions 1..3
        ],
    )
    ph = _phrases(spark, [(7, 1, "a"), (7, 2, "b"), (7, 3, "a")])
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in retrieval.phrase_search(docs, ph, phrase_len=3).collect()
    }
    assert got == {(7, 1): 1, (7, 3): 1}


def test_phrase_terms_from_docs_shape(spark):
    """Derived phrases: first L tokens in role order; short docs
    skipped."""
    docs = _docs(spark, [(10, "One two three four"), (20, "too short")])
    rows = sorted(
        map(
            tuple,
            retrieval.phrase_terms_from_docs(
                docs, F.lit(True), phrase_len=3
            ).collect(),
        )
    )
    assert rows == [(10, 1, "one"), (10, 2, "two"), (10, 3, "three")]


def test_phrase_search_self_pin_on_fixture(spark):
    """The declared entry's invariant: every derived phrase matches
    its own source document at least once."""
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    ph = retrieval.phrase_terms_from_docs(
        docs, F.col("doc_id") % 50 == 0, phrase_len=3
    )
    phrase_ids = {r.phrase_id for r in ph.select("phrase_id").distinct().collect()}
    assert phrase_ids
    got = {
        (r.phrase_id, r.doc_id)
        for r in retrieval.phrase_search(docs, ph, phrase_len=3).collect()
    }
    for pid in phrase_ids:
        assert (pid, pid) in got, pid


def test_snapshot_diff_verdicts(spark):
    """All four verdicts + the token-multiset identity: re-cased /
    reordered text reads as unchanged, truncation as changed."""
    old = _docs(
        spark,
        [
            (1, "same text here"),
            (2, "this one gets truncated badly"),
            (3, "Case And Order matter not"),
            (9, "only in old"),
        ],
    )
    new = _docs(
        spark,
        [
            (1, "same text here"),
            (2, "this one gets"),
            (3, "not matter order and case"),
            (4, "brand new doc"),
        ],
    )
    got = {r.doc_id: r.verdict for r in dedup.snapshot_diff(old, new).collect()}
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "unchanged",
        4: "added",
        9: "removed",
    }
    lens = {
        r.doc_id: (r.len_before, r.len_after)
        for r in dedup.snapshot_diff(old, new).collect()
    }
    assert lens[4] == (None, 13) and lens[9] == (11, None)
    assert lens[2] == (29, 13)


def test_lsh_recall_eval_exact_copies_full_recall(spark):
    """Exact copies produce identical signatures → they collide in
    every band, so candidate recall on an exact-copy corpus is 1000
    exactly; candidates ≥ caught ≤ truth always."""
    base = [
        (i, f"tok{i} alpha beta gamma delta epsilon zeta eta theta "
            f"iota kappa tok{i}x")
        for i in range(20)
    ]
    copies = [(i + 1000, t) for i, t in base[:8]]
    docs = _docs(spark, base + copies)
    row = dedup.lsh_recall_eval(docs).collect()[0]
    assert row.n_truth >= 8  # every planted copy pair is truth
    assert row.n_caught == row.n_truth
    assert row.recall_milli == 1000
    assert row.n_candidates >= row.n_caught


def test_lsh_recall_eval_vacuous_when_no_truth(spark):
    """No J≥0.95 pairs → n_truth 0 and vacuous recall 1000 (pinned
    so the fixture-drift failure mode is a loud diff, not a div0)."""
    docs = _docs(
        spark,
        [(1, "completely different words here"),
         (2, "nothing shared with that other document at all")],
    )
    row = dedup.lsh_recall_eval(docs).collect()[0]
    assert row.n_truth == 0 and row.recall_milli == 1000


def test_phrase_local_twin_matches_postings_form(spark):
    """The array-local matcher must agree with the postings-join
    phrase_search exactly on the fixture (same derived phrases)."""
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    flt = F.col("doc_id") % 50 == 0
    terms = retrieval.phrase_terms_from_docs(docs, flt, phrase_len=3)
    arrays = retrieval.phrase_arrays_from_docs(docs, flt, phrase_len=3)
    a = sorted(
        map(tuple, retrieval.phrase_search(docs, terms, 3).collect())
    )
    b = sorted(
        map(
            tuple,
            retrieval.phrase_match_counts_local(docs, arrays, 3).collect(),
        )
    )
    assert a == b and a


def test_phrase_local_short_doc_edge(spark):
    """Docs shorter than the phrase scan nothing (the sequence(1,0)
    descent guard)."""
    docs = _docs(spark, [(1, "a b"), (2, "a b c")])
    arrays = spark.createDataFrame(
        [(9, ["a", "b", "c"])], "phrase_id long, ptoks array<string>"
    )
    got = {
        (r.phrase_id, r.doc_id): r.n_matches
        for r in retrieval.phrase_match_counts_local(
            docs, arrays, 3
        ).collect()
    }
    assert got == {(9, 2): 1}


def test_streaming_phrase_matches_agrees_with_batch(spark, tmp_path):
    """Stateless stream-static phrase monitor == the batch local
    matcher over the same docs."""
    from mrgo_spark.sources.tables import load_table
    from mrgo_spark.streaming import stream_ops

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    arrays = retrieval.phrase_arrays_from_docs(
        docs, F.col("doc_id") % 50 == 0, phrase_len=3
    ).localCheckpoint()
    want = sorted(
        map(
            tuple,
            retrieval.phrase_match_counts_local(docs, arrays, 3).collect(),
        )
    )
    d = tmp_path / "phrase_docs"
    docs.select("doc_id", "text").coalesce(2).write.parquet(str(d))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(d)
    )
    out = stream_ops.streaming_phrase_matches(stream, arrays, 3)
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("phrase_out")
        .start()
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM phrase_out").collect())
    )
    assert got == want and got


def test_frequent_span_audit_rank_and_coverage(spark):
    """Top-k most frequent n-grams: rank order total, coverage ≤
    occurrences, planted repeated span surfaces first."""
    from mrgo_spark.operators import textstats

    rows = [(i, "the quick brown fox jumps over it") for i in range(5)]
    rows += [(100 + i, f"unique text body number {i} with filler words")
             for i in range(3)]
    docs = _docs(spark, rows)
    out = textstats.frequent_span_audit(docs, n=5, top_k=10).collect()
    by_rank = sorted(out, key=lambda r: r.rnk)
    # all 3 grams of the repeated span tie at 5 occurrences; the
    # tie-break is gram ASC, so the alphabetically-first wins rank 1
    assert by_rank[0].gram == "brown fox jumps over it"
    assert {r.gram for r in by_rank[:3]} == {
        "the quick brown fox jumps",
        "quick brown fox jumps over",
        "brown fox jumps over it",
    }
    assert by_rank[0].n_occurrences == 5 and by_rank[0].n_docs == 5
    for r in out:
        assert r.n_docs <= r.n_occurrences
    # total order: ranks are 1..k without gaps
    assert [r.rnk for r in by_rank] == list(range(1, len(out) + 1))
