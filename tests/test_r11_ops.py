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
