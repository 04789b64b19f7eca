"""Hashed linear quality classifier: Python differential + edges."""

from __future__ import annotations

import hashlib
import re

from mrgo_spark.operators import textstats
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _py_score(text: str) -> tuple[int, int]:
    """(n_tokens, score) replay of the declared contract."""
    w = textstats.classifier_weights()
    toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
    s = textstats.classifier_bias()
    for t in toks:
        idx = int(hashlib.md5(t.encode()).hexdigest()[:4], 16) % textstats.CLF_DIM
        s += w[idx]
    return len(toks), s


def test_scores_match_python_replay_on_fixture(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r.doc_id: r
        for r in textstats.classifier_quality_scores(docs).collect()
    }
    raw = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    assert set(got) == set(raw)
    for doc_id, text in raw.items():
        n, s = _py_score(text)
        r = got[doc_id]
        assert (r.n_tokens, r.score) == (n, s), doc_id
        assert r.margin == abs(s)
        assert r.label == ("keep" if s >= 0 else "toss")
        if n > 0:
            # truncation toward zero — NOT floor — for negative scores
            want = abs(1000 * s) // n * (1 if s >= 0 else -1)
            assert r.score_per_token_milli == want
        else:
            assert r.score_per_token_milli is None


def test_empty_and_nonletter_docs_keep_rows(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "12345 !!!"), (3, "the of and")],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r for r in textstats.classifier_quality_scores(df).collect()
    }
    bias = textstats.classifier_bias()
    assert set(rows) == {1, 2, 3}
    for d in (1, 2):
        assert rows[d].n_tokens == 0
        assert rows[d].score == bias
        assert rows[d].score_per_token_milli is None
    assert rows[3].n_tokens == 3


def test_audit_consistent_with_scores(spark):
    docs = load_table(spark, SF, "documents")
    scores = textstats.classifier_quality_scores(docs).collect()
    audit = {
        r.label: r for r in textstats.classifier_quality_audit(docs).collect()
    }
    for label in audit:
        mine = [r for r in scores if r.label == label]
        a = audit[label]
        assert a.n_docs == len(mine)
        assert a.sum_score == sum(r.score for r in mine)
        assert a.min_score == min(r.score for r in mine)
        assert a.max_score == max(r.score for r in mine)
    assert sum(a.n_docs for a in audit.values()) == len(scores)


def test_weights_deterministic_and_bounded():
    w = textstats.classifier_weights()
    assert w == textstats.classifier_weights()
    assert len(w) == textstats.CLF_DIM
    assert all(abs(x) <= textstats.CLF_WEIGHT_SPAN for x in w)
    # both signs present — the filter actually separates
    assert any(x > 0 for x in w) and any(x < 0 for x in w)
