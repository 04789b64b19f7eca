"""Exact-substring dedup (Lee et al. 2021 re-expressed as rolling
k-token grams) — planted-span, policy, plan-shape, and differential
tests.

Reference parity note: the reference engine has no exact-substring
analog (pure extension per the training-pipeline mandate); semantics
follow the published algorithm's "mark every duplicated span of
length >= k" contract, with the conservative remove-all-occurrences
scrub policy.
"""

from __future__ import annotations

import hashlib
import re as _re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrgo_spark.operators import dedup
from mrgo_spark.sources.tables import load_table

K = dedup.EXSUB_K


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------- python model

def _py_tokens(text: str) -> list[str]:
    return [t for t in _re.split(r"[^a-z]+", text.lower()) if t]


def _py_spans(corpus: dict[int, str], k: int) -> dict[int, list[tuple]]:
    """Pure-Python reference for exact_substring_spans: doc_id ->
    sorted [(span_start, span_end, span_len)]."""
    toks = {d: _py_tokens(t) for d, t in corpus.items()}
    grams: list[tuple[int, int, int]] = []
    cnt: Counter = Counter()
    for d, tl in toks.items():
        for j in range(len(tl) - k + 1):
            g = " ".join(tl[j : j + k])
            h = int(hashlib.md5(g.encode()).hexdigest()[:12], 16)
            grams.append((d, j + 1, h))
            cnt[h] += 1
    dup = {h for h, c in cnt.items() if c >= 2}
    hits: dict[int, list[int]] = {}
    for d, p, h in grams:
        if h in dup:
            hits.setdefault(d, []).append(p)
    out: dict[int, list[tuple]] = {}
    for d, ps in hits.items():
        ps.sort()
        spans = []
        start, last = ps[0], ps[0]
        for p in ps[1:]:
            if p - last > k:
                spans.append((start, last + k - 1, last + k - start))
                start = p
            last = p
        spans.append((start, last + k - 1, last + k - start))
        out[d] = spans
    return out


def _spark_spans(spark, corpus: dict[int, str], k: int):
    rows = dedup.exact_substring_spans(
        _mkdocs(spark, sorted(corpus.items())), k=k
    ).collect()
    out: dict[int, list[tuple]] = {}
    for r in sorted(rows, key=lambda r: (r["doc_id"], r["span_start"])):
        out.setdefault(r["doc_id"], []).append(
            (r["span_start"], r["span_end"], r["span_len"])
        )
    return out


# unique filler vocabulary (letters only — digits split under the
# ASCII tokenizer) so filler never extends a planted gram match
def _filler(tag: str, n: int) -> str:
    return " ".join(f"{tag}{chr(ord('a') + i % 26)}{chr(ord('a') + i // 26)}" for i in range(n))


PASSAGE = " ".join(f"shared{c}" for c in "abcdefghijklmno")  # 15 tokens


def test_cross_doc_planted_span(spark):
    corpus = {
        1: _filler("qa", 7) + " " + PASSAGE + " " + _filler("qb", 5),
        2: _filler("qc", 3) + " " + PASSAGE + " " + _filler("qd", 9),
        3: _filler("qe", 30),
    }
    got = _spark_spans(spark, corpus, K)
    # doc 1: passage occupies tokens 8..22; doc 2: tokens 4..18
    assert got == {1: [(8, 22, 15)], 2: [(4, 18, 15)]}


def test_within_doc_repetition(spark):
    phrase = " ".join(f"rep{c}" for c in "abcdefghijkl")  # 12 tokens
    corpus = {1: phrase + " " + _filler("zz", 20) + " " + phrase}
    got = _spark_spans(spark, corpus, K)
    # both occurrences marked: tokens 1..12 and 33..44
    assert got == {1: [(1, 12, 12), (33, 44, 12)]}


def test_short_docs_and_audit_consistency(spark):
    corpus = {
        1: PASSAGE + " " + _filler("ua", 6),
        2: _filler("ub", 4) + " " + PASSAGE,
        3: "tiny doc below the gram size",  # 6 tokens < K
        4: "",
    }
    df = _mkdocs(spark, sorted(corpus.items()))
    audit = {r["doc_id"]: r for r in dedup.exact_substring_audit(df, k=K).collect()}
    assert set(audit) == {1, 2, 3, 4}
    assert audit[3]["n_spans"] == 0 and audit[3]["dup_tokens"] == 0
    assert audit[3]["n_tokens"] == 6
    assert audit[4]["n_tokens"] == 0
    for d in (1, 2):
        assert audit[d]["n_spans"] == 1
        assert audit[d]["dup_tokens"] == 15
        assert audit[d]["n_tokens"] == len(_py_tokens(corpus[d]))


def test_scrub_policy_and_reassembly(spark):
    corpus = {
        1: _filler("qa", 7) + " " + PASSAGE + " " + _filler("qb", 5),
        2: _filler("qc", 3) + " " + PASSAGE + " " + _filler("qd", 9),
        3: "tiny doc below the gram size",
    }
    df = _mkdocs(spark, sorted(corpus.items()))
    got = {r["doc_id"]: r for r in dedup.exact_substring_scrub(df, k=K).collect()}
    # all occurrences of the passage removed, filler kept in order
    assert got[1]["scrub_text"] == _filler("qa", 7) + " " + _filler("qb", 5)
    assert got[2]["scrub_text"] == _filler("qc", 3) + " " + _filler("qd", 9)
    assert got[1]["kept_tokens"] == 12 and got[1]["n_tokens"] == 27
    # sub-k docs scrub to their (canon) selves
    assert got[3]["scrub_text"] == "tiny doc below the gram size"
    assert got[3]["kept_tokens"] == got[3]["n_tokens"] == 6


def test_spans_on_fixture_nonempty(spark, sf_dir):
    # the sf0.001 fixture has planted shared passages; the audit's
    # dup_tokens must equal the per-doc sum of span lengths
    docs = load_table(spark, sf_dir, "documents")
    spans = dedup.exact_substring_spans(docs, k=K).collect()
    audit = dedup.exact_substring_audit(docs, k=K).collect()
    by_doc: dict[int, int] = {}
    for r in spans:
        assert r["span_len"] == r["span_end"] - r["span_start"] + 1 >= K
        by_doc[r["doc_id"]] = by_doc.get(r["doc_id"], 0) + r["span_len"]
    for r in audit:
        assert by_doc.get(r["doc_id"], 0) == r["dup_tokens"]
        assert r["dup_tokens"] <= r["n_tokens"]


def test_explode_is_checkpoint_barriered(spark, sf_dir):
    # Generate-pushdown hazard guard (same class as winnowing): the
    # gram-hash transform must be severed from the explode by a
    # checkpoint scan, or the pushed size() predicate re-evaluates the
    # O(k) slice-and-hash chain per element.
    docs = load_table(spark, sf_dir, "documents").limit(10)
    for df in (
        dedup.exact_substring_spans(docs, k=K),
        dedup.exact_substring_scrub(docs, k=K),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "ExistingRDD" in plan, plan[:2000]


# ---------------------------------------------------- differential leg

_vocab = [f"w{c}" for c in "abcdef"]
_corpora = st.lists(
    st.lists(st.sampled_from(_vocab), max_size=24),
    min_size=1,
    max_size=6,
)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(_corpora, st.integers(min_value=2, max_value=4))
def test_spans_match_python_model(spark, token_lists, k):
    # tiny vocab + short k forces heavy real duplication, exercising
    # merge chains and within-doc repeats
    corpus = {i: " ".join(tl) for i, tl in enumerate(token_lists)}
    assert _spark_spans(spark, corpus, k) == _py_spans(corpus, k)
