"""BPE merge training (Sennrich et al. ACL 2016) — semantics,
merge-application, and pure-Python differential tests.

Reference parity note: the reference engine has no tokenizer-training
analog (pure extension per the training-pipeline mandate); semantics
follow the published algorithm with the (count DESC, left, right)
argmax tie-break and literal left-to-right merge application.
"""

from __future__ import annotations

import re as _re
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrgo_spark.operators import textstats
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _mkdocs(spark, texts):
    return spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )


# ---------------------------------------------------- python model

def _merge_seq(parts: list[str], a: str, b: str) -> list[str]:
    """Greedy left-to-right non-overlapping token-list merge — the
    published algorithm's application step (what re.sub with
    lookarounds does in the original implementation)."""
    out, i = [], 0
    while i < len(parts):
        if i + 1 < len(parts) and parts[i] == a and parts[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(parts[i])
            i += 1
    return out


def _py_bpe(texts: list[str], rounds: int):
    words = Counter()
    for t in texts:
        for w in _re.split(r"[^a-z]+", t.lower()):
            if w:
                words[w] += 1
    syms = {w: list(w) for w in words}
    merges = []
    for r in range(1, rounds + 1):
        cnt: Counter = Counter()
        for w, freq in words.items():
            for a, b in zip(syms[w], syms[w][1:]):
                cnt[(a, b)] += freq
        if not cnt:
            break
        best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        (a, b), c = best
        merges.append((r, a, b, c))
        for w in syms:
            syms[w] = _merge_seq(syms[w], a, b)
    vocab: Counter = Counter()
    for w, freq in words.items():
        for t in syms[w]:
            vocab[t] += freq
    return merges, dict(vocab)


def test_bpe_textbook_example(spark):
    # the classic low/lower/newest/widest-style corpus: "es" then
    # "est" (or the tie-break equivalent) must emerge as early merges
    df = _mkdocs(
        spark,
        ["low low low lowest lowest newest newest newest widest widest"],
    )
    merges = textstats.bpe_train_merges(df, rounds=4).collect()
    got = [(r.merge_round, r.left_sym, r.right_sym, r.pair_count) for r in merges]
    want, _ = _py_bpe(
        ["low low low lowest lowest newest newest newest widest widest"], 4
    )
    assert got == want
    # "e s" is the most frequent first pair (est words: 7 occurrences)
    assert (got[0][1], got[0][2]) == ("e", "s")
    assert got[1][1] == "es" and got[1][2] == "t"


def test_bpe_overlap_merge_left_to_right(spark):
    # "aaaa" with merge (a,a): left-to-right non-overlap gives
    # "aa aa", never "a aa a"; vocabulary must reflect that
    df = _mkdocs(spark, ["aaaa aaaa aaaa b"])
    vocab = {
        r.token: r.freq
        for r in textstats.bpe_vocab_tokens(df, rounds=1).collect()
    }
    assert vocab["aa"] == 6  # 2 per word x 3
    assert "a" not in vocab


def test_bpe_no_cross_boundary_merge(spark):
    # regression (review finding): after round 1 merges (b,a), the
    # word "bab" is symbols [ba, b]; round 2's merge (a,b) must NOT
    # fuse them — "ba b" contains the surface string "a b" but not
    # the symbol pair (a, b). The double-space encoding delimits full
    # tokens, so the literal replace cannot match across boundaries.
    texts = ["ba ba ba bab ab ab"]
    df = _mkdocs(spark, texts)
    got_m = [
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in textstats.bpe_train_merges(df, rounds=2).collect()
    ]
    got_v = {
        r.token: r.freq
        for r in textstats.bpe_vocab_tokens(df, rounds=2).collect()
    }
    want_m, want_v = _py_bpe(texts, 2)
    assert got_m == want_m
    assert got_v == want_v
    assert got_v.get("bab", 0) == 0  # (ba,b) was never learned
    assert got_v["ba"] == 4  # 3x "ba" + the prefix of "bab"


def test_bpe_adjacent_merges_chain(spark):
    # regression: [a,b,a,b] with merge (a,b) must become [ab, ab] —
    # the single-space replace consumed the shared separator and left
    # "ab a b"; the double-space encoding chains correctly
    df = _mkdocs(spark, ["abab abab xy"])
    vocab = {
        r.token: r.freq
        for r in textstats.bpe_vocab_tokens(df, rounds=1).collect()
    }
    assert vocab["ab"] == 4
    assert "a" not in vocab and "b" not in vocab


def test_bpe_merge_exhaustion_keeps_vocab(spark):
    # regression (review finding): when every word is fully merged
    # before the round budget is spent, later rounds are no-ops on
    # BOTH engines — the oracle's LEFT JOIN against the empty merge
    # row must not empty the word table
    texts = ["ab ab ab cd cd"]
    df = _mkdocs(spark, texts)
    merges = textstats.bpe_train_merges(df, rounds=6).collect()
    assert len(merges) == 2  # (a,b) then (c,d); nothing left after
    vocab = {
        r.token: r.freq
        for r in textstats.bpe_vocab_tokens(df, rounds=6).collect()
    }
    assert vocab == {"ab": 3, "cd": 2}


def test_bpe_fixture_vocab_conserves_mass(spark):
    # total symbol chars after merges == total word chars (merges
    # never drop characters), and every merge count is positive
    docs = load_table(spark, SF, "documents")
    merges = textstats.bpe_train_merges(docs).collect()
    assert len(merges) == textstats.BPE_ROUNDS
    assert all(r.pair_count > 0 for r in merges)
    rounds = [r.merge_round for r in merges]
    assert rounds == sorted(rounds)
    vocab = textstats.bpe_vocab_tokens(docs).collect()
    char_mass = sum(len(r.token) * r.freq for r in vocab)
    toks = [
        w
        for r in docs.collect()
        for w in _re.split(r"[^a-z]+", r.text.lower())
        if w
    ]
    assert char_mass == sum(len(w) for w in toks)


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=30),
        min_size=1,
        max_size=4,
    ),
    st.integers(min_value=1, max_value=4),
)
def test_bpe_matches_python_model(spark, texts, rounds):
    # two-letter alphabet forces heavy pair collisions, overlap runs
    # ("aaaa"), and tie-breaks
    if not any(_re.findall(r"[a-z]", t) for t in texts):
        return
    df = _mkdocs(spark, texts)
    got_m = [
        (r.merge_round, r.left_sym, r.right_sym, r.pair_count)
        for r in textstats.bpe_train_merges(df, rounds=rounds).collect()
    ]
    got_v = {
        r.token: r.freq
        for r in textstats.bpe_vocab_tokens(df, rounds=rounds).collect()
    }
    want_m, want_v = _py_bpe(texts, rounds)
    assert got_m == want_m
    assert got_v == want_v


def test_bpe_doc_token_counts_vocab_identity(spark):
    # Σ_doc n_tokens must equal Σ_word freq · tokens(word): the
    # per-doc application is a redistribution of the vocab-level
    # token mass (every corpus word is in the trained vocab by
    # construction)
    from pyspark.sql import functions as F

    docs = load_table(spark, SF, "documents")
    _, words = textstats.bpe_learn(docs, rounds=3)
    per_doc = textstats.bpe_doc_token_counts(docs, words)
    got = per_doc.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w")
    ).collect()[0]
    want = words.select(
        F.sum(F.col("freq") * F.size(F.split("sym", "  "))).alias("t"),
        F.sum("freq").alias("w"),
    ).collect()[0]
    assert (got.t, got.w) == (want.t, want.w)
    # merges only ever shrink a word's token count; never below 1/word
    rows = per_doc.collect()
    assert all(r.n_words <= r.n_tokens for r in rows)
