"""Unigram-LM tokenizer training (r13, VERDICT_r12 #6) — the third
leg next to the DuckDB oracle: a pure-Python replay of the whole
training loop (tokenize, substring seeding, enumerated-Viterbi
segmentation with the exact argmax order, chars-kept prune, half-bit
bit_length rescore) plus behavioral pins.
"""

from __future__ import annotations

import re
from functools import lru_cache

from pyspark.sql import functions as F

from mrgo_spark.operators import textstats
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ---- pure-Python model ------------------------------------------------


def _py_words(texts):
    freq: dict[str, int] = {}
    for t in texts:
        for w in re.split(r"[^a-z]+", t.lower()):
            if w:
                w = w[: textstats.UNI_MAXW]
                freq[w] = freq.get(w, 0) + 1
    return freq


def _py_seed(words):
    cnt: dict[str, int] = {}
    for w, f in words.items():
        n = len(w)
        for i in range(n):
            for ln in range(1, textstats.UNI_MAXP + 1):
                if i + ln <= n:
                    p = w[i : i + ln]
                    cnt[p] = cnt.get(p, 0) + f
    return cnt


def _py_segment(w, scores):
    @lru_cache(maxsize=None)
    def paths(pos):
        if pos == 0:
            return [(0, 0, "")]
        out = []
        for ln in range(1, textstats.UNI_MAXP + 1):
            j = pos - ln
            if j < 0:
                continue
            p = w[j:pos]
            if p not in scores:
                continue
            for sc, np, path in paths(j):
                out.append((sc + scores[p], np + 1, path + " " + p))
        return out

    cands = paths(len(w))
    best = min(cands, key=lambda t: (-t[0], t[1], t[2]))
    return best  # (sc, np, ' '-led path)


def _py_learn(texts):
    words = _py_words(texts)
    seed = _py_seed(words)
    chars = sorted(p for p in seed if len(p) == 1)

    def prune(counts, keep):
        multi = sorted(
            ((p, c) for p, c in counts.items() if len(p) > 1),
            key=lambda pc: (-pc[1], pc[0]),
        )[:keep]
        out = {p: counts.get(p, 0) for p in chars}
        out.update(dict(multi))
        return out

    def rescore(vocab):
        t = sum(vocab.values())
        return {p: textstats._uni_score(c, t) for p, c in vocab.items()}

    vocab = prune(seed, textstats.UNI_SEED_MULTI)
    scores = rescore(vocab)
    segs = None
    for keep in textstats.UNI_KEEP:
        counts: dict[str, int] = {}
        segs = {}
        for w, f in words.items():
            sc, np, path = _py_segment(w, scores)
            segs[w] = (np, path[1:])
            for p in path[1:].split(" "):
                counts[p] = counts.get(p, 0) + f
        vocab = prune(counts, keep)
        scores = rescore(vocab)
    # final segmentation under the trained scores (application)
    final_segs = {
        w: _py_segment(w, scores)[1:] for w in words
    }  # w -> (np, path)
    return words, vocab, scores, final_segs


def _texts(spark):
    return [
        r.text
        for r in load_table(spark, SF, "documents")
        .select("text")
        .collect()
    ]


def test_unigram_learn_matches_python_replay(spark):
    docs = load_table(spark, SF, "documents")
    vocab, scores, _ = textstats.unigram_learn(docs)
    _, pv, ps, _ = _py_learn(_texts(spark))
    assert vocab == pv
    assert scores == ps


def test_unigram_train_vocab_table(spark):
    docs = load_table(spark, SF, "documents")
    got = {
        r.piece: (r.piece_len, r.cnt, r.score_qbits)
        for r in textstats.unigram_train_vocab(docs).collect()
    }
    _, pv, ps, _ = _py_learn(_texts(spark))
    want = {p: (len(p), c, ps[p]) for p, c in pv.items()}
    assert got == want
    # every single char of the corpus survives (segmentability)
    chars = {p for p in got if len(p) == 1}
    corpus_chars = set()
    for t in _texts(spark):
        for w in re.split(r"[^a-z]+", t.lower()):
            corpus_chars |= set(w[: textstats.UNI_MAXW])
    assert chars == corpus_chars


def test_unigram_doc_token_counts_matches_python(spark):
    docs = load_table(spark, SF, "documents")
    vocab, scores, words = textstats.unigram_learn(docs)
    got = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in textstats.unigram_doc_token_counts(
            docs, scores, words
        ).collect()
    }
    _, _, ps, final_segs = _py_learn(_texts(spark))
    want: dict[int, tuple[int, int]] = {}
    for r in docs.select("doc_id", "text").collect():
        nw = nt = 0
        for w in re.split(r"[^a-z]+", r.text.lower()):
            if w:
                w = w[: textstats.UNI_MAXW]
                nw += 1
                nt += final_segs[w][0]
        if nw:
            want[r.doc_id] = (nw, nt)
    assert got == want


def test_unigram_segmentation_prefers_frequent_long_pieces(spark):
    """The Viterbi order: a high-probability multi-char piece beats
    spelling it out char-by-char; ties break toward FEWER pieces then
    lexicographically smallest path."""
    scores = {"a": 3, "b": 5, "c": 4, "ab": 9, "ca": 8, "bc": 1}
    df = spark.createDataFrame([("abcab",)], "w string")
    row = (
        df.select(F.expr(textstats._uni_best_expr(scores)).alias("b"))
        .select("b")
        .select(
            F.col("b.sc").alias("sc"),
            F.col("b.np").alias("np"),
            F.expr("substr(b.path, 2)").alias("path"),
        )
        .collect()[0]
    )
    # 'ab c ab' and 'ab ca b' both score 22 with 3 pieces;
    # path asc picks 'ab c ab'
    assert (row.sc, row.np, row.path) == (22, 3, "ab c ab")


def test_unigram_score_quantization_portable():
    """_uni_score == the DuckDB bin()/HUGEINT form by construction:
    spot-check the edges (zero count clamps to 1 bit; monotone in c)."""
    assert textstats._uni_score(0, 100) == 1
    assert textstats._uni_score(100, 100) == textstats.UNI_SHIFT + 1
    prev = 0
    for c in (1, 2, 5, 17, 50, 99):
        s = textstats._uni_score(c, 100)
        assert s >= prev
        prev = s


def test_unigram_fertility_consistent_with_doc_counts(spark):
    """The language rollup must agree with the per-doc application
    totals (same kernel re-aggregated) and with the raw word count;
    fertility is NULL only for zero-word languages."""
    docs = load_table(spark, SF, "documents").select(
        "doc_id", "lang", "text"
    )
    vocab, scores, words = textstats.unigram_learn(docs)
    fert = {
        r.lang: r
        for r in textstats.unigram_fertility_by_lang(
            docs, scores, words
        ).collect()
    }
    per_doc = textstats.unigram_doc_token_counts(docs, scores, words)
    lang_of = {
        r.doc_id: r.lang for r in docs.select("doc_id", "lang").collect()
    }
    want: dict[str, list[int]] = {}
    for r in per_doc.collect():
        t = want.setdefault(lang_of[r.doc_id], [0, 0])
        t[0] += r.n_words
        t[1] += r.n_tokens
    for lang, (nw, nt) in want.items():
        f = fert[lang]
        assert (f.n_words, f.n_tokens) == (nw, nt)
        assert f.fertility_milli == (1000 * nt) // nw
    assert sum(r.n_docs for r in fert.values()) == docs.count()
