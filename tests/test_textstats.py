"""Text-analysis operators: unicode variant + fingerprints."""

from __future__ import annotations

from mrgo_spark.functions.text import ascii_tokens, unicode_tokens
from mrgo_spark.operators import textstats


def test_unicode_tokens_keep_nonascii_letters(spark):
    df = spark.createDataFrame([("Müller straße 42 北京 word",)], "text string")
    uni = df.select(unicode_tokens("text").alias("t")).collect()[0].t
    asc = df.select(ascii_tokens("text").alias("t")).collect()[0].t
    assert "Müller" in uni and "straße" in uni and "北京" in uni
    # the ASCII (oracle-declared) variant splits on non-ASCII letters
    assert "M" in asc and "ller" in asc and "北京" not in asc


def test_doc_fingerprint_is_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fps = {r.doc_id: r.fp for r in textstats.doc_fingerprint(df).collect()}
    assert fps[1] == fps[3]  # identical content
    assert fps[1] != fps[2]  # reordered content differs (rolling hash)
    assert all(0 <= v < (1 << 31) - 1 for v in fps.values())


def test_bpe_ish_token_count_monotone(spark):
    df = spark.createDataFrame(
        [(1, "hi"), (2, "hi there"), (3, "hi there, extraordinarily!")],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r.n
        for r in df.select(
            "doc_id", textstats.bpe_ish_token_count("text").alias("n")
        ).collect()
    }
    assert out[1] < out[2] < out[3]
    # 'extraordinarily' (15 letters) counts as ceil(15/4)=4 pieces
    assert out[3] - out[2] >= 4


def test_lang_id_on_real_markers(spark):
    df = spark.createDataFrame(
        [
            (1, "the cat and the dog of the house"),
            (2, "der hund und die katze ist nicht da"),
            (3, "el perro y la casa es que los gatos"),
            (4, "zz qq xx"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.pred_lang for r in textstats.lang_id(df).collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "es"
    assert out[4] == "und"


def test_gopher_audit_rules(spark):
    from mrgo_spark.operators.textstats import gopher_audit

    filler = " ".join(["plain"] * 60)
    docs = spark.createDataFrame(
        [
            # 0: passes everything (50+ words, stopwords, letters)
            (0, "the cat sat with the dog and that bird of prey be quick to "
                + " ".join(["word"] * 50)),
            # 1: too short and no required stopwords
            (1, "tiny doc"),
            # 2: symbol-heavy (### and ...), enough words otherwise
            (2, "### " * 30 + "... " * 30 + filler),
            # 3: numeric words drag alpha fraction under 0.8
            (3, " ".join(["123"] * 40) + " " + filler),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in gopher_audit(docs).collect()}
    assert out[0].pass_all == 1
    assert out[0].n_stop_distinct >= 2
    assert out[1].pass_all == 0 and out[1].n_words == 2
    assert out[2].pass_all == 0 and out[2].symbol_word_ratio > 0.1
    # 30 '###' contribute 90 hashes; 30 '...' contribute 30 ellipses
    assert out[2].n_words == 120
    assert abs(out[2].symbol_word_ratio - (90 + 30) / 120) < 1e-12
    assert out[3].pass_all == 0 and out[3].alpha_word_frac < 0.8


def test_bigram_novelty_identities(spark):
    # familiarity_sum >= n_bigrams (every count >= 1); singletons
    # contribute exactly 1 each; a doc duplicated verbatim has zero
    # singletons and its familiarity doubles the original's bigram
    # overlap structure
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dog"),
            (3, "zxqv wkjh qpzm unique garble here"),
            (4, "x"),  # single token -> no bigrams -> dropped
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textstats.bigram_novelty_stats(docs).collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert r.familiarity_sum >= r.n_bigrams
        assert 0 <= r.singleton_bigrams <= r.n_bigrams
    # docs 1 and 2 are verbatim copies: every bigram occurs >= 2x
    assert rows[1].singleton_bigrams == 0
    assert rows[2].singleton_bigrams == 0
    assert rows[1].n_bigrams == 8 and rows[1].familiarity_sum == 16
    # doc 3's bigrams are corpus-unique
    assert rows[3].singleton_bigrams == rows[3].n_bigrams == 5
    assert rows[3].familiarity_sum == 5


def test_bigram_lm_bits_matches_pure_python_model(spark):
    """Full-row differential: train the add-one bigram LM and score
    every fixture doc in pure Python (integer floor-log2 via
    bit_length), compare against the Spark frame exactly."""
    import re

    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = [(r.doc_id, r.text) for r in docs.select("doc_id", "text").collect()]
    toks = {
        d: [w for w in re.split(r"[^a-z]+", t.lower()) if w] for d, t in rows
    }
    cb, ca, vocab = {}, {}, set()
    grams = {}
    for d, t in toks.items():
        vocab.update(t)
        grams[d] = [(t[i], t[i + 1]) for i in range(len(t) - 1)]
        for a, b in grams[d]:
            cb[(a, b)] = cb.get((a, b), 0) + 1
            ca[a] = ca.get(a, 0) + 1
    v = len(vocab)
    FP = textstats.LM_FP_BITS

    def bits(a, b):
        ratio = max(((cb[(a, b)] + 1) << FP) // (ca[a] + v), 1)
        return ratio.bit_length() - 1 - FP

    expect = {}
    for d, g in grams.items():
        if not g:
            continue
        s = sum(bits(a, b) for a, b in g)
        expect[d] = (len(g), s, (-s * 100) // len(g))
    got = {
        r.doc_id: (r.n_grams, r.lm_bits, r.centibits_per_gram)
        for r in textstats.bigram_lm_bits(docs).collect()
    }
    assert got == expect


def test_bigram_lm_bits_monotone_in_probability(spark):
    """A document made of the corpus' most common bigram repeated must
    score FEWER centibits/gram (more predictable) than one made of a
    corpus-unique bigram — the CCNet keep-side ordering."""
    base = [(i, "alpha beta " * 5) for i in range(20)]
    probe = [(100, "alpha beta " * 5), (101, "zzz qqq")]
    df = spark.createDataFrame(base + probe, "doc_id long, text string")
    out = {r.doc_id: r.centibits_per_gram for r in textstats.bigram_lm_bits(df).collect()}
    assert out[100] < out[101]


def test_perplexity_terciles_shares_and_threshold_minimality(spark):
    """Each bucket holds ≥ its exact tercile share minus tie mass:
    head is the SMALLEST prefix of the centibits order reaching n/3
    (threshold minimality), buckets partition the corpus, and the
    bucket order respects the score order."""
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = textstats.perplexity_terciles(docs).collect()
    n = len(out)
    assert n > 0
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.ppl_bucket, []).append(r.centibits_per_gram)
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) < min(by_bucket["middle"])
    assert max(by_bucket["middle"]) < min(by_bucket["tail"])
    # python replay of threshold minimality over the exact histogram
    vals = sorted(r.centibits_per_gram for r in out)
    t1 = vals[(n + 2) // 3 - 1]  # smallest v with cum*3 >= n
    head = [v for v in vals if v <= t1]
    assert sorted(by_bucket["head"]) == head
    # head reaches its share (ties may overshoot, never undershoot)
    assert 3 * len(by_bucket["head"]) >= n


def test_perplexity_terciles_runs_lm_once(spark):
    """The score frame feeds two consumers; the checkpoint must pin
    the LM subtree to ONE run (ExistingRDD replay in the plan)."""
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    plan = (
        textstats.perplexity_terciles(docs)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "ExistingRDD" in plan


def test_compression_ratio_matches_zlib_and_orders_noise(spark):
    """Differential vs in-process zlib, plus the quality-signal
    ordering: a pathologically repetitive doc compresses far better
    than natural fixture text."""
    import zlib

    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    rows = {r.doc_id: r.text for r in docs.select("doc_id", "text").collect()}
    got = {
        r.doc_id: (r.n_bytes, r.n_deflate, r.ratio_milli)
        for r in textstats.compression_ratio_stats(docs).collect()
    }
    for d, text in rows.items():
        raw = text.encode("utf-8")
        comp = len(zlib.compress(raw, 6))
        want = (len(raw), comp, (1000 * comp) // len(raw) if raw else None)
        assert got[d] == want, d
    boiler = spark.createDataFrame(
        [(1, "spam " * 400), (2, rows[next(iter(rows))])],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.ratio_milli for r in textstats.compression_ratio_stats(boiler).collect()}
    assert out[1] < out[2]


def test_ngram_precision_eval_replay_and_pins(spark):
    """Pure-Python replay of the clipped n-gram precision; identity
    pairs score exactly SCALE; empty candidates score 0 with rows
    still present."""
    import re

    from mrgo_spark.operators.textstats import (
        NGRAM_PREC_SCALE,
        ngram_precision_eval,
    )

    rows = [
        (1, "the cat sat on the mat", "the cat sat on the mat"),   # identity
        (2, "the the the cat", "the cat"),                         # clipping
        (3, "alpha beta gamma", "delta epsilon"),                  # no overlap
        (4, "", "some reference text"),                            # empty cand
        (5, "one token", ""),                                      # empty ref
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id long, cand_text string, ref_text string"
    )
    got = {
        (r.pair_id, r.n): (r.matched, r.total, r.precision_fp)
        for r in ngram_precision_eval(pairs, max_n=2).collect()
    }
    assert len(got) == 10  # every pair x n present, empties included

    def toks(s):
        return [w for w in re.split(r"[^a-z]+", s.lower()) if w]

    def grams(ts, n):
        return [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]

    for pid, cand, ref in rows:
        for n in (1, 2):
            cg, rg = grams(toks(cand), n), grams(toks(ref), n)
            cnt_c, cnt_r = {}, {}
            for g in cg:
                cnt_c[g] = cnt_c.get(g, 0) + 1
            for g in rg:
                cnt_r[g] = cnt_r.get(g, 0) + 1
            matched = sum(min(c, cnt_r.get(g, 0)) for g, c in cnt_c.items())
            total = len(cg)
            fp = (NGRAM_PREC_SCALE * matched) // total if total else 0
            assert got[(pid, n)] == (matched, total, fp), (pid, n)
    # identity pair pins exactly SCALE at both n
    assert got[(1, 1)][2] == NGRAM_PREC_SCALE
    assert got[(1, 2)][2] == NGRAM_PREC_SCALE
    # clipping: "the the the cat" vs "the cat" -> unigram matched 2/4
    assert got[(2, 1)] == (2, 4, NGRAM_PREC_SCALE // 2)


def test_ngram_diversity_python_replay(spark):
    """ngram_diversity (r9) vs a pure-Python replay on a handcrafted
    corpus: a fully repetitive group scores low, a fully distinct one
    scores 1000; gram-less docs contribute nothing."""
    rows = [
        (1, "rep", "a a a a a"),            # 1-grams: 5 total 1 distinct
        (2, "rep", "a a a"),
        (3, "div", "one two three four"),   # all distinct
        (4, "div", "!!!"),                  # zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    got = {
        (r.lang, r.n): (r.total_ngrams, r.distinct_ngrams, r.diversity_milli)
        for r in textstats.ngram_diversity(df).collect()
    }

    def grams(toks, n):
        return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]

    expected = {}
    for lang in ("rep", "div"):
        for n in (1, 2, 3):
            g = []
            for _, lg, tx in rows:
                if lg == lang:
                    toks = [t for t in
                            "".join(c if c.isalpha() else " "
                                    for c in tx.lower()).split() if t]
                    g += grams(toks, n)
            if g:
                expected[(lang, n)] = (
                    len(g), len(set(g)), 1000 * len(set(g)) // len(g)
                )
    assert got == expected
    assert got[("rep", 1)] == (8, 1, 125)
    assert got[("div", 1)][2] == 1000


def test_classifier_calibration_contracts(spark):
    """Calibration bins (r9): bins tile the clamped score range,
    counts reconcile with the corpus, n_keep <= n_docs, and the
    per-bin keep rate equals a Python replay from the per-doc scorer
    + keep rule (the two building blocks are independently
    oracle-checked; this pins their composition)."""
    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    out = {r.bin_id: r for r in
           textstats.classifier_calibration_bins(docs).collect()}
    assert sum(r.n_docs for r in out.values()) == docs.count()
    for r in out.values():
        assert 0 <= r.bin_id <= 15
        assert r.score_hi - r.score_lo == 255
        assert r.score_lo == -2048 + r.bin_id * 256
        assert 0 <= r.n_keep <= r.n_docs
        assert r.keep_rate_milli == 1000 * r.n_keep // r.n_docs
    scores = {r.doc_id: r.score for r in
              textstats.classifier_quality_scores(docs).collect()}
    import pyspark.sql.functions as F
    keeps = {r.doc_id: bool(r.k) for r in docs.select(
        "doc_id", textstats.quality_keep("text").alias("k")).collect()}
    expect = {}
    for d, s in scores.items():
        b = (max(min(s, 2047), -2048) + 2048) // 256
        n, k = expect.get(b, (0, 0))
        expect[b] = (n + 1, k + (1 if keeps[d] else 0))
    assert {b: (r.n_docs, r.n_keep) for b, r in out.items()} == expect


def test_classifier_calibration_rejects_bad_bins(spark):
    import pytest

    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    with pytest.raises(ValueError, match="divisible"):
        textstats.classifier_calibration_bins(docs, n_bins=7)


def test_min_k_prob_audit_differential_and_membership_signal(spark):
    """Tail math vs a pure-Python replay of the bigram-bits model,
    and the membership signal itself: a doc built ONLY of corpus-
    duplicated phrases scores lower mink_centibits than one with
    rare-token content."""
    from collections import Counter

    from mrgo_spark.operators import textstats

    common = "alpha beta gamma delta"
    rows = [(i, common) for i in range(8)]           # memorized block
    rows.append((100, "alpha beta zzyzx qwfp vexing"))  # rare tail
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in textstats.min_k_prob_audit(docs, k_pct=20).collect()
    }

    # python replay of the exact bits model
    import re

    def toks(s):
        return [w for w in re.split(r"[^a-z]+", s.lower()) if w]

    bg = Counter()
    uni = Counter()
    vocab = set()
    docs_t = {d: toks(t) for d, t in rows}
    for t in docs_t.values():
        vocab.update(t)
        for a, b in zip(t, t[1:]):
            bg[(a, b)] += 1
            uni[a] += 1
    V = len(vocab)
    FP = textstats.LM_FP_BITS

    def bits(a, b):
        r = max(((bg[(a, b)] + 1) << FP) // (uni[a] + V), 1)
        return r.bit_length() - 1 - FP

    for d, t in docs_t.items():
        occ = sorted(bits(a, b) for a, b in zip(t, t[1:]))
        n = len(occ)
        m = max(1, (n * 20) // 100)
        mk = sum(occ[:m])
        r = out[d]
        assert (r.n_grams, r.m_tail, r.min_k_bits) == (n, m, mk), d
        assert r.mink_centibits == (-mk * 100) // m
    assert out[0].mink_centibits < out[100].mink_centibits


def test_brier_calibration_python_replay(spark):
    """r13 Brier bins: exact Σ(p−y)², gap, and reliability replayed
    in pure Python from the per-doc score + keep columns; bins and
    counts reconcile with classifier_calibration_bins."""
    from pyspark.sql import functions as F

    from mrgo_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    per_doc = docs.select(
        textstats.classifier_score_col("text").alias("s"),
        textstats.quality_keep("text").cast("int").alias("y"),
    ).collect()
    bins = {}
    for r in per_doc:
        c = max(min(r.s, 2047), -2048)
        b = (c + 2048) // 256
        p = ((c + 2048) * 1000) // 4096
        t = bins.setdefault(b, [0, 0, 0, 0])
        t[0] += 1
        t[1] += p
        t[2] += r.y
        t[3] += (p - 1000 * r.y) ** 2
    def tdiv(a, b):  # truncating div, the engine semantics
        q = abs(a) // b
        return q if a >= 0 else -q
    want = {
        b: (
            n, sp, ny, br,
            tdiv(sp - 1000 * ny, n),
            ((sp - 1000 * ny) ** 2) // n,
        )
        for b, (n, sp, ny, br) in bins.items()
    }
    got = {
        r.bin_id: (
            r.n_docs, r.sum_p_milli, r.n_keep, r.brier_micro_sum,
            r.gap_milli, r.rel_micro,
        )
        for r in textstats.brier_calibration_bins(docs).collect()
    }
    assert got == want
    # composition pin: bin populations agree with the keep-rate bins
    kr = {r.bin_id: (r.n_docs, r.n_keep) for r in
          textstats.classifier_calibration_bins(docs).collect()}
    assert {b: (v[0], v[2]) for b, v in got.items()} == kr
    # reliability is nonnegative and bounded by the bin's Brier sum
    for v in got.values():
        assert 0 <= v[5] <= v[3]
