"""Round-10 session-3 operators: ngram_f_eval (ROUGE/F1), Cohen's
kappa, Copeland system ranking, reward winsorization, margin-based
bitext mining, k-anonymity audit, kv state diff.

Each deterministic op gets the standard three-legged evidence here:
the DuckDB oracle runs via driver_sim/registry (not in this module),
a pure-Python differential on handcrafted rows, and contract/edge
pins (loud-on-misuse, tie semantics, guard rails)."""

from __future__ import annotations

import math
import re

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from mrgo_spark.operators import kv, mlfit, pipeline, profile, similarity
from mrgo_spark.operators.textstats import (
    NGRAM_PREC_SCALE,
    classifier_score_col,
    ngram_f_eval,
    ngram_precision_eval,
)


def _tdiv(a: int, b: int) -> int:
    """Integer division truncating toward zero — Spark `div` and
    DuckDB `//` semantics (Python's // floors)."""
    q = abs(a) // abs(b)
    return q if (a < 0) == (b < 0) else -q


# --------------------------------------------------------- ngram_f_eval


def _toks(s):
    return [w for w in re.split(r"[^a-z]+", s.lower()) if w]


def _grams(ts, n):
    return [" ".join(ts[i : i + n]) for i in range(len(ts) - n + 1)]


def test_ngram_f_eval_replay_and_pins(spark):
    """Full P/R/F1 replay; identity pairs pin SCALE on all three
    metrics; empty sides zero the right denominators."""
    rows = [
        (1, "the cat sat on the mat", "the cat sat on the mat"),
        (2, "the the the cat", "the cat"),          # clipping, short ref
        (3, "alpha beta gamma", "delta epsilon"),   # no overlap
        (4, "", "some reference text"),             # empty cand
        (5, "one token", ""),                       # empty ref
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id long, cand_text string, ref_text string"
    )
    got = {
        (r.pair_id, r.n): (
            r.matched,
            r.total_cand,
            r.total_ref,
            r.precision_fp,
            r.recall_fp,
            r.f1_fp,
        )
        for r in ngram_f_eval(pairs, max_n=2).collect()
    }
    assert len(got) == 10
    for pid, cand, ref in rows:
        for n in (1, 2):
            cg, rg = _grams(_toks(cand), n), _grams(_toks(ref), n)
            cnt_c, cnt_r = {}, {}
            for g in cg:
                cnt_c[g] = cnt_c.get(g, 0) + 1
            for g in rg:
                cnt_r[g] = cnt_r.get(g, 0) + 1
            m = sum(min(c, cnt_r.get(g, 0)) for g, c in cnt_c.items())
            tc, tr = len(cg), len(rg)
            p = (NGRAM_PREC_SCALE * m) // tc if tc else 0
            r_ = (NGRAM_PREC_SCALE * m) // tr if tr else 0
            f1 = (2 * NGRAM_PREC_SCALE * m) // (tc + tr) if tc + tr else 0
            assert got[(pid, n)] == (m, tc, tr, p, r_, f1), (pid, n)
    # identity pins SCALE everywhere
    for n in (1, 2):
        assert got[(1, n)][3:] == (
            NGRAM_PREC_SCALE,
            NGRAM_PREC_SCALE,
            NGRAM_PREC_SCALE,
        )
    # asymmetry: clipped pair has low precision (2/4) but full recall
    # (2/2) -- the case precision alone cannot see
    assert got[(2, 1)][3] == NGRAM_PREC_SCALE // 2
    assert got[(2, 1)][4] == NGRAM_PREC_SCALE


def test_ngram_precision_projection_parity(spark):
    """ngram_precision_eval (gate-windowed) must stay bit-identical
    through the f_eval refactor: its rows are exactly f_eval's
    (matched, total_cand, precision) projection."""
    rows = [
        (1, "a b c d", "b c d e"),
        (2, "x x x", "x"),
        (3, "", ""),
    ]
    pairs = spark.createDataFrame(
        rows, "pair_id long, cand_text string, ref_text string"
    )
    prec = {
        (r.pair_id, r.n): (r.matched, r.total, r.precision_fp)
        for r in ngram_precision_eval(pairs, max_n=2).collect()
    }
    full = {
        (r.pair_id, r.n): (r.matched, r.total_cand, r.precision_fp)
        for r in ngram_f_eval(pairs, max_n=2).collect()
    }
    assert prec == full


# --------------------------------------------------------------- kappa


def test_cohen_kappa_replay(spark):
    """Replay kappa on handcrafted judge tables: perfect agreement
    pins 1000, independent-looking judges land near 0, systematic
    disagreement goes negative, a constant judge yields NULL."""
    rows = []
    # grp 1: perfect agreement, mixed marginals
    for i in range(10):
        v = i % 2 == 0
        rows.append((1, v, v))
    # grp 2: worse than chance (always opposite), balanced
    for i in range(10):
        v = i % 2 == 0
        rows.append((2, v, not v))
    # grp 3: judge1 constant True, judge2 varying -> kappa exactly 0
    for i in range(6):
        rows.append((3, True, i % 3 == 0))
    # grp 5: BOTH judges constant and unanimous -> undefined (NULL)
    for _ in range(4):
        rows.append((5, True, True))
    # grp 4: partial agreement
    pat = [(True, True)] * 4 + [(True, False)] * 2 + [(False, True)] * 1 + [
        (False, False)
    ] * 3
    rows += [(4, a, b) for a, b in pat]
    df = spark.createDataFrame(rows, "grp long, j1 boolean, j2 boolean")
    got = {
        r.grp: (
            r.n,
            r.n_both_pos,
            r.n_both_neg,
            r.n_j1_only,
            r.n_j2_only,
            r.po_milli,
            r.pe_milli,
            r.kappa_milli,
        )
        for r in mlfit.cohen_kappa_agreement(
            df, "grp", F.col("j1"), F.col("j2")
        ).collect()
    }

    def replay(pairs):
        n = len(pairs)
        a = sum(1 for x, y in pairs if x and y)
        d = sum(1 for x, y in pairs if not x and not y)
        b = sum(1 for x, y in pairs if x and not y)
        c = sum(1 for x, y in pairs if not x and y)
        r1, c1 = a + b, a + c
        pe = r1 * c1 + (n - r1) * (n - c1)
        po = _tdiv(1000 * (a + d), n)
        pem = _tdiv(1000 * pe, n * n)
        kap = (
            None
            if n * n == pe
            else _tdiv(1000 * (n * (a + d) - pe), n * n - pe)
        )
        return (n, a, d, b, c, po, pem, kap)

    by_grp = {}
    for g, x, y in rows:
        by_grp.setdefault(g, []).append((x, y))
    for g, pairs in by_grp.items():
        assert got[g] == replay(pairs), g
    assert got[1][7] == 1000          # perfect agreement
    assert got[2][7] == -1000         # perfect disagreement, balanced
    assert got[3][7] == 0             # one constant judge -> exact 0
    assert 0 < got[4][7] < 1000       # partial agreement
    assert got[5][7] is None          # both constant -> undefined


def test_cohen_kappa_null_judge_raises(spark):
    df = spark.createDataFrame(
        [(1, True, None), (1, False, True)],
        "grp long, j1 boolean, j2 boolean",
    )
    with pytest.raises(Exception, match="non-null"):
        mlfit.cohen_kappa_agreement(
            df, "grp", F.col("j1"), F.col("j2")
        ).collect()


# ------------------------------------------------------------ copeland


def test_copeland_replay_and_invariants(spark):
    """Replay Copeland on a handcrafted tournament; zero-sum law
    (Σ copeland = 0); ties credit neither side; a system missing
    from a prompt simply doesn't compete there."""
    rows = [
        # prompt 1: s0 best, s1 middle, s2 worst
        (1, 0, 30), (1, 0, 10), (1, 1, 20), (1, 2, 5),
        # prompt 2: s0 and s1 tie at their best, s2 wins
        (2, 0, 15), (2, 1, 15), (2, 2, 40),
        # prompt 3: only s0 and s2 compete
        (3, 0, 7), (3, 2, 9),
    ]
    df = spark.createDataFrame(rows, "group_id long, system_id long, r long")
    got = {
        r.system_id: (
            r.n_prompts,
            r.n_comparisons,
            r.wins,
            r.losses,
            r.ties,
            r.copeland,
        )
        for r in pipeline.copeland_system_ranking(
            df, F.col("r")
        ).collect()
    }
    # replay
    best = {}
    for g, s, r in rows:
        best[(g, s)] = max(best.get((g, s), r), r)
    stats = {s: [0, 0, 0, 0] for s in (0, 1, 2)}  # comp, win, loss, tie
    for g in (1, 2, 3):
        systems = sorted(s for (gg, s) in best if gg == g)
        for i, sa in enumerate(systems):
            for sb in systems[i + 1 :]:
                ba, bb = best[(g, sa)], best[(g, sb)]
                for s, mine, other in ((sa, ba, bb), (sb, bb, ba)):
                    stats[s][0] += 1
                    if mine > other:
                        stats[s][1] += 1
                    elif mine < other:
                        stats[s][2] += 1
                    else:
                        stats[s][3] += 1
    n_prompts = {s: len([1 for (g, ss) in best if ss == s]) for s in (0, 1, 2)}
    for s in (0, 1, 2):
        comp, w, l, t = stats[s]
        assert got[s] == (n_prompts[s], comp, w, l, t, w - l), s
    # zero-sum and bookkeeping invariants
    assert sum(v[5] for v in got.values()) == 0
    for v in got.values():
        assert v[2] + v[3] + v[4] == v[1]
    # prompt-2 tie: neither s0 nor s1 got a win from it
    assert got[0][4] >= 1 and got[1][4] >= 1


def test_copeland_null_reward_raises(spark):
    df = spark.createDataFrame(
        [(1, 0, None), (1, 1, 2)], "group_id long, system_id long, r long"
    )
    with pytest.raises(Exception, match="non-null"):
        pipeline.copeland_system_ranking(df, F.col("r")).collect()


# ----------------------------------------------------------- winsorize


def test_reward_winsorize_replay(spark):
    """Replay the sketch cutoffs in Python; every winsorized value
    lands inside [lo_cut, hi_cut]; clip labels match; outliers are
    actually clipped while the bulk passes through."""
    # bulk must span many bucket widths (64) or the p5/p95 edges
    # collapse into one bucket and nothing measurable survives
    vals = list(range(-1000, 1000, 20)) + [-3000, -2500, 3000, 2500, 1900]
    rows = [(i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, r long")
    out = pipeline.reward_winsorize(
        df, F.col("r"), id_col="doc_id", lo_q=5, hi_q=95,
        lo=-2048, hi=2047, width=64,
    ).collect()

    lo, hi, width = -2048, 2047, 64
    clamped = [max(min(v, hi), lo) for v in vals]
    cells = {}
    for v in clamped:
        cells[(v - lo) // width] = cells.get((v - lo) // width, 0) + 1
    n = len(clamped)

    def cut(q):
        target = (q * n + 99) // 100
        cum = 0
        for b in sorted(cells):
            cum += cells[b]
            if cum >= target:
                return b * width + lo
        raise AssertionError("unreachable")

    lo_cut, hi_cut = cut(5), cut(95)
    got = {r.doc_id: r for r in out}
    for i, v in enumerate(vals):
        r = got[i]
        assert (r.lo_cut, r.hi_cut) == (lo_cut, hi_cut)
        cv = max(min(v, hi), lo)
        assert r.reward_fp == cv
        assert r.reward_winsor == max(min(cv, hi_cut), lo_cut)
        assert lo_cut <= r.reward_winsor <= hi_cut
        want_clip = (
            "lo" if cv < lo_cut else "hi" if cv > hi_cut else "none"
        )
        assert r.clip == want_clip, (i, v)
    # the planted outliers really clip, the bulk mostly doesn't
    assert got[len(vals) - 5].clip == "lo"      # -3000
    assert got[len(vals) - 3].clip == "hi"      # 3000
    assert sum(1 for r in out if r.clip == "none") >= int(0.80 * n)


# -------------------------------------------------------- bitext mine


def _rnd(v: float) -> int:
    """Half-away-from-zero like Spark's F.round / DuckDB round."""
    return int(math.copysign(math.floor(abs(v) + 0.5), v))


def test_margin_bitext_mine_replay(spark):
    """Replay the full margin computation (fixed-point dots, floored
    cosines, integer margin) on a handcrafted two-sided corpus with a
    planted exact translation pair: the planted pair must surface
    with cos_fx = 10^6, mutual_best, and the top margin."""
    import random

    rng = random.Random(7)
    dim = 8
    src = {i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(0, 12, 2)}
    tgt = {i: [rng.uniform(-1, 1) for _ in range(dim)] for i in range(1, 13, 2)}
    tgt[1] = list(src[0])  # planted exact translation of query 0
    rows = [(i, v) for i, v in src.items()] + [(i, v) for i, v in tgt.items()]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    queries = emb.filter(F.col("vec_id").isin(0, 4))
    out = {
        r.src_id: r
        for r in similarity.margin_bitext_mine(
            queries,
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            k=3,
        ).collect()
    }

    # float32 quantization first (the fixture column is array<float>)
    import struct

    def f32(x):
        return struct.unpack("f", struct.pack("f", x))[0]

    srcf = {i: [f32(x) for x in v] for i, v in src.items()}
    tgtf = {i: [f32(x) for x in v] for i, v in tgt.items()}

    def cos_fx(a, b):
        dot = sum(_rnd(x * y * 1e6) for x, y in zip(a, b))
        na = math.sqrt(sum(_rnd(x * x * 1e6) for x in a))
        nb = math.sqrt(sum(_rnd(y * y * 1e6) for y in b))
        return math.floor(dot / (na * nb) * 1e6)

    def topk(q, corpus, k):
        scored = sorted(
            ((cos_fx(q, v), -i) for i, v in corpus.items()),
            reverse=True,
        )
        return [(-i, c) for c, i in scored[:k]]

    k = 3
    for qid in (0, 4):
        fwd = topk(srcf[qid], tgtf, k)
        sum_fwd = sum(c for _, c in fwd)
        tid, cfx = fwd[0]
        bwd = topk(tgtf[tid], srcf, k)
        sum_bwd = sum(c for _, c in bwd)
        margin = (
            None
            if sum_fwd + sum_bwd == 0
            else _tdiv(1000 * 2 * k * cfx, sum_fwd + sum_bwd)
        )
        r = out[qid]
        assert (r.tgt_id, r.cos_fx) == (tid, cfx), qid
        assert (r.sum_fwd_fx, r.sum_bwd_fx) == (sum_fwd, sum_bwd), qid
        assert r.margin_milli == margin, qid
        assert r.mutual_best == (bwd[0][0] == qid), qid
    # the planted pair is found, exact, mutual, and above-neighborhood
    # (margin > 1000 == "better than its average neighborhood"; cross-
    # query margin ORDER is not a property the metric guarantees —
    # mining thresholds the margin per pair, it never ranks queries
    # against each other)
    assert out[0].tgt_id == 1
    assert out[0].cos_fx == 1_000_000
    assert out[0].mutual_best
    assert out[0].margin_milli > 1000


# --------------------------------------------------------- k-anonymity


def test_k_anonymity_audit(spark):
    rows = (
        [("US", "A")] * 6          # safe class
        + [("US", "B")] * 2        # at risk
        + [("CA", "A")] * 1        # at risk, singleton
        + [("CA", None)] * 5       # NULL is a class of its own, safe
    )
    df = spark.createDataFrame(rows, "nation string, seg string")
    out = {
        (r.nation, r.seg): (r.n, r.at_risk, r.risk_milli)
        for r in profile.k_anonymity_audit(df, ["nation", "seg"], k=5)
        .collect()
    }
    assert out[("US", "A")] == (6, False, 166)
    assert out[("US", "B")] == (2, True, 500)
    assert out[("CA", "A")] == (1, True, 1000)
    assert out[("CA", None)] == (5, False, 200)
    assert sum(v[0] for v in out.values()) == len(rows)
    with pytest.raises(ValueError, match="non-empty"):
        profile.k_anonymity_audit(df, [], k=5)
    with pytest.raises(ValueError, match=">= 2"):
        profile.k_anonymity_audit(df, ["nation"], k=1)


# ----------------------------------------------------------- kv diff


def test_kv_state_diff_verdicts(spark):
    """Handcrafted snapshots exercise every verdict, including the
    put-shrinks-state case (len_after < len_before is still just
    'changed') and the delete case ('removed')."""
    before = spark.createDataFrame(
        [
            ("a", "xx"),       # unchanged
            ("b", "long-old"), # changed, shrinks
            ("c", "gone"),     # removed
        ],
        "key string, state string",
    )
    after = spark.createDataFrame(
        [
            ("a", "xx"),
            ("b", "y"),
            ("d", "new"),      # added
        ],
        "key string, state string",
    )
    got = {
        r.key: (r.verdict, r.len_before, r.len_after)
        for r in kv.state_diff(before, after).collect()
    }
    assert got == {
        "a": ("unchanged", 2, 2),
        "b": ("changed", 8, 1),
        "c": ("removed", 4, None),
        "d": ("added", None, 3),
    }


def test_kv_state_diff_fold_composition(spark):
    """Diff of two fold_state snapshots of the same log: the midpoint
    snapshot vs head. Every key present at the cut must appear; keys
    whose ops all postdate the cut are 'added'; a key with no ops
    after the cut is 'unchanged'."""
    ops = [
        # (seq, client, reqid, op, key, value)
        (1, 1, 1, "put", "k1", "a"),
        (2, 1, 2, "append", "k1", "b"),
        (3, 1, 3, "put", "k2", "z"),
        # ---- cut at seq <= 3 ----
        (4, 1, 4, "append", "k1", "c"),   # k1 grows -> changed
        (5, 1, 5, "put", "k2", "s"),      # k2 reset -> changed
        (6, 1, 6, "put", "k3", "n"),      # k3 new -> added
    ]
    oplog = spark.createDataFrame(
        ops,
        "seq long, client long, reqid long, op string, key string,"
        " value string",
    )
    before = kv.fold_state(oplog.filter(F.col("seq") <= 3))
    after = kv.fold_state(oplog)
    got = {
        r.key: r.verdict for r in kv.state_diff(before, after).collect()
    }
    assert got == {"k1": "changed", "k2": "changed", "k3": "added"}


# ------------------------------------------------- declared-entry smoke


def test_declared_kappa_group_consistency(spark):
    """The declared kappa entry's cohorts must partition the corpus:
    Σn over cohorts equals the document count, and the confusion
    cells sum to n per cohort."""
    from mrgo_spark.operators.queries_llm import q_judge_agreement_kappa
    from mrgo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    rows = q_judge_agreement_kappa(spark, sf).collect()
    n_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    for r in rows:
        assert (
            r.n_both_pos + r.n_both_neg + r.n_j1_only + r.n_j2_only == r.n
        )


def test_declared_copeland_totals(spark):
    """4 systems -> every prompt contributes C(4,2)=6 comparisons x2
    credits when all systems are present; Σ copeland = 0 regardless."""
    from mrgo_spark.operators.queries_llm import q_copeland_system_ranking

    rows = q_copeland_system_ranking(spark, "/root/testdata/sf0.001").collect()
    assert sum(r.copeland for r in rows) == 0
    assert {r.system_id for r in rows} <= {0, 1, 2, 3}
    for r in rows:
        assert r.wins + r.losses + r.ties == r.n_comparisons


# --------------------------------------------------------- containment


def test_containment_pairs_replay(spark):
    """Planted fragment: a doc's first-half copy has containment_a =
    1.0 while jaccard is ~0.5 — the case symmetric resemblance
    under-scores. Full python replay of the shingle-set math."""
    full = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    frag = " ".join(full.split()[:5])
    other = "one two three four five six seven"
    docs = spark.createDataFrame(
        [(1, full), (2, frag), (3, other)], "doc_id long, text string"
    )
    cands = spark.createDataFrame(
        [(2, 1), (3, 1)], "id_a long, id_b long"
    )
    from mrgo_spark.operators import dedup

    got = {
        (r.id_a, r.id_b): (
            r.inter_size,
            r.size_a,
            r.size_b,
            r.containment_a,
            r.containment_b,
        )
        for r in dedup.containment_pairs(docs, cands).collect()
    }

    def sh3(s):
        ts = s.lower().split()
        if len(ts) >= 3:
            return {" ".join(ts[i : i + 3]) for i in range(len(ts) - 2)}
        return {" ".join(ts)}

    texts = {1: full, 2: frag, 3: other}
    for (a, b), row in got.items():
        sa, sb = sh3(texts[a]), sh3(texts[b])
        inter = len(sa & sb)
        assert row == (
            inter,
            len(sa),
            len(sb),
            inter / len(sa),
            inter / len(sb),
        ), (a, b)
    # fragment fully contained; jaccard would be inter/union < 1
    assert got[(2, 1)][3] == 1.0
    assert got[(2, 1)][4] < 1.0
    # unrelated doc: zero overlap
    assert got[(3, 1)][0] == 0


def test_declared_containment_pins(spark):
    """Every declared pair's fragment side is fully contained (the
    fixture constructs it as a prefix slice), and the full side is
    never smaller than the fragment."""
    from mrgo_spark.operators.queries_llm import q_ngram_containment

    rows = q_ngram_containment(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert r.containment_a == 1.0, r
        assert r.size_b >= r.size_a, r


# ----------------------------------------------------------- fertility


def test_bpe_fertility_replay(spark):
    """Handcrafted vocab + corpus: fertility is the exact integer
    ratio; a language with no tokenizable words reports NULL with its
    volume still counted."""
    from mrgo_spark.operators.textstats import bpe_fertility_by_lang

    words = spark.createDataFrame(
        [
            ("hello", 3, "hel  lo"),      # 2 tokens
            ("world", 2, "w  or  ld"),    # 3 tokens
            ("hi", 1, "hi"),              # 1 token
        ],
        "w string, freq long, sym string",
    )
    docs = spark.createDataFrame(
        [
            (1, "en", "hello world hello"),
            (2, "en", "hi"),
            (3, "fr", "world"),
            (4, "zz", "1234 !!!"),       # no letters -> no words
        ],
        "doc_id long, lang string, text string",
    )
    got = {
        r.lang: (r.n_docs, r.n_words, r.n_tokens, r.fertility_milli)
        for r in bpe_fertility_by_lang(docs, words).collect()
    }
    # en: words hello,world,hello,hi -> tokens 2+3+2+1=8, 4 words
    assert got["en"] == (2, 4, 8, (1000 * 8) // 4)
    # fr: world -> 3 tokens / 1 word
    assert got["fr"] == (1, 1, 3, 3000)
    # zz: volume visible, fertility NULL
    assert got["zz"] == (1, 0, 0, None)


def test_kv_state_diff_null_states(spark):
    """NULL-vs-NULL state is 'unchanged' (eqNullSafe — plain ==
    would fall through to 'changed'); NULL-vs-value is 'changed'."""
    before = spark.createDataFrame(
        [("a", None), ("b", None)], "key string, state string"
    )
    after = spark.createDataFrame(
        [("a", None), ("b", "now-set")], "key string, state string"
    )
    got = {
        r.key: r.verdict for r in kv.state_diff(before, after).collect()
    }
    assert got == {"a": "unchanged", "b": "changed"}


# ------------------------------------------------- pruned bitext twin


def test_margin_bitext_imi_degenerates_to_exact(spark):
    """n_probe = K (all 16 coarse cells probed) must reproduce the
    EXACT margin miner bit-for-bit on the same fixed query set — the
    n_probe=K parity pin every pruned twin carries."""
    from mrgo_spark.operators.queries_llm import _pq_artifacts
    from mrgo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents, a, _ = _pq_artifacts(spark, sf)
    pruned = {
        r.src_id: tuple(r)
        for r in similarity.margin_bitext_mine_imi(
            emb, a, cents, k=4, n_probe=16, n_queries=8
        ).collect()
    }
    qids = [
        r[0]
        for r in emb.filter(F.col("vec_id") % 2 == 0)
        .select("vec_id")
        .orderBy("vec_id")
        .limit(8)
        .collect()
    ]
    exact = {
        r.src_id: tuple(r)
        for r in similarity.margin_bitext_mine(
            emb.filter(F.col("vec_id").isin(qids)),
            emb.filter(F.col("vec_id") % 2 == 0),
            emb.filter(F.col("vec_id") % 2 == 1),
            k=4,
        ).collect()
    }
    assert pruned == exact
    assert len(pruned) == 8


def test_margin_bitext_imi_prunes(spark):
    """At n_probe=4 the pruned miner still returns one row per query
    with sums over at most k pruned neighbors (<= the exact sums'
    neighbor count by construction)."""
    from mrgo_spark.operators.queries_llm import _pq_artifacts
    from mrgo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    emb = load_table(spark, sf, "embeddings")
    cents, a, _ = _pq_artifacts(spark, sf)
    rows = similarity.margin_bitext_mine_imi(
        emb, a, cents, k=4, n_probe=4, n_queries=8
    ).collect()
    assert len(rows) == 8
    for r in rows:
        assert r.tgt_id % 2 == 1 and r.src_id % 2 == 0
        assert r.margin_milli is not None


# --------------------------------------------------------- trajectories


def test_trajectory_returns_replay(spark):
    """Python replay on handcrafted logs: gap splits episodes,
    return-to-go suffix-sums within them, step-1 carries the episode
    return; NULL reward fails loudly."""
    from datetime import datetime, timezone

    def t(s):
        return datetime.fromtimestamp(s, tz=timezone.utc)

    rows = [
        # user 1, episode 1: 3 events inside 30 min
        (1, 101, t(1000), 10),
        (1, 102, t(1100), -3),
        (1, 103, t(1200), 1),
        # user 1, episode 2: after a 2h silence
        (1, 104, t(9000), 5),
        # user 2: single-event episode
        (2, 201, t(500), 1),
        # user 2, same-ts tie broken by event_id (gap > 30min later)
        (2, 202, t(4000), 1),
        (2, 203, t(4000), 10),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts timestamp, r long"
    )
    got = {
        r.event_id: (r.episode, r.step, r.reward_fp, r.return_to_go)
        for r in pipeline.trajectory_returns(df, F.col("r")).collect()
    }
    assert got[101] == (1, 1, 10, 8)    # 10-3+1
    assert got[102] == (1, 2, -3, -2)
    assert got[103] == (1, 3, 1, 1)
    assert got[104] == (2, 1, 5, 5)
    assert got[201] == (1, 1, 1, 1)
    assert got[202] == (2, 1, 1, 11)    # tie: event_id orders steps
    assert got[203] == (2, 2, 10, 10)

    bad = spark.createDataFrame(
        [(1, 1, t(0), None)], "user_id long, event_id long, ts timestamp, r long"
    )
    with pytest.raises(Exception, match="non-null"):
        pipeline.trajectory_returns(bad, F.col("r")).collect()


def test_streaming_reward_clip_matches_batch(spark, tmp_path):
    """The frozen-cutoff clip streams bit-identically (stateless
    map-only, the streaming_classifier pattern); cutoffs come from
    the batch sketch."""
    from mrgo_spark.operators.textstats import classifier_score_col
    from mrgo_spark.sources.tables import load_table
    from mrgo_spark.streaming import stream_ops

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    cut_rows = (
        pipeline.reward_winsorize(docs, classifier_score_col("text"))
        .select("lo_cut", "hi_cut")
        .first()
    )
    lo_cut, hi_cut = cut_rows.lo_cut, cut_rows.hi_cut
    expected = {
        r.doc_id: (r.reward_fp, r.reward_winsor, r.clip)
        for r in pipeline.reward_winsorize(
            docs, classifier_score_col("text")
        ).collect()
    }
    d = tmp_path / "clip_stream"
    docs.coalesce(2).write.parquet(str(d))
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(d)
    )
    out = stream_ops.streaming_reward_clip(stream, lo_cut, hi_cut)
    stream_ops.run_to_memory(out, "clip_out", output_mode="append")
    got = {
        r.doc_id: (r.reward_fp, r.reward_winsor, r.clip)
        for r in spark.sql("SELECT * FROM clip_out").collect()
    }
    assert got == expected and len(got) == len(expected)

    with pytest.raises(ValueError, match="lo_cut"):
        stream_ops.streaming_reward_clip(stream, 5, -5)


# -------------------------------------------------- all-pairs jaccard


def test_prefix_filter_jaccard_no_false_negatives(spark):
    """The prefix-filter theorem check: against brute force over a
    handcrafted corpus, every pair with token-set Jaccard >= t is
    found (exactly — no false negatives AND the verify kills false
    positives), at two thresholds."""
    from mrgo_spark.operators import dedup

    rows = [
        (1, "alpha beta gamma delta epsilon"),
        (2, "alpha beta gamma delta epsilon"),        # J=1 with 1
        (3, "alpha beta gamma delta zeta"),            # J=4/6 with 1
        (4, "epsilon delta gamma beta alpha"),         # reorder, J=1
        (5, "totally different words here now"),
        (6, "alpha beta gamma delta epsilon eta"),     # J=5/6 with 1
        (7, "x"),
        (8, "x"),                                      # J=1 with 7
        (9, ""),                                       # empty: no rows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    def toks(s):
        return {w for w in s.lower().split() if w}

    def brute(tn, td):
        out = {}
        for i, (ia, ta) in enumerate(rows):
            for ib, tb in rows[i + 1 :]:
                sa, sb = toks(ta), toks(tb)
                if not sa or not sb:
                    continue
                inter, union = len(sa & sb), len(sa | sb)
                if td * inter >= tn * union:
                    out[(ia, ib)] = (inter, union)
        return out

    for tn, td in [(4, 5), (1, 2)]:
        got = {
            (r.id_a, r.id_b): (r.inter_size, r.union_size)
            for r in dedup.prefix_filter_jaccard_pairs(
                df, threshold_num=tn, threshold_den=td
            ).collect()
        }
        assert got == brute(tn, td), (tn, td)
    # the J=1 pairs specifically (identity, reorder, single-token)
    got = {
        (r.id_a, r.id_b)
        for r in dedup.prefix_filter_jaccard_pairs(df, 4, 5).collect()
    }
    assert {(1, 2), (1, 4), (2, 4), (7, 8)} <= got
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_filter_jaccard_pairs(df, 0, 5)
    with pytest.raises(ValueError, match="threshold"):
        dedup.prefix_filter_jaccard_pairs(df, 6, 5)


def test_prefix_length_math():
    """p = |d| - ceil(t|d|) + 1 replay for the integer form."""
    import math

    for n, d in [(4, 5), (19, 20), (1, 2), (1, 1)]:
        for size in range(1, 60):
            want = size - math.ceil(n * size / d) + 1
            got = size - ((n * size + d - 1) // d) + 1
            assert got == want and got >= 1, (n, d, size)


def test_declared_allpairs_recall(spark):
    """Every planted copy pair (exact AND token-reversed — token
    sets are order-blind) surfaces at J=1 in the declared entry."""
    from mrgo_spark.operators.queries_llm import q_allpairs_jaccard_prefix
    from mrgo_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    got = {
        (r.id_a, r.id_b): r.jaccard
        for r in q_allpairs_jaccard_prefix(spark, sf).collect()
    }
    docs = load_table(spark, sf, "documents")
    planted = [
        r.doc_id for r in docs.filter(F.col("doc_id") % 10 == 0).collect()
    ]
    for i in planted:
        assert got.get((i, i + 100000)) == 1.0, i        # exact copy
        assert got.get((i, i + 200000)) == 1.0, i        # reversed copy
        assert got.get((i + 100000, i + 200000)) == 1.0, i
