"""Hypothesis property tests: Spark operators vs pure-Python models
(the SQL-logic-test analog the reference lacked; SURVEY §5)."""

from __future__ import annotations

import re

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mrgo_spark.operators import kv
from mrgo_spark.operators.linearize import Op, check_key_history

_SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_ops_strategy = st.lists(
    st.tuples(
        st.sampled_from(["put", "append", "get"]),
        st.sampled_from(["a", "b"]),
        st.text(alphabet="xyz", min_size=0, max_size=3),
    ),
    min_size=1,
    max_size=15,
)


def _python_fold(ops):
    """Reference model: models/kv.go:40-54 applied sequentially."""
    state: dict[str, str] = {}
    for i, (op, key, val) in enumerate(ops):
        if op == "put":
            state[key] = val
        elif op == "append":
            state[key] = state.get(key, "") + val
    return state


@given(_ops_strategy)
@_SETTINGS
def test_fold_matches_python_model(spark, ops):
    rows = [
        (i + 1, 1, i + 1, op, key, None if op == "get" else val)
        for i, (op, key, val) in enumerate(ops)
    ]
    df = spark.createDataFrame(
        rows, "seq long, client long, reqid long, op string, key string, value string"
    )
    got = {r.key: r.state for r in kv.fold_state(df).collect()}
    want = {
        k: v for k, v in _python_fold(ops).items()
    }
    # keys only ever read (never mutated) are absent from the fold
    want = {k: v for k, v in want.items()}
    assert got == want


@given(_ops_strategy)
@_SETTINGS
def test_sequential_histories_linearizable(spark, ops):
    """Any history produced by sequentially running the model is
    linearizable (F3 fixture property) — checker must accept it."""
    state: dict[str, str] = {}
    t = 0
    per_key: dict[str, list[Op]] = {}
    for op, key, val in ops:
        if op == "put":
            state[key] = val
            rec = Op(1, "put", val, None, t, t + 1)
        elif op == "append":
            state[key] = state.get(key, "") + val
            rec = Op(1, "append", val, None, t, t + 1)
        else:
            rec = Op(1, "get", None, state.get(key, ""), t, t + 1)
        per_key.setdefault(key, []).append(rec)
        t += 2
    for key_ops in per_key.values():
        assert check_key_history(key_ops)


@given(st.text(alphabet=st.characters(codec="ascii"), max_size=120))
@_SETTINGS
def test_tokenizer_matches_python_re(spark, text):
    """ASCII tokenizer ≡ Python re.split (the declared O12 contract)."""
    from pyspark.sql import functions as F

    from mrgo_spark.functions.text import ascii_tokens

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(ascii_tokens("text").alias("t")).collect()[0].t
    want = [w for w in re.split("[^A-Za-z]+", text) if w]
    assert got == want


# Curated multi-script alphabet: Latin-1 letters, CJK, Hangul,
# Greek/Cyrillic, Lm/Lo oddities (ª µ), Nl roman numerals (NOT
# letters), combining marks (split like Go does on NFD text),
# supplementary-plane letters, zero-width space, punctuation/digits.
_UNI_ALPHABET = (
    "abXY äöçñ 中文日本語 한글 Αβγ Дд ªºµ ⅠⅡ ̀́̂ "
    "\U0001D518\U0001D52B ​ 0129 _-.!?\t\n😀"
)


def _go_isletter_tokens(s: str) -> list[str]:
    """Reference model: Go unicode.IsLetter == Unicode category L*
    (mrapps/wc.go:26-29 strings.FieldsFunc on !IsLetter)."""
    import unicodedata

    toks: list[str] = []
    cur: list[str] = []
    for ch in s:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            toks.append("".join(cur))
            cur = []
    if cur:
        toks.append("".join(cur))
    return toks


@given(st.text(alphabet=_UNI_ALPHABET, max_size=60))
@_SETTINGS
def test_unicode_tokenizer_matches_go_isletter(spark, text):
    """Unicode tokenizer ≡ Go unicode.IsLetter rune classes, AND the
    DuckDB oracle regex agrees — the three-way parity that makes
    wordcount_unicode oracle-declarable. No class gaps found on this
    alphabet (Java \\p{L}, RE2 \\p{L}, and Python category-L all share
    the L* definition; table-version skew would only show on runes
    added after Unicode 13, which this alphabet avoids)."""
    import duckdb

    from mrgo_spark.functions.text import unicode_tokens

    df = spark.createDataFrame([(text,)], "text string")
    got = df.select(unicode_tokens("text").alias("t")).collect()[0].t
    want = _go_isletter_tokens(text)
    assert got == want

    duck = duckdb.connect().execute(
        r"SELECT list_filter(string_split_regex(?, '[^\p{L}]+'), x -> x <> '')",
        [text],
    ).fetchone()[0]
    assert duck == want


@given(
    st.integers(min_value=1, max_value=8),
    st.lists(st.integers(min_value=100, max_value=120), min_size=1, max_size=6, unique=True),
)
@_SETTINGS
def test_rebalance_properties(nshards_factor, groups):
    shards = {s: 0 for s in range(10)}
    out = kv.rebalance(shards, groups)
    counts: dict[int, int] = {}
    for gid in out.values():
        counts[gid] = counts.get(gid, 0) + 1
        assert gid in groups
    assert max(counts.values()) - min(counts.values()) <= 1

    # idempotence: rebalancing a balanced config moves nothing
    again = kv.rebalance(out, groups)
    assert again == out


def _min_moves(old: dict[int, int], groups: list[int]) -> int:
    """Provable lower bound on shard moves for any balanced target:
    n - max over cap-awardings of Σ min(held_g, cap_g)."""
    n, g = len(old), len(set(groups))
    base, extra = divmod(n, g)
    held = {gid: 0 for gid in set(groups)}
    for s, gid in old.items():
        if gid in held:
            held[gid] += 1
    gain_eligible = sum(1 for c in held.values() if c >= base + 1)
    max_keep = sum(min(c, base) for c in held.values()) + min(extra, gain_eligible)
    return n - max_keep


@given(
    st.lists(
        st.tuples(st.sampled_from(["join", "leave"]),
                  st.integers(min_value=100, max_value=110)),
        min_size=1,
        max_size=10,
    )
)
@_SETTINGS
def test_reconfigure_sequence_min_moves(ops):
    """O24 across a Join/Leave sequence (shardmaster/test_test.go:35-52
    + shardkv/test_test.go:90-141 semantics): every step stays
    balanced, the migration plan is exactly the assignment diff, and
    the number of moves is the provable minimum."""
    assignment = {s: 0 for s in range(10)}
    groups: set[int] = set()
    for op, gid in ops:
        if op == "join":
            groups.add(gid)
        else:
            groups.discard(gid)
        old = dict(assignment)
        assignment, plan = kv.reconfigure(assignment, sorted(groups))
        # plan == the exact diff
        assert plan == [
            (s, old[s], assignment[s]) for s in sorted(old)
            if old[s] != assignment[s]
        ]
        if not groups:
            assert all(g == 0 for g in assignment.values())
            continue
        counts: dict[int, int] = {}
        for g in assignment.values():
            assert g in groups
            counts[g] = counts.get(g, 0) + 1
        occupied = [counts.get(g, 0) for g in groups]
        assert max(occupied) - min(occupied) <= 1
        assert len(plan) == _min_moves(old, sorted(groups))
