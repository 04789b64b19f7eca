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
