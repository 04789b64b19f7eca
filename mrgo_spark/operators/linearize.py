"""Linearizability checking for KV histories (porcupine-lite).

The reference checks concurrent Get/Put/Append histories against the
KV model with porcupine (reference kvraft/test_test.go:299-449,
models/kv.go:17-69). Like the reference's model, histories partition
by key (models/kv.go:18-34) — each key checks independently.

Spark-first shape: the history DataFrame groups by key and each key's
(small) sub-history is checked in parallel executors via
``applyInPandas``. The per-key search is the classic Wing & Gong
DFS with (linearized-set, state) memoization; per-key histories in
tests are tiny, and at scale the parallelism axis is the key count.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterable

import pandas as pd

from pyspark.sql import DataFrame


@dataclass(frozen=True)
class Op:
    client: int
    op: str  # get | put | append
    value: str | None
    output: str | None
    call_ns: int
    return_ns: int


def _apply(state: str, o: Op) -> tuple[bool, str]:
    """models/kv.go:40-54: get checks, put replaces, append concats."""
    if o.op == "get":
        return (o.output or "") == state, state
    if o.op == "put":
        return True, o.value or ""
    if o.op == "append":
        return True, state + (o.value or "")
    raise ValueError(f"unknown op {o.op}")


def check_key_history(ops: Iterable[Op]) -> bool:
    """True iff some linearization of the ops satisfies the KV model.

    Real-time constraint: an op may linearize only when every op that
    *returned* before its call has already been linearized.
    """
    ops = sorted(ops, key=lambda o: (o.call_ns, o.return_ns))
    n = len(ops)
    if n == 0:
        return True
    seen: set[tuple[frozenset[int], str]] = set()

    def dfs(done: frozenset[int], state: str) -> bool:
        if len(done) == n:
            return True
        key = (done, state)
        if key in seen:
            return False
        seen.add(key)
        # earliest return among not-yet-linearized ops: anything whose
        # call is after that return cannot linearize next
        min_ret = min(ops[i].return_ns for i in range(n) if i not in done)
        for i in range(n):
            if i in done:
                continue
            o = ops[i]
            if o.call_ns > min_ret:
                break  # ops sorted by call; later ones only worse
            ok, new_state = _apply(state, o)
            if ok and dfs(done | {i}, new_state):
                return True
        return False

    return dfs(frozenset(), "")


HISTORY_SCHEMA = (
    "client long, op string, key string, value string, output string, "
    "call_ns long, return_ns long"
)
_RESULT_SCHEMA = "key string, ok boolean, n_ops long"


def _check_group(pdf: pd.DataFrame) -> pd.DataFrame:
    ops = [
        Op(
            client=int(r.client),
            op=str(r.op),
            value=None if pd.isna(r.value) else str(r.value),
            output=None if pd.isna(r.output) else str(r.output),
            call_ns=int(r.call_ns),
            return_ns=int(r.return_ns),
        )
        for r in pdf.itertuples()
    ]
    return pd.DataFrame(
        {"key": [pdf["key"].iloc[0]], "ok": [check_key_history(ops)], "n_ops": [len(ops)]}
    )


def check_history(history: DataFrame) -> DataFrame:
    """Distributed check: one verdict row per key (key, ok, n_ops)."""
    return history.groupBy("key").applyInPandas(
        lambda pdf: _check_group(pdf), schema=_RESULT_SCHEMA
    )
