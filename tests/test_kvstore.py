"""Clerk-style API semantics (reference kvraft/client.go contract)."""

from __future__ import annotations

from mrgo_spark.operators import kv
from mrgo_spark.operators.kvstore import KVStore


def test_get_put_append_semantics(spark):
    s = KVStore(spark)
    assert s.get("x") == ""  # missing key reads ""
    s.put("x", "A")
    s.append("x", "B")
    assert s.get("x") == "AB"
    s.put("x", "C")  # put replaces
    assert s.get("x") == "C"
    s.append("y", "solo")  # append acts as put when absent
    assert s.get("y") == "solo"


def test_get_many_batches_reads(spark):
    s = KVStore(spark)
    s.put("a", "1")
    s.append("a", "2")
    s.put("b", "3")
    got = s.get_many(["a", "b", "missing"])
    assert got == {"a": "12", "b": "3", "missing": ""}
    # agrees with single-key reads
    assert all(s.get(k) == v for k, v in got.items())


def test_state_matches_streaming_style_fold(spark, tmp_path):
    s = KVStore(spark)
    for i in range(20):
        if i % 5 == 0:
            s.put(f"k{i % 3}", f"P{i}.")
        else:
            s.append(f"k{i % 3}", f"a{i}.")
    want = {r.key: r.state for r in s.state().collect()}

    # checkpointed log folds identically through the table-based path
    path = str(tmp_path / "log")
    s.checkpoint(path)
    reread = spark.read.parquet(path)
    got = {r.key: r.state for r in kv.fold_state(reread).collect()}
    assert got == want
