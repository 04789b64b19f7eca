"""Bench self-defense helpers (VERDICT_r9 #6): the r9 driver bench
capture printed an 8.6x phantom regression from a loaded box. The
retime path must (a) pick exactly the warm entries that look
regressed vs the committed previous round, (b) ignore entries with no
baseline or sub-100ms baselines, and (c) read the newest committed
BENCH_r{N}.json robustly (driver tail captures can prepend junk)."""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

spec = importlib.util.spec_from_file_location(
    "mrgo_bench", str(Path(__file__).resolve().parent.parent / "bench.py")
)
bench = importlib.util.module_from_spec(spec)
sys.modules["mrgo_bench"] = bench
spec.loader.exec_module(bench)


def test_select_retimes_flags_only_outliers():
    prev = {"a": 1.0, "b": 2.0, "c": 0.05, "d": 4.0}
    warm = {
        "a": 8.6,   # 8.6x — the r9 phantom shape, flagged
        "b": 2.4,   # 1.2x — normal drift, not flagged
        "c": 5.0,   # huge ratio but sub-100ms baseline — exempt
        "d": 12.1,  # 3.02x — flagged (strictly over threshold)
        "e": 9.0,   # no baseline — can't judge, not flagged
    }
    assert sorted(bench._select_retimes(warm, prev)) == ["a", "d"]
    # exactly at threshold is NOT flagged (> not >=)
    assert bench._select_retimes({"a": 3.0}, {"a": 1.0}) == []
    # empty baseline (round 1) flags nothing
    assert bench._select_retimes(warm, {}) == []


def test_load_prev_warm_reads_newest_round(tmp_path):
    (tmp_path / "BENCH_r03.json").write_text(
        json.dumps({"queries_warm": {"x": 1.0}}) + "\n"
    )
    # newest round wins; junk lines before the dict are skipped (the
    # driver tail-capture shape)
    (tmp_path / "BENCH_r11.json").write_text(
        "some truncated junk\n"
        + json.dumps({"queries_warm": {"x": 2.5, "y": 0.3}})
        + "\n"
        + json.dumps({"metric": "headline_summary", "value": 1})
        + "\n"
    )
    got = bench._load_prev_warm(tmp_path)
    assert got == {"x": 2.5, "y": 0.3}
    # no BENCH files -> empty baseline
    assert bench._load_prev_warm(tmp_path / "nowhere") == {}


def test_load_prev_warm_reads_driver_wrapper(tmp_path):
    """The committed BENCH_r{N}.json is usually the DRIVER's capture:
    a pretty-printed wrapper whose "tail" string holds the end of
    bench stdout — queries_warm must be recovered from it."""
    tail = (
        '"queries": {"a": 9.9}, '
        '"queries_warm": {"bm25": 1.08, "dcg": 2.3}, '
        '"value": 22.8, "failed": []}'
    )
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"n": 9, "rc": 0, "tail": tail}, indent=2) + "\n"
    )
    assert bench._load_prev_warm(tmp_path) == {"bm25": 1.08, "dcg": 2.3}
    # wrapper without a recoverable queries_warm -> empty baseline
    (tmp_path / "BENCH_r10.json").write_text(
        json.dumps({"n": 10, "rc": 0, "tail": "truncated junk"}) + "\n"
    )
    assert bench._load_prev_warm(tmp_path) == {}


def test_load_prev_warm_synthetic_load_scenario(tmp_path):
    """End-to-end selection under a synthetic loaded-box round: the
    previous round's warm numbers are calm; this round's are uniformly
    1.4x (box drift — under threshold) except two spiked entries,
    which are exactly the retime set."""
    calm = {f"q{i}": 1.0 + i / 10 for i in range(10)}
    (tmp_path / "BENCH_r09.json").write_text(
        json.dumps({"queries_warm": calm}) + "\n"
    )
    loaded = {k: v * 1.4 for k, v in calm.items()}
    loaded["q3"] = calm["q3"] * 8.6
    loaded["q7"] = calm["q7"] * 6.3
    prev = bench._load_prev_warm(tmp_path)
    assert sorted(bench._select_retimes(loaded, prev)) == ["q3", "q7"]
