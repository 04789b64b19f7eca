"""Resource budgets as assertions (VERDICT_r12 #1 — the
TestRPCBytes2B/TestCount2B analog): the driver gate window's recorded
shuffle/spill bytes and row counts are enforced, load-independently.

The check runs in a FRESH subprocess because budgets are
order-dependent (session caches train inside whichever query touches
them first; recorder and checker must both run the gate window in
registry order from a clean session). Bytes are a function of plan +
data only, so box load cannot flake this test the way wall-clock can.
"""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent


def test_metrics_capture_deterministic(spark):
    """The metric reader itself: same plan + same data = same shuffle
    bytes, twice in a row; rows come back exact; a map-only plan
    reports zero shuffle."""
    from mrgo_spark import metrics

    def q():
        return (
            spark.range(100_000)
            .selectExpr("id % 97 as k", "id")
            .groupBy("k")
            .count()
        )

    m1 = metrics.run_with_metrics(spark, q)
    m2 = metrics.run_with_metrics(spark, q)
    assert m1["rows"] == m2["rows"] == 97
    assert m1["shuffle_write"] > 0
    assert m1["shuffle_write"] == m2["shuffle_write"]
    assert m1["shuffle_read"] == m2["shuffle_read"]
    # a map-only plan's only shuffle is count()'s own final partial
    # aggregate (a few bytes per partition) — bounded and, again,
    # identical run-to-run
    m3 = metrics.run_with_metrics(
        spark, lambda: spark.range(10_000).selectExpr("id * 2 as x")
    )
    m4 = metrics.run_with_metrics(
        spark, lambda: spark.range(10_000).selectExpr("id * 2 as x")
    )
    assert m3["rows"] == 10_000
    assert m3["shuffle_write"] < 16 * 1024
    assert (m3["shuffle_read"], m3["shuffle_write"]) == (
        m4["shuffle_read"],
        m4["shuffle_write"],
    )


def test_gate_window_resource_budgets():
    """Every gate-window query stays within 1.5x of its recorded
    shuffle-read/write and spill bytes and returns exactly its
    recorded row count (scripts/resource_budget.py check). After a
    DELIBERATE plan change, re-record BUDGETS.json in the same commit
    — this is the snapshot-update workflow, not a tunable."""
    budgets = REPO / "BUDGETS.json"
    if not budgets.exists():
        pytest.skip("no BUDGETS.json recorded yet")
    doc = json.loads(budgets.read_text())
    proc = subprocess.run(
        [
            sys.executable,
            str(REPO / "scripts" / "resource_budget.py"),
            "check",
            doc["sf_dir"],
        ],
        capture_output=True,
        text=True,
        timeout=2400,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        "resource budget check failed:\n"
        + proc.stdout[-4000:]
        + proc.stderr[-2000:]
    )
