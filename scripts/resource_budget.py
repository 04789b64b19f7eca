"""Resource budgets (VERDICT_r12 #1 — the TestRPCBytes2B/TestCount2B
analog, reference raft/test_test.go:128-157, :455): record and check
load-independent per-query byte/row metrics for the driver gate
window.

    python scripts/resource_budget.py record [sf_dir] [names...]
    python scripts/resource_budget.py check  [sf_dir] [names...]

record — runs the gate-window queries (registry order, fresh process)
at sf_dir, captures shuffle bytes read/written, spilled bytes, input
bytes and result rows per query via the JVM AppStatusStore
(mrgo_spark.metrics), and writes BUDGETS.json at the repo root.

check — re-runs the same queries the same way and FAILS (exit 1) when
any query exceeds its recorded shuffle/spill bytes by >1.5x (+64 KiB
noise floor) or returns a different row count. Wall-clock needs a
calm box; bytes don't — this is the gate that catches an extra corpus
pass, a lost broadcast, or a recompute through a lazy lineage (the
r11 IVF defect class) regardless of load.

Budgets are ORDER-DEPENDENT by design: session caches (IVF/PQ/BPE/
BM25) train inside whichever query touches them first, so recorder
and checker both run the full gate window in registry order from a
fresh process. After a deliberate plan change, re-record and commit
the new BUDGETS.json with the change (the snapshot-update workflow).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

BUDGETS = REPO / "BUDGETS.json"
SLACK = 64 * 1024  # absolute noise floor in bytes
RATIO = 1.5

GATED_KEYS = ("shuffle_read", "shuffle_write", "spilled_disk")


def _session(sf_dir: str):
    # mirror driver_sim's session (the budgets describe the gate
    # window as the driver runs it); PYTHONPATH export like
    # mrgo_spark.session so closure-free declared queries behave
    # identically
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _gate_queries():
    from mrgo_spark.registry import DRIVER_WINDOW, load

    q, _ = load()
    names = list(q)[:DRIVER_WINDOW]
    return {n: q[n] for n in names}


def run(sf_dir: str, only: set[str]) -> dict:
    from mrgo_spark import metrics

    spark = _session(sf_dir)
    out = {}
    for name, fn in _gate_queries().items():
        if only and name not in only:
            continue
        t0 = time.time()
        m = metrics.run_with_metrics(spark, lambda: fn(spark, sf_dir))
        m["wall_s"] = round(time.time() - t0, 2)
        out[name] = m
        print(
            f"{name}: rows={m['rows']} "
            f"sr={m['shuffle_read']} sw={m['shuffle_write']} "
            f"spill={m['spilled_disk']} stages={m['n_stages']} "
            f"({m['wall_s']}s)",
            flush=True,
        )
    return out


def record(sf_dir: str, only: set[str]) -> int:
    measured = run(sf_dir, only)
    if BUDGETS.exists():
        doc = json.loads(BUDGETS.read_text())
        if doc.get("sf_dir") != sf_dir and not only:
            doc = {"sf_dir": sf_dir, "queries": {}}
    else:
        doc = {"sf_dir": sf_dir, "queries": {}}
    doc["sf_dir"] = sf_dir
    doc["session"] = {"master": "local[16]", "shuffle_partitions": 16}
    doc["tolerance"] = {"ratio": RATIO, "slack_bytes": SLACK}
    doc["queries"].update(measured)
    # drop queries that left the gate window
    gate = set(_gate_queries())
    doc["queries"] = {
        k: v for k, v in doc["queries"].items() if k in gate
    }
    BUDGETS.write_text(json.dumps(doc, indent=1, sort_keys=True) + "\n")
    print(f"recorded {len(measured)} budgets -> {BUDGETS}")
    return 0


def check(sf_dir: str, only: set[str]) -> int:
    doc = json.loads(BUDGETS.read_text())
    if doc.get("sf_dir") != sf_dir:
        print(
            f"BUDGETS.json was recorded at {doc.get('sf_dir')}, "
            f"not {sf_dir} — re-record or pass the right sf_dir"
        )
        return 2
    budgets = doc["queries"]
    measured = run(sf_dir, only)
    bad = []
    for name, m in measured.items():
        b = budgets.get(name)
        if b is None:
            bad.append(f"{name}: no recorded budget (re-record)")
            continue
        if m["rows"] != b["rows"]:
            bad.append(
                f"{name}: rows {m['rows']} != recorded {b['rows']}"
            )
        for k in GATED_KEYS:
            cap = b[k] * RATIO + SLACK
            if m[k] > cap:
                bad.append(
                    f"{name}: {k} {m[k]} > {cap:.0f} "
                    f"(recorded {b[k]} x{RATIO} + {SLACK})"
                )
    missing = [
        n for n in budgets if n not in measured and (not only)
    ]
    for n in missing:
        bad.append(f"{n}: budgeted but not measured (left the window?)")
    if bad:
        print("BUDGET VIOLATIONS:")
        for line in bad:
            print("  " + line)
        return 1
    print(f"budgets ok: {len(measured)} queries within {RATIO}x")
    return 0


def main() -> int:
    args = [a for a in sys.argv[1:]]
    if not args or args[0] not in ("record", "check"):
        print(__doc__)
        return 2
    mode = args[0]
    sf_dir = "/root/testdata/sf0.001"
    rest = args[1:]
    if rest and "/" in rest[0]:
        sf_dir = rest[0]
        rest = rest[1:]
    only = set(rest)
    if mode == "record":
        return record(sf_dir, only)
    return check(sf_dir, only)


if __name__ == "__main__":
    raise SystemExit(main())
