"""Driver simulation: the verify-skill recipe as a script.

Runs entry() (t1) then every queries() entry vs its oracle_sql() in
DuckDB (t2) at the given sf dir. Usage:
    python scripts/driver_sim.py [sf_dir] [query_name ...]
Extra args restrict the t2 loop to those query names (entry() still
runs) — the fast path when iterating on one declaration.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb
import pandas as pd

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mrgo_spark.registry import DRIVER_WINDOW  # noqa: E402

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", REPO / "__spark_entry__.py"
)
mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(mod)

from pyspark.sql import SparkSession  # noqa: E402

# Arrow fetch (not .fetchall()) so HUGEINT-typed oracle columns
# surface as Decimal and hash-break locally, same as the driver.
from tests.parity import duck_fetch  # noqa: E402

spark = (
    SparkSession.builder.master("local[16]")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

assert len(mod.entry(spark).collect()) > 0, "entry() returned no rows"
print("entry(): ok")

q, o = mod.queries(), mod.oracle_sql()
con = duckdb.connect()
for t in [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")


def norm(cols, rows):
    # Mirror the driver's canonicalization: it sorts result rows via
    # pandas sort_values over ALL columns, which throws
    # "unhashable type: 'list'" on array/map cells — exactly how r3's
    # 3 red rows died before any value compare. Probe that here so the
    # failure reproduces locally; equality itself stays on the proven
    # per-cell repr compare (hash-equivalent for scalar cells).
    df = pd.DataFrame(rows, columns=list(cols))
    if len(df):
        df.sort_values(by=sorted(df.columns))
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(repr(r[i]) for i in order) for r in rows)


# The driver's CORRECTNESS gate only covers a prefix of queries()
# (observed: first 50, = registry.DRIVER_WINDOW); flag what sits
# outside it so a reordering regression is visible here, not in the
# round verdict.
names = list(q)
if len(names) > DRIVER_WINDOW:
    outside = names[DRIVER_WINDOW:]
    print(
        f"NOTE: {len(names)} declared queries; {len(outside)} sit outside "
        f"the driver's first-{DRIVER_WINDOW} gate window:\n  " + " ".join(outside)
    )

bad = []
if ONLY:
    missing = ONLY - set(q)
    assert not missing, f"unknown query names: {sorted(missing)}"
for name in sorted(ONLY or q):
    # fail-soft per query, mirroring the driver's per-entry `err`
    # capture — one broken query must not hide the rest's status
    try:
        sdf = q[name](spark, SF_DIR)
        srows = [tuple(r) for r in sdf.collect()]
        if name not in o:
            print(f"{name}: rows-only ({len(srows)} rows)", flush=True)
            continue
        dcols, drows = duck_fetch(con, o[name])
        ok = norm(sdf.columns, srows) == norm(dcols, drows)
        print(f"{name}: {'OK' if ok else 'MISMATCH'} ({len(srows)} vs {len(drows)})", flush=True)
        if not ok:
            bad.append(name)
    except Exception as e:
        print(f"{name}: ERROR {type(e).__name__}: {e}", flush=True)
        bad.append(name)

print("BAD:", bad)
sys.exit(1 if bad else 0)
