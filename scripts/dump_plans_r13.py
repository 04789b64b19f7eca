"""Dump .explain("formatted") for named declared queries into
plans/r13/<query>_<suffix>.txt — the optimization round's
before/after plan evidence (OPTIMIZATION_r13.md references these).

Usage: python scripts/dump_plans_r13.py <before|after> <query> [query ...]
       python scripts/dump_plans_r13.py <before|after> --bench-extra <name> ...

Plain mode resolves names through the declared registry. For bench
entries that are not declared queries (e.g. the @index serve paths)
use the helpers in this file from a REPL instead.
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from mrgo_spark.registry import load  # noqa: E402
from mrgo_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"


def explain_str(df) -> str:
    return (
        df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        ).strip()
    )


def dump(df, name: str, suffix: str) -> Path:
    out = REPO / "plans" / "r13"
    out.mkdir(parents=True, exist_ok=True)
    p = out / f"{name}_{suffix}.txt"
    p.write_text(explain_str(df) + "\n")
    return p


def main() -> None:
    suffix = sys.argv[1]
    assert suffix in ("before", "after"), suffix
    names = sys.argv[2:]
    spark = get_spark(app_name="dump_plans_r13")
    queries, _ = load()
    for name in names:
        df = queries[name](spark, SF_DIR)
        p = dump(df, name, suffix)
        print(f"wrote {p}")


if __name__ == "__main__":
    main()
