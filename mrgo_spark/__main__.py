"""CLI entry point — the reference's binary surface as one command.

The reference runs jobs via ``mrmaster pg-*.txt`` + N ``mrworker
app.so`` processes, or sequentially via ``mrsequential app.so files``
(reference main/; SURVEY §3.1-3.2). Spark's scheduler replaces the
process topology, so one command covers both:

    python -m mrgo_spark --app wc --input <dir> --output <dir> \
        [--n-reduce 10] [--master local[8]]

``--app`` takes a built-in name (wc, indexer, sorted-concat) or a
path to a user Python file defining ``Map(filename, contents)`` and
``Reduce(key, values)`` — the reference's plugin contract
(main/mrworker.go:37-54 loads Map/Reduce from an .so; here the
"plugin" is a .py file). Output is the reference's golden
"key value" text format (mr-out style).
"""

from __future__ import annotations

import argparse
import sys

from .operators import mr
from .session import get_spark
from .sources import sinks

APPS = {
    "wc": (mr.wc_map, mr.wc_reduce),
    "indexer": (mr.indexer_map, mr.indexer_reduce),
    "sorted-concat": (mr.metadata_map, mr.sorted_concat_reduce),
}


def load_app(spec: str) -> tuple[mr.MapFn, mr.ReduceFn]:
    """Resolve ``--app``: a built-in name, or a ``.py`` file exposing
    ``Map``/``Reduce`` (mrworker.go:37-54's loadPlugin contract).

    The user file is exec'd into an anonymous namespace NOT registered
    in sys.modules, so cloudpickle serializes the functions by value —
    executors never need the file on their own PYTHONPATH (the
    reference ships the .so to every worker by hand; here the closure
    ships through the task serializer).
    """
    if spec in APPS:
        return APPS[spec]
    if not spec.endswith(".py"):
        raise SystemExit(
            f"unknown app {spec!r}: use one of {sorted(APPS)} or a .py file "
            "defining Map and Reduce"
        )
    with open(spec) as f:
        source = f.read()
    ns: dict = {}
    exec(compile(source, spec, "exec"), ns)  # noqa: S102 — the plugin contract
    try:
        return ns["Map"], ns["Reduce"]
    except KeyError as e:
        raise SystemExit(f"{spec} must define Map(filename, contents) "
                         f"and Reduce(key, values): missing {e}")


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mrgo_spark")
    ap.add_argument(
        "--app",
        required=True,
        help=f"built-in app ({', '.join(sorted(APPS))}) or path to a .py "
        "file defining Map and Reduce",
    )
    ap.add_argument("--input", required=True, help="input directory of text files")
    ap.add_argument("--output", required=True, help="output directory (mr-out text)")
    ap.add_argument("--n-reduce", type=int, default=mr.N_REDUCE_DEFAULT)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    map_fn, reduce_fn = load_app(args.app)
    app_label = args.app if args.app in APPS else "plugin"
    spark = get_spark(app_name=f"mrgo_{app_label}", master=args.master)
    job = mr.MRJob(map_fn, reduce_fn, n_reduce=args.n_reduce)
    out = job.run_files(spark, args.input)
    sinks.write_mr_text(out, args.output, n_out=args.n_reduce)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
