"""CLI entry point — the reference's binary surface as one command.

The reference runs jobs via ``mrmaster pg-*.txt`` + N ``mrworker
app.so`` processes, or sequentially via ``mrsequential app.so files``
(reference main/; SURVEY §3.1-3.2). Spark's scheduler replaces the
process topology, so one command covers both:

    python -m mrgo_spark --app wc --input <dir> --output <dir> \
        [--n-reduce 10] [--master local[8]]

Apps are the built-in MR applications (wc, indexer, sorted-concat
over file lines keyed by filename). Output is the reference's golden
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
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="mrgo_spark")
    ap.add_argument("--app", choices=sorted(APPS), required=True)
    ap.add_argument("--input", required=True, help="input directory of text files")
    ap.add_argument("--output", required=True, help="output directory (mr-out text)")
    ap.add_argument("--n-reduce", type=int, default=mr.N_REDUCE_DEFAULT)
    ap.add_argument("--master", default=None)
    args = ap.parse_args(argv)

    spark = get_spark(app_name=f"mrgo_{args.app}", master=args.master)
    map_fn, reduce_fn = APPS[args.app]
    job = mr.MRJob(map_fn, reduce_fn, n_reduce=args.n_reduce)
    out = job.run_files(spark, args.input)
    sinks.write_mr_text(out, args.output, n_out=args.n_reduce)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
