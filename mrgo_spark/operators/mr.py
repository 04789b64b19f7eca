"""MapReduce compatibility layer: the reference's pluggable-UDF API.

The reference's central surface (SURVEY §2.5 "UDF/UDAF/UDTF") is a
two-function job contract loaded as Go plugins:

    Map(filename string, contents string) []KeyValue
    Reduce(key string, values []string) string

(reference main/mrworker.go:37-54, main/mrsequential.go:96-113).
``MRJob`` keeps that contract for plain Python callables and executes
it Spark-first:

    read → flatMap(map_fn) → repartitionAndSortWithinPartitions
         → per-partition run-length group → reduce_fn

which is exactly the reference pipeline (worker.go:60-189) with the
master's scheduling/shuffle machinery replaced by Spark's scheduler
and shuffle service (SURVEY §3.1). This is the one deliberately
RDD-based operator in the engine — the contract is per-partition
imperative by definition; the DataFrame-native apps in ``mrapps.py``
are the fast path and hash-match these results (tests/test_mr.py).

Fault tolerance: task retry/speculation replaces the reference's
10 s straggler timeout + worker invalidation (mr/master.go:116-134);
verified by the chaos test in tests/test_mr.py.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

MapFn = Callable[[str, str], Iterable[tuple[str, str]]]
ReduceFn = Callable[[str, list[str]], str]

N_REDUCE_DEFAULT = 10  # reference main/mrmaster.go:26


class MRJob:
    """A (map_fn, reduce_fn, n_reduce) job over (key, value) records.

    map_fn(key, value) -> iterable of (k, v) pairs   [the Map UDTF]
    reduce_fn(k, [v...]) -> str                      [the Reduce UDAF]

    Contract: the value list passed to reduce_fn is UNORDERED — the
    input widen/repartition makes within-key arrival order vary run
    to run, matching the reference, whose Reduce([]string) receives
    values in unspecified order (mr/worker.go:161-183 sorts by KEY
    only). An order-sensitive reduce_fn must sort its values itself.
    """

    def __init__(
        self,
        map_fn: MapFn,
        reduce_fn: ReduceFn,
        n_reduce: int = N_REDUCE_DEFAULT,
    ):
        self.map_fn = map_fn
        self.reduce_fn = reduce_fn
        self.n_reduce = n_reduce

    def run_kv(self, spark: SparkSession, records: Iterable[tuple[str, str]] | DataFrame) -> DataFrame:
        """Run over in-memory or DataFrame (key,value) input records."""
        if isinstance(records, DataFrame):
            rdd = records.rdd.map(lambda r: (str(r[0]), str(r[1])))
        else:
            rdd = spark.sparkContext.parallelize(list(records))
        return self._execute(spark, rdd)

    def run_files(self, spark: SparkSession, path: str) -> DataFrame:
        """Whole-file input: one map call per file, keyed by filename —
        the reference's input contract (mr/worker.go:68-78, one map
        task per file via wholeTextFiles)."""
        rdd = spark.sparkContext.wholeTextFiles(path)
        return self._execute(spark, rdd)

    def run_documents(self, documents: DataFrame) -> DataFrame:
        """Adapter for the documents fixture: doc_id is the filename."""
        rdd = documents.select("doc_id", "text").rdd.map(
            lambda r: (str(r[0]), r[1])
        )
        return self._execute(documents.sparkSession, rdd)

    def _execute(self, spark: SparkSession, rdd) -> DataFrame:
        map_fn, reduce_fn = self.map_fn, self.reduce_fn

        # The reference schedules one map task per input file and runs
        # them across all workers (mr/master.go:116-134); a degenerate
        # input partitioning (e.g. one single-row-group parquet file →
        # one partition) would serialize the Python map phase on one
        # core. Widen it to the cluster's parallelism first — a cheap
        # redistribution of raw input vs. an idle map phase. No-op
        # whenever the input already arrives as ≥cores splits, which
        # is the normal case at scale.
        target = spark.sparkContext.defaultParallelism
        if rdd.getNumPartitions() < target:
            rdd = rdd.repartition(target)

        def do_map(kv: tuple[str, str]) -> Iterator[tuple[str, str]]:
            yield from map_fn(kv[0], kv[1])

        def do_reduce(part: Iterator[tuple[str, str]]) -> Iterator[tuple[str, str]]:
            # Run-length group over the sorted partition — the
            # reference's reduce loop (mr/worker.go:161-183).
            cur_key, vals = None, []
            for k, v in part:
                if k != cur_key:
                    if cur_key is not None:
                        yield cur_key, reduce_fn(cur_key, vals)
                    cur_key, vals = k, []
                vals.append(v)
            if cur_key is not None:
                yield cur_key, reduce_fn(cur_key, vals)

        from pyspark.rdd import portable_hash

        reduced = (
            rdd.flatMap(do_map)
            .repartitionAndSortWithinPartitions(
                numPartitions=self.n_reduce,
                # portable_hash is stable across worker processes
                # (builtin hash depends on PYTHONHASHSEED being pinned);
                # co-location ≙ the reference's ihash(key)%nReduce
                partitionFunc=portable_hash,
            )
            .mapPartitions(do_reduce, preservesPartitioning=True)
        )
        return spark.createDataFrame(reduced, "key string, value string")


# ---- built-in apps on the MRJob contract (reference mrapps/) -------------


def wc_map(_key: str, contents: str) -> Iterator[tuple[str, str]]:
    """mrapps/wc.go:24-36 — emit (word, "1") per ASCII-letter token."""
    import re

    for w in re.split("[^A-Za-z]+", contents):
        if w:
            yield w, "1"


def wc_reduce(_key: str, values: list[str]) -> str:
    """mrapps/wc.go:44-47 — count of occurrences."""
    return str(len(values))


def indexer_map(key: str, contents: str) -> Iterator[tuple[str, str]]:
    """mrapps/indexer.go:22-33 — per-doc distinct words → (word, doc)."""
    import re

    seen = set()
    for w in re.split("[^A-Za-z]+", contents):
        if w and w not in seen:
            seen.add(w)
            yield w, key


def indexer_reduce(_key: str, values: list[str]) -> str:
    """mrapps/indexer.go:38-41 — "<n> <doc1>,<doc2>" sorted."""
    vs = sorted(values)
    return f"{len(vs)} {','.join(vs)}"


def metadata_map(key: str, contents: str) -> Iterator[tuple[str, str]]:
    """mrapps/crash.go:37-46 — per-file metadata pairs: a=file name,
    b=len(file name), c=len(contents), d=literal "xyzzy"."""
    yield "a", key
    yield "b", str(len(key))
    yield "c", str(len(contents))
    yield "d", "xyzzy"


def sorted_concat_reduce(_key: str, values: list[str]) -> str:
    """mrapps/crash.go:48-58 — sort values, space-join."""
    return " ".join(sorted(values))
