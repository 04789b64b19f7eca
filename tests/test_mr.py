"""MR compatibility layer: golden parity with the DataFrame-native
apps (the reference's differential-vs-sequential-oracle strategy,
SURVEY §5.1) plus a chaos test for task re-execution (§5.3)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mrgo_spark.operators import mr, mrapps
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _kv_dict(df):
    return {r[0]: r[1] for r in df.collect()}


def test_mrjob_wc_matches_dataframe_wordcount(spark):
    docs = load_table(spark, SF, "documents")
    job = mr.MRJob(mr.wc_map, mr.wc_reduce)
    got = _kv_dict(job.run_documents(docs))
    want = {
        r.word: str(r.cnt) for r in mrapps.word_count(docs).collect()
    }
    assert got == want


def test_mrjob_indexer_matches_dataframe(spark):
    docs = load_table(spark, SF, "documents")
    job = mr.MRJob(mr.indexer_map, mr.indexer_reduce)
    got = _kv_dict(job.run_documents(docs))
    want = {r.word: r.posting for r in mrapps.inverted_index(docs).collect()}
    assert got == want


def test_mrjob_sorted_concat_deterministic(spark):
    """Reduce output must be arrival-order independent (the crash-test
    invariant, reference test-mr.sh:192-200): two runs with different
    partition counts produce identical results."""
    docs = load_table(spark, SF, "documents")

    def map_lang(_k, v):  # value = "lang:doc_id"
        lang, doc_id = v.split(":", 1)
        yield lang, doc_id

    pairs = docs.select(
        F.col("doc_id").cast("string"),
        F.concat_ws(":", "lang", F.col("doc_id").cast("string")),
    )
    a = _kv_dict(mr.MRJob(map_lang, mr.sorted_concat_reduce, n_reduce=2).run_kv(spark, pairs))
    b = _kv_dict(mr.MRJob(map_lang, mr.sorted_concat_reduce, n_reduce=10).run_kv(spark, pairs))
    assert a == b and len(a) == 5


def test_task_retry_produces_identical_output(spark):
    """Chaos analog of mrapps/crash.go: a map UDF that fails on the
    first attempt of some tasks. With task retry (master local[N,2])
    Spark re-executes and the output equals the no-crash run —
    the reference's fault-tolerance observable (SURVEY §0)."""
    docs = load_table(spark, SF, "documents")

    marker_dir = "/tmp/mrgo_chaos_markers"
    os.makedirs(marker_dir, exist_ok=True)
    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))

    def chaotic_map(key: str, contents: str):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() == 0 and ctx.attemptNumber() == 0:
            marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected chaos: first attempt dies")
        yield from mr.wc_map(key, contents)

    golden = _kv_dict(mr.MRJob(mr.wc_map, mr.wc_reduce).run_documents(docs))
    chaotic = _kv_dict(mr.MRJob(chaotic_map, mr.wc_reduce).run_documents(docs))
    assert chaotic == golden
    assert os.listdir(marker_dir), "chaos never triggered"


def test_tasks_execute_in_parallel(spark):
    """mtiming analog (reference mrapps/mtiming.go + test-mr.sh:101-151):
    assert >=2-way task overlap by recording per-task execution
    intervals and checking for concurrency."""
    import time

    sc = spark.sparkContext

    def timed_partition(idx, it):
        start = time.time()
        n = sum(1 for _ in it)
        time.sleep(0.3)
        yield (idx, start, time.time(), n)

    intervals = (
        sc.parallelize(range(8), 8).mapPartitionsWithIndex(timed_partition).collect()
    )
    overlaps = 0
    for i, (_, s1, e1, _) in enumerate(intervals):
        for _, s2, e2, _ in intervals[i + 1 :]:
            if s1 < e2 and s2 < e1:
                overlaps += 1
    assert overlaps >= 1, f"no concurrent task execution observed: {intervals}"


def test_task_retry_in_reduce_phase(spark):
    """Chaos in the REDUCE phase (reference re-runs reducers too,
    mr/master.go:216-235): first attempt of one reduce task dies,
    retry yields output identical to the clean run."""
    docs = load_table(spark, SF, "documents")
    marker_dir = "/tmp/mrgo_chaos_markers_reduce"
    os.makedirs(marker_dir, exist_ok=True)
    for f in os.listdir(marker_dir):
        os.unlink(os.path.join(marker_dir, f))

    def chaotic_reduce(key: str, values: list[str]) -> str:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        if ctx is not None and ctx.partitionId() == 1 and ctx.attemptNumber() == 0:
            marker = os.path.join(marker_dir, f"p{ctx.partitionId()}")
            if not os.path.exists(marker):
                open(marker, "w").close()
                raise RuntimeError("injected chaos: reducer first attempt dies")
        return mr.wc_reduce(key, values)

    golden = _kv_dict(mr.MRJob(mr.wc_map, mr.wc_reduce).run_documents(docs))
    chaotic = _kv_dict(mr.MRJob(mr.wc_map, chaotic_reduce).run_documents(docs))
    assert chaotic == golden
    assert os.listdir(marker_dir), "reduce chaos never triggered"


def test_reduce_phase_parallelism(spark, tmp_path):
    """rtiming analog (reference mrapps/rtiming.go:20-63,
    test-mr.sh:141-149): assert >=2-way overlap specifically among
    REDUCE tasks — i.e. across the shuffle boundary — not just generic
    task overlap (mtiming, above). Each reduce task logs wall-clock
    timestamps per reduce_fn call and sleeps on its first call, so
    serial execution could not produce overlapping intervals.
    tmp_path (not a shared /tmp dir) so concurrent invocations can't
    collide; 0.5 s first-call sleep widens the overlap margin on a
    loaded box."""
    import time

    docs = load_table(spark, SF, "documents")
    log_dir = str(tmp_path / "rtiming")
    os.makedirs(log_dir, exist_ok=True)

    def timing_reduce(key: str, values: list[str]) -> str:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        path = os.path.join(log_dir, f"p{pid}")
        first = not os.path.exists(path)
        with open(path, "a") as fh:
            fh.write(f"{time.time()}\n")
        if first:
            time.sleep(0.5)
        with open(path, "a") as fh:
            fh.write(f"{time.time()}\n")
        return str(len(values))

    mr.MRJob(mr.wc_map, timing_reduce, n_reduce=8).run_documents(docs).count()

    intervals = []
    for fn in os.listdir(log_dir):
        ts = [float(x) for x in open(os.path.join(log_dir, fn))]
        intervals.append((min(ts), max(ts)))
    assert len(intervals) >= 2, f"expected >=2 reduce tasks, got {intervals}"
    overlaps = sum(
        1
        for i, (s1, e1) in enumerate(intervals)
        for s2, e2 in intervals[i + 1 :]
        if s1 < e2 and s2 < e1
    )
    assert overlaps >= 1, f"no reduce-phase overlap observed: {intervals}"
