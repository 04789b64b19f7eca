"""End-to-end ingestion composition (r13, VERDICT_r12 #7): one corpus
driven through the FULL chain — stream → incremental dedup → tiered
BM25 ingest + ANN ingest → hybrid serve — with a query RESTART in the
middle and a redelivered batch (the r12 chaos recipe), pinned
exactly-once end to end: the served hybrid ranking equals a batch
build over the post-dedup corpus.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from mrgo_spark.operators import similarity
from mrgo_spark.operators.retrieval import BM25Index, rrf_fuse
from mrgo_spark.streaming import stream_ops

DOC_SCHEMA = "doc_id long, text string, embedding array<double>"


def _vec(i: int) -> list[float]:
    # deterministic, distinct, non-degenerate 4-dim vectors
    return [
        float((i * 7 + 3) % 11),
        float((i * 5 + 1) % 13),
        float((i * 3 + 2) % 7 + 1),
        float(i % 5 + 1),
    ]


def _doc(i: int, text: str) -> tuple:
    return (i, text, _vec(i))


BASE = [
    _doc(0, "anchor alpha words stable"),
    _doc(1, "anchor beta words stable"),
    _doc(2, "anchor gamma words stable"),
    _doc(3, "anchor delta words stable"),
]
F0 = [
    _doc(10, "fresh epsilon content one"),
    _doc(11, "fresh zeta content two"),
    _doc(12, "stable anchor words alpha"),   # lake dup of 0 (reordered)
    _doc(13, "two content zeta fresh"),      # within-batch dup of 11
]
F1 = [
    _doc(20, "fresh eta content three"),
    _doc(21, "fresh zeta content two"),      # cross-batch dup of 11
]
F2 = [
    _doc(30, "fresh theta content four"),
    _doc(31, "three content eta fresh"),     # cross-batch dup of 20
]
F3 = [
    _doc(40, "fresh iota content five epsilon"),
]
SURVIVOR_IDS = [0, 1, 2, 3, 10, 11, 20, 30, 40]


def _write_file(spark, d, name, rows):
    stage = d.parent / f"_stage_{name}"
    spark.createDataFrame(rows, DOC_SCHEMA).coalesce(1).write.parquet(
        str(stage)
    )
    os.rename(next(stage.glob("part-*.parquet")), d / f"{name}.parquet")


def _hybrid(spark, lex_index, ann_index, n_probe, k=10):
    qt = spark.createDataFrame(
        [(1, "fresh"), (1, "content"), (2, "anchor"), (2, "stable"),
         (3, "epsilon"), (3, "two")],
        "query_id long, term string",
    )
    qv = spark.createDataFrame(
        [(1, _vec(10)), (2, _vec(0)), (3, _vec(40))],
        "query_id long, embedding array<double>",
    ).select(F.col("query_id").alias("vec_id"), "embedding")
    lex = lex_index.query(qt, k=k).select("query_id", "doc_id", "rank")
    sem = ann_index.query(qv, k=k, n_probe=n_probe).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), "rank"
    )
    fused = rrf_fuse([lex, sem], k=k)
    return sorted(map(tuple, fused.collect()))


def test_ingestion_pipeline_end_to_end(spark, tmp_path):
    base = spark.createDataFrame(BASE, DOC_SCHEMA)
    bm_base = BM25Index.build(
        base.select("doc_id", "text"), str(tmp_path / "bm_base")
    )
    ann = similarity.IVFIndex.build(
        base.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "ann"),
        n_cells=2,
    )
    # seed the fingerprint lake with the base corpus
    from mrgo_spark.operators import dedup

    lake_path = str(tmp_path / "lake_fp")
    base.select(
        dedup.fingerprint("text").alias("_fp"),
        F.col("doc_id").alias("min_id"),
    ).groupBy("_fp").agg(F.min("min_id").alias("min_id")).write.parquet(
        lake_path
    )

    d = tmp_path / "stream_in"
    d.mkdir()
    _write_file(spark, d, "f0", F0)

    def start():
        ds = (
            spark.readStream.schema(DOC_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(d))
        )
        builder, holder = stream_ops.ingest_corpus_foreach_batch(
            ds,
            bm_base,
            str(tmp_path / "bm_work"),
            ann,
            lake_path,
        )
        q = (
            builder.trigger(availableNow=True)
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.awaitTermination(300)
        return holder

    h1 = start()
    # f0: 12 (lake dup) and 13 (within-batch dup) dropped
    assert h1["batches"][-1]["n_new"] == 2

    # RESTART #1: new file arrives, a fresh query resumes from the
    # checkpoint (committed batches are skipped)
    _write_file(spark, d, "f1", F1)
    h2 = start()
    assert [b["n_new"] for b in h2["batches"]] == [1]  # only 20 lands

    def state(h):
        dl = sorted(r.doc_id for r in h["index"].doc_ids().collect())
        cells = sorted(
            r.neighbor_id
            for r in spark.read.parquet(
                str(tmp_path / "ann") + "/cells"
            ).collect()
        )
        lake = sorted(
            (r._fp, r.min_id)
            for r in spark.read.parquet(lake_path).collect()
        )
        return dl, cells, lake

    s_before = state(h2)
    # REDELIVERY (crash between ingest and offset commit): replay f1
    # through the direct per-batch entry — end state must not change
    h2["_proc"](spark.createDataFrame(F1, DOC_SCHEMA), 99)
    assert state(h2) == s_before
    assert h2["batches"][-1]["n_new"] == 0  # all dups vs the lake

    # RESTART #2: two more files, one run
    _write_file(spark, d, "f2", F2)
    _write_file(spark, d, "f3", F3)
    h3 = start()
    assert [b["n_new"] for b in h3["batches"]] == [1, 1]

    # exactly-once: both indexes and the lake hold precisely the
    # post-dedup corpus
    dl, cells, lake = state(h3)
    # base docs were in the base BM25 index; doc_ids() covers the set
    assert dl == SURVIVOR_IDS
    assert cells == SURVIVOR_IDS
    assert len(lake) == len(SURVIVOR_IDS)

    # served hybrid ranking == a BATCH build over the post-dedup
    # corpus (semantic legs at n_probe = n_cells ≡ exact, so centroid
    # differences between the grown and rebuilt index cannot matter)
    survivors = [
        r for r in BASE + F0 + F1 + F2 + F3 if r[0] in SURVIVOR_IDS
    ]
    ref_docs = spark.createDataFrame(survivors, DOC_SCHEMA)
    ref_bm = BM25Index.build(
        ref_docs.select("doc_id", "text"), str(tmp_path / "bm_ref")
    )
    ref_ann = similarity.IVFIndex.build(
        ref_docs.select(F.col("doc_id").alias("vec_id"), "embedding"),
        str(tmp_path / "ann_ref"),
        n_cells=2,
    )
    got = _hybrid(spark, h3["index"], ann, n_probe=2)
    want = _hybrid(spark, ref_bm, ref_ann, n_probe=2)
    assert got == want and len(got) > 0
