"""Unit/property tests for training-data pipeline operators
(operators/pipeline.py): split stability, chunk reassembly, scrub."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrgo_spark.functions.text import ascii_tokens
from mrgo_spark.operators import pipeline
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_dataset_split_stable_under_corpus_growth(spark):
    """The core contract: assignment depends only on the id, so
    splitting a subset and the full corpus must agree on shared ids."""
    docs = load_table(spark, SF, "documents")
    full = {r.doc_id: r.split for r in pipeline.dataset_split(docs).collect()}
    subset = docs.filter(F.col("doc_id") % 3 == 0)
    sub = {r.doc_id: r.split for r in pipeline.dataset_split(subset).collect()}
    assert sub == {k: v for k, v in full.items() if k % 3 == 0}
    # rough proportions at 80/10/10 (n≈50 at sf0.001 → loose bounds)
    n = len(full)
    train = sum(1 for v in full.values() if v == "train")
    assert 0.6 * n <= train <= 0.95 * n


def test_dataset_split_partitioning_invariant(spark):
    docs = load_table(spark, SF, "documents")
    a = pipeline.dataset_split(docs).collect()
    b = pipeline.dataset_split(docs.repartition(7, "text")).collect()
    assert {(r.doc_id, r.split) for r in a} == {(r.doc_id, r.split) for r in b}


def test_mixture_sample_rate_zero_and_full(spark):
    docs = load_table(spark, SF, "documents")
    assert pipeline.mixture_sample(docs, F.lit(0)).count() == 0
    assert pipeline.mixture_sample(docs, F.lit(1000)).count() == docs.count()


def test_sequence_chunks_reassemble(spark):
    """Chunk sizes must partition the token count: all chunks full
    except possibly the last, and sizes sum to the doc's token count."""
    docs = load_table(spark, SF, "documents")
    n_toks = {
        r.doc_id: r.n
        for r in docs.select(
            "doc_id", F.size(ascii_tokens("text", lowercase=True)).alias("n")
        ).collect()
    }
    chunks = pipeline.sequence_chunks(docs, chunk_size=32).collect()
    by_doc: dict[int, list] = {}
    for r in chunks:
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in by_doc.items():
        rows.sort(key=lambda r: r.chunk_id)
        assert [r.chunk_id for r in rows] == list(range(len(rows)))
        assert sum(r.n_tokens for r in rows) == n_toks[doc_id]
        assert all(r.n_tokens == 32 for r in rows[:-1])
        assert 1 <= rows[-1].n_tokens <= 32
    assert set(by_doc) == {d for d, n in n_toks.items() if n > 0}


def test_pii_scrub_counts_and_idempotence(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at a.b+c@example.org or +1-555-0100 today"),
            (2, "no pii here"),
            (3, "x@y.io and z@w.co"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in pipeline.pii_scrub(df).collect()}
    assert (out[1].n_emails, out[1].n_phones) == (1, 1)
    assert (out[2].n_emails, out[2].n_phones) == (0, 0)
    assert out[2].removed_chars == 0
    assert out[3].n_emails == 2
    # scrubbing already-scrubbed text is a no-op (replacement tokens
    # don't re-match the patterns)
    clean = df.select(
        "doc_id",
        F.regexp_replace(
            F.regexp_replace("text", pipeline.EMAIL_RE, "<EMAIL>"),
            pipeline.PHONE_RE,
            "<PHONE>",
        ).alias("text"),
    )
    again = {r.doc_id: r for r in pipeline.pii_scrub(clean).collect()}
    assert all(r.n_emails == 0 and r.n_phones == 0 for r in again.values())


def test_sequence_pack_concat_and_cut(spark):
    """Within one pack group, offsets are contiguous in id order, cuts
    fall every `budget` tokens, and span counts are right."""
    from mrgo_spark.operators.pipeline import sequence_pack

    docs = spark.createDataFrame(
        [(i, " ".join(["tok"] * n)) for i, n in [(1, 60), (2, 60), (3, 10), (4, 100)]],
        "doc_id long, text string",
    )
    rows = {
        r.doc_id: r
        for r in sequence_pack(docs, budget=64, n_groups=1).collect()
    }
    assert rows[1].tok_offset == 0 and rows[1].seq_id == 0 and rows[1].seq_pos == 0
    assert rows[1].n_seqs == 1  # tokens 0-59 fit sequence 0
    assert rows[2].tok_offset == 60 and rows[2].seq_id == 0 and rows[2].seq_pos == 60
    assert rows[2].n_seqs == 2  # 60..119 spans the 64 cut
    assert rows[3].tok_offset == 120 and rows[3].seq_id == 1
    # tokens 130..229: starts in seq 2 (128..191), crosses the 192 cut
    assert rows[4].tok_offset == 130 and rows[4].seq_id == 2 and rows[4].n_seqs == 2
    total = sum(r.n_tokens for r in rows.values())
    assert total == 230


def test_sequence_pack_group_stability(spark):
    """Adding documents never changes existing docs' groups (md5
    stability) and empty docs are dropped."""
    from mrgo_spark.operators.pipeline import sequence_pack

    small = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "d e")], "doc_id long, text string"
    )
    grown = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "d e"), (9, "x y z")],
        "doc_id long, text string",
    )
    g1 = {r.doc_id: r.pack_group for r in sequence_pack(small).collect()}
    g2 = {r.doc_id: r.pack_group for r in sequence_pack(grown).collect()}
    assert 2 not in g1 and 2 not in g2
    for d in g1:
        assert g1[d] == g2[d]
