"""Declared queries: MapReduce application surface (SURVEY §2.2).

Oracle notes: tokenization is the ASCII variant ``[^A-Za-z]+``
(SURVEY §7.3); DuckDB's ``string_split_regex`` and Spark's
``F.split`` agree on it, and both sides drop empty tokens.
"""

from __future__ import annotations

from ..registry import declare
from ..sources.tables import load_table
from . import mrapps

_TOK = """
    SELECT CAST(doc_id AS VARCHAR) AS doc,
           UNNEST(string_split_regex(text, '[^A-Za-z]+')) AS word
    FROM documents
"""


@declare(
    "wordcount",
    f"""
    SELECT word, COUNT(*) AS cnt
    FROM ({_TOK}) WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount(spark, sf_dir):
    """O12+O13 — reference mrapps/wc.go:24-47."""
    return mrapps.word_count(load_table(spark, sf_dir, "documents"))


@declare(
    "wordcount_unicode",
    r"""
    SELECT word, COUNT(*) AS cnt
    FROM (SELECT UNNEST(string_split_regex(text, '[^\p{L}]+')) AS word
          FROM documents)
    WHERE word <> ''
    GROUP BY word
    """,
)
def q_wordcount_unicode(spark, sf_dir):
    """O12 Unicode variant — the reference's actual rune classes
    (mrapps/wc.go:26-29 unicode.IsLetter). Java's and RE2's \\p{L}
    agree with Go's category-L tables on every probed script (Latin-1,
    CJK, Hangul, Greek/Cyrillic, combining marks, supplementary-plane
    letters; tests/test_properties.py), so this is oracle-declarable."""
    return mrapps.word_count_unicode(load_table(spark, sf_dir, "documents"))


@declare(
    "inverted_index",
    f"""
    WITH tok AS (
        SELECT DISTINCT doc, word FROM ({_TOK}) WHERE word <> ''
    )
    SELECT word,
           COUNT(*) AS n_docs,
           CONCAT(CAST(COUNT(*) AS VARCHAR), ' ',
                  string_agg(doc, ',' ORDER BY doc)) AS posting
    FROM tok
    GROUP BY word
    """,
)
def q_inverted_index(spark, sf_dir):
    """O14 — reference mrapps/indexer.go:22-41."""
    return mrapps.inverted_index(load_table(spark, sf_dir, "documents"))


@declare(
    "sorted_concat",
    """
    SELECT lang AS key,
           string_agg(CAST(doc_id AS VARCHAR), ' '
                      ORDER BY CAST(doc_id AS VARCHAR)) AS vals
    FROM documents
    GROUP BY lang
    """,
)
def q_sorted_concat(spark, sf_dir):
    """O15 — reference mrapps/crash.go:48-58 (sorted space-join)."""
    return mrapps.sorted_concat(
        load_table(spark, sf_dir, "documents"), key="lang", value="doc_id"
    )


@declare(
    "file_metadata",
    """
    SELECT CAST(doc_id AS VARCHAR) AS doc, 'a' AS mkey,
           CAST(doc_id AS VARCHAR) AS mvalue FROM documents
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'b',
           CAST(length(CAST(doc_id AS VARCHAR)) AS VARCHAR) FROM documents
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'c',
           CAST(length(text) AS VARCHAR) FROM documents
    UNION ALL
    SELECT CAST(doc_id AS VARCHAR), 'd', 'xyzzy' FROM documents
    """,
)
def q_file_metadata(spark, sf_dir):
    """O16 — reference mrapps/crash.go:37-46."""
    return mrapps.file_metadata(load_table(spark, sf_dir, "documents"))


@declare(
    "file_scan_stats",
    """
    SELECT 'documents.parquet' AS file_name, COUNT(*) AS n_rows,
           MIN(doc_id) AS min_key, MAX(doc_id) AS max_key FROM documents
    UNION ALL
    SELECT 'orders.parquet', COUNT(*), MIN(o_orderkey), MAX(o_orderkey)
    FROM orders
    UNION ALL
    SELECT 'customer.parquet', COUNT(*), MIN(c_custkey), MAX(c_custkey)
    FROM customer
    UNION ALL
    SELECT 'part.parquet', COUNT(*), MIN(p_partkey), MAX(p_partkey)
    FROM part
    """,
)
def q_file_scan_stats(spark, sf_dir):
    """O1 — reference mr/worker.go:68-78, mr/master.go:395-399 (one
    map task per input file, filename as the map key). The Spark side
    derives file_name from input_file_name() ON THE SCAN — the oracle
    pins the expected basenames and per-file stats, so misrouted or
    partial file reads mismatch. Single-file-per-table fixtures make
    the oracle's literal basenames exact; a multi-file table would
    (correctly) emit one row per file on the Spark side."""
    return mrapps.file_scan_stats(
        [
            (load_table(spark, sf_dir, "documents"), "doc_id"),
            (load_table(spark, sf_dir, "orders"), "o_orderkey"),
            (load_table(spark, sf_dir, "customer"), "c_custkey"),
            (load_table(spark, sf_dir, "part"), "p_partkey"),
        ]
    )
