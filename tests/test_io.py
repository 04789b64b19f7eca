"""IO surface: whole-file scan (O1), MR text sink (O9), format
round-trips (O4 JSON-lines, parquet, csv)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mrgo_spark.operators import mr
from mrgo_spark.sources import sinks
from mrgo_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_whole_file_scan_one_record_per_file(spark, tmp_path):
    """O1: one map input per file, value = entire contents
    (reference mr/worker.go:68-78)."""
    d = tmp_path / "books"
    d.mkdir()
    (d / "a.txt").write_text("The quick brown\nfox jumps")
    (d / "b.txt").write_text("pack my box")
    job = mr.MRJob(mr.wc_map, mr.wc_reduce)
    out = {r.key: r.value for r in job.run_files(spark, str(d)).collect()}
    assert out["quick"] == "1"
    assert out["my"] == "1"
    # 'fox' spans a newline boundary inside one file — whole-file
    # semantics keep it a single token stream
    assert out["fox"] == "1"


def test_mr_text_sink_roundtrip_and_format(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    from mrgo_spark.operators.mrapps import word_count

    wc = word_count(docs).select(
        F.col("word").alias("key"), F.col("cnt").cast("string").alias("value")
    )
    path = str(tmp_path / "mr-out")
    sinks.write_mr_text(wc, path)

    back = sinks.read_mr_text(spark, path)
    got = sorted((r.key, r.value) for r in back.collect())
    want = sorted((r.key, r.value) for r in wc.collect())
    assert got == want

    # format: every line is "key value" (reference worker.go:179)
    raw = spark.read.text(path).collect()
    assert all(" " in r.value for r in raw)


def test_jsonl_roundtrip(spark, tmp_path):
    df = load_table(spark, SF, "nation")
    path = str(tmp_path / "nation_jsonl")
    sinks.write_jsonl(df, path)
    back = spark.read.json(path)
    assert back.count() == df.count()
    assert set(back.columns) == set(df.columns)


def test_csv_roundtrip(spark, tmp_path):
    df = load_table(spark, SF, "region")
    path = str(tmp_path / "region_csv")
    sinks.write_csv(df, path)
    back = spark.read.option("header", True).csv(path)
    assert back.count() == df.count()


def test_parquet_partitioned_write(spark, tmp_path):
    df = load_table(spark, SF, "documents")
    path = str(tmp_path / "docs_parted")
    sinks.write_parquet(df, path, partition_by=["lang"])
    back = spark.read.parquet(path)
    assert back.count() == df.count()
    # partition pruning: lang filter must prune, not scan+filter
    from mrgo_spark import plans

    pruned = back.filter(F.col("lang") == "en")
    assert pruned.count() == df.filter("lang = 'en'").count()


def test_cli_wc_end_to_end(tmp_path):
    """python -m mrgo_spark --app wc ... (the reference's binary
    surface, SURVEY §3.1) — run in a subprocess, output must equal
    the sequential truth after global sort (test-mr.sh protocol)."""
    import subprocess
    import sys as _sys

    d = tmp_path / "books"
    d.mkdir()
    (d / "x.txt").write_text("to be or not to be")
    out = tmp_path / "out"
    r = subprocess.run(
        [
            _sys.executable, "-m", "mrgo_spark",
            "--app", "wc", "--input", str(d), "--output", str(out),
            "--n-reduce", "3", "--master", "local[2]",
        ],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        timeout=180,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    lines = sorted(
        line
        for f in out.glob("part-*")
        for line in f.read_text().splitlines()
        if line
    )
    assert lines == ["be 2", "not 1", "or 1", "to 2"]
