"""Structured Streaming: batch/stream agreement + stateful fold."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from mrgo_spark.operators import kv
from mrgo_spark.sources.tables import load_table
from mrgo_spark.streaming import stream_ops

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def events_stream(spark, tmp_path):
    # file-source streams read a directory; stage the single fixture file
    d = tmp_path / "events_dir"
    d.mkdir()
    os.symlink(SF + "/events.parquet", d / "events.parquet")
    return stream_ops.read_events_stream(spark, str(d))


def test_tumbling_counts_match_batch(spark, events_stream):
    out = stream_ops.tumbling_counts(events_stream)
    stream_ops.run_to_memory(out, "tumbling_out", output_mode="update")
    got = {
        (r.hour_start, r.event_type): (r.n, round(r.total_value, 6))
        for r in spark.sql("SELECT * FROM tumbling_out").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("hour_start"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .collect()
    )
    want = {
        (r.hour_start, r.event_type): (r.n, round(r.total_value, 6)) for r in batch
    }
    assert got == want


def test_session_window_count_matches_batch_sessionize(spark, events_stream):
    """Total session count from streaming session_window equals the
    batch lag/cumsum sessionization (same 30 min gap)."""
    out = stream_ops.session_windows(events_stream, gap="30 minutes")
    # session-window aggs don't support update mode
    stream_ops.run_to_memory(out, "sess_out", output_mode="complete")
    n_stream = spark.sql(
        "SELECT COUNT(*) AS n FROM sess_out"
    ).collect()[0].n

    from mrgo_spark.operators.queries_relational import q_sessionize

    n_batch = (
        q_sessionize(spark, SF).agg(F.sum("n_sessions").alias("s")).collect()[0].s
    )
    assert n_stream == n_batch


def test_streaming_fold_matches_batch_fold(spark, tmp_path):
    """O21: streaming applyInPandasWithState state == batch fold state
    (the op-log is written without retransmissions: dedup is a batch
    concern; the streaming fold consumes an exactly-once log)."""
    events = load_table(spark, SF, "events")
    oplog = kv.synth_oplog(events, dup_every=10**9)  # no duplicates
    path = str(tmp_path / "oplog")
    oplog.write.parquet(path)

    stream = spark.readStream.schema(stream_ops.OPLOG_SCHEMA).parquet(path)
    folded = stream_ops.streaming_fold(stream)
    stream_ops.run_to_memory(folded, "fold_out", output_mode="update")
    # update mode may emit a row per micro-batch; keep the last per key
    got = {
        r.key: r.state
        for r in spark.sql(
            """
            SELECT key, state FROM (
              SELECT *, row_number() OVER (PARTITION BY key ORDER BY n_ops DESC) rn
              FROM fold_out
            ) WHERE rn = 1
            """
        ).collect()
    }
    want = {r.key: r.state for r in kv.fold_state(oplog).collect()}
    assert got == want


def test_sliding_avg_matches_batch(spark, events_stream):
    out = stream_ops.sliding_avg(events_stream, window="1 hour", slide="30 minutes")
    stream_ops.run_to_memory(out, "sliding_out", output_mode="update")
    got = {
        (r.win_start, r.event_type): (round(r.avg_value, 6), r.n)
        for r in spark.sql("SELECT * FROM sliding_out").collect()
    }
    batch = (
        load_table(spark, SF, "events")
        .groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"), "event_type")
        .agg(F.avg("value").alias("avg_value"), F.count("*").alias("n"))
        .collect()
    )
    want = {
        (r.w.start, r.event_type): (round(r.avg_value, 6), r.n) for r in batch
    }
    assert got == want
