"""Streaming reorder/late-data chaos (VERDICT_r9 Missing #3): the
batch analog (chaos UDFs, task retry) covered crash-recovery but not
DELAYED/REORDERED micro-batch input vs watermark correctness — the
labrpc longReordering story (reference src/labrpc/labrpc.go:279-288)
applied to event time. Three legs:

- tumbling counts: late-but-within-watermark arrivals still land in
  their event-time windows (stream == batch over delivered rows), and
  a beyond-watermark straggler is DROPPED (the documented semantics,
  pinned so an accidental watermark change fails loudly);
- session windows: a late arrival MERGES into an already-emitted
  session (gap extension), final state == recomputed batch sessions;
- incremental dedup: verdicts under cross-batch reordering keep the
  one-'new'-per-fingerprint invariant with arrival-order (not id-
  order) first-seen, and the lake always wins.

Verification debt only — no engine code changes expected.
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import functions as F

from mrgo_spark.streaming import stream_ops

EVENTS_SCHEMA = "ts timestamp, event_type string, value double, user_id long"


def _t(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m, tzinfo=timezone.utc)


def _deliver(spark, tmp_path, build_stream, batches, name, mode="update"):
    """Write each batch as one parquet file, processing all available
    data between writes — deterministic micro-batch boundaries in
    DELIVERY order (which the test deliberately decouples from event
    time)."""
    d = tmp_path / f"{name}_stream"
    d.mkdir()

    def write(i, rows):
        df = spark.createDataFrame(rows, EVENTS_SCHEMA)
        stage = tmp_path / f"{name}_stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        os.rename(next(stage.glob("part-*.parquet")), d / f"b{i:03d}.parquet")

    write(0, batches[0])
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(str(d))
    q = (
        build_stream(stream)
        .writeStream.outputMode(mode)
        .format("memory")
        .queryName(name)
        .start()
    )
    q.processAllAvailable()
    for i, rows in enumerate(batches[1:], start=1):
        write(i, rows)
        q.processAllAvailable()
    q.stop()


def test_tumbling_counts_reordered_and_late(spark, tmp_path):
    """Within-watermark reordering is invisible to event-time windows;
    a beyond-watermark straggler is dropped, not misfiled."""
    batches = [
        # delivered 1st: mid-period events (advances watermark to 01:15)
        [
            (_t(2, 10), "x", 1.0, 1),
            (_t(2, 20), "x", 1.0, 1),
            (_t(3, 15), "y", 1.0, 2),
        ],
        # delivered 2nd: OLDER events, 1-2h late but within the 2h
        # watermark — must still land in their own windows
        [(_t(1, 30), "x", 1.0, 1), (_t(2, 5), "y", 1.0, 2)],
        # delivered 3rd: newest event (watermark -> 03:00) + an
        # in-watermark straggler for the 03:00 window
        [(_t(5, 0), "x", 1.0, 3), (_t(3, 40), "y", 1.0, 2)],
        # delivered 4th: BEYOND the watermark (01:45 window end 02:00
        # <= watermark 03:00) — dropped by contract
        [(_t(1, 45), "x", 99.0, 1)],
    ]
    _deliver(
        spark, tmp_path, stream_ops.tumbling_counts, batches, "chaos_tumble"
    )
    rows = spark.sql("SELECT * FROM chaos_tumble").collect()
    # update mode re-emits a row per (window, type) per batch; counts
    # only grow, so the final state is the max n per key
    got: dict = {}
    for r in rows:
        k = (r.hour_start.hour, r.event_type)
        got[k] = max(got.get(k, 0), r.n)
    delivered = [e for b in batches[:3] for e in b]  # batch 4 dropped
    want: dict = {}
    for ts, et, _v, _u in delivered:
        k = (ts.hour, et)
        want[k] = want.get(k, 0) + 1
    assert got == want
    # the dropped straggler specifically must NOT have bumped its window
    assert got[(1, "x")] == 1


def test_session_windows_late_arrival_merges_sessions(spark, tmp_path):
    """A late event inside the gap of an already-emitted session must
    extend/merge it — final sessions equal the batch recompute over
    everything delivered."""
    batches = [
        # user 1: two sessions 50 minutes apart; user 2: one event
        [
            (_t(2, 0), "x", 1.0, 1),
            (_t(3, 30), "x", 1.0, 1),
            (_t(2, 0), "x", 1.0, 2),
        ],
        # late arrival at 02:10 (within watermark): falls inside the
        # 30-minute gap after 02:00 — extends user 1's first session
        [(_t(2, 10), "x", 1.0, 1)],
    ]
    _deliver(
        spark,
        tmp_path,
        stream_ops.session_windows,
        batches,
        "chaos_sess",
        mode="complete",
    )
    got = {
        (r.user_id, r.sess_start.hour, r.sess_start.minute): r.n_events
        for r in spark.sql("SELECT * FROM chaos_sess").collect()
    }
    assert got == {(1, 2, 0): 2, (1, 3, 30): 1, (2, 2, 0): 1}


OPS_SCHEMA = "seq long, client long, reqid long, op string, key string, value string"


def _write_ops(spark, tmp_path, d, i, rows):
    df = spark.createDataFrame(rows, OPS_SCHEMA)
    stage = tmp_path / f"ops_stage{i}"
    df.coalesce(1).write.parquet(str(stage))
    os.rename(next(stage.glob("part-*.parquet")), d / f"b{i:03d}.parquet")


def test_transfer_serving_chaos_reorder_and_restart(spark, tmp_path):
    """VERDICT_r11 #3 (reference shardkv TestConcurrent/Challenge2
    under an unreliable net): migration interleaved with concurrent
    puts, delivered with CROSS-BATCH reordering (epoch-3 traffic
    before epoch-1) and a QUERY RESTART between batches. The
    recovered counters must equal the batch recompute over every
    delivered row, the unaffected-shard equality must hold in every
    row, and an epoch-3 key updated across the restart must carry
    run-1 state forward (n_in_transfer == 2 proves the state store
    recovered, not recounted)."""
    from mrgo_spark.operators import kv

    # epoch 3: shard 0 (key "2") moving, arrival off 80; shard 1
    # (key "3") unaffected. epoch 1: shard 1 moving, arrival off 160.
    batch_a = [
        (3010, 1, 1, "put", "2", "a"),  # gid2=owner, off 10 → in_transfer
        (3200, 1, 2, "put", "2", "b"),  # off 200 → served
        (3020, 0, 3, "put", "2", "c"),  # gid1 ≠ owner → wrong_group
        (3015, 2, 4, "put", "3", "d"),  # unaffected → served
    ]
    batch_b = [
        (1030, 1, 5, "put", "3", "e"),  # gid2 ≠ owner(1,1)=3 → wrong_group
        (1050, 2, 6, "put", "3", "f"),  # off 50 < 160 → in_transfer
        (1300, 2, 7, "put", "3", "g"),  # off 300 → served
        (1040, 2, 8, "put", "4", "h"),  # shard 2 unaffected → served
        (3030, 1, 9, "put", "2", "i"),  # epoch-3 straggler → in_transfer
    ]
    d = tmp_path / "xfer_stream"
    d.mkdir()
    ckpt = str(tmp_path / "xfer_ckpt")
    _write_ops(spark, tmp_path, d, 0, batch_a)

    emitted: list = []

    def start(name):
        # memory sink can't recover from a checkpoint — foreachBatch
        # can; update-mode emissions accumulate driver-side
        stream = spark.readStream.schema(OPS_SCHEMA).parquet(str(d))
        return (
            stream_ops.streaming_transfer_serving(stream)
            .writeStream.outputMode("update")
            .option("checkpointLocation", ckpt)
            .foreachBatch(lambda df, eid: emitted.extend(df.collect()))
            .queryName(name)
            .start()
        )

    q = start("chaos_xfer_a")
    q.processAllAvailable()
    q.stop()  # restart boundary
    q = start("chaos_xfer_b")
    _write_ops(spark, tmp_path, d, 1, batch_b)
    q.processAllAvailable()
    q.stop()
    # counters only grow → final state = per-key max over both runs'
    # update emissions
    got: dict = {}
    for r in emitted:
        k = (r.epoch, r.gid)
        prev = got.get(k)
        cur = (
            r.n_served, r.n_wrong_group, r.n_in_transfer,
            r.n_unaffected_req, r.n_unaffected_served,
        )
        got[k] = cur if prev is None else tuple(
            max(a, b) for a, b in zip(prev, cur)
        )
    want = {
        (r.epoch, r.gid): (
            r.n_served, r.n_wrong_group, r.n_in_transfer,
            r.n_unaffected_req, r.n_unaffected_served,
        )
        for r in kv.transfer_serving_counts(
            spark.createDataFrame(batch_a + batch_b, OPS_SCHEMA)
        ).collect()
    }
    assert got == want
    # Challenge2Unaffected under chaos: every row, both runs
    for (_e, _g), (_s, _w, _t, u_req, u_srv) in got.items():
        assert u_req == u_srv
    # state survived the restart: run-1's epoch-3 in_transfer (1) plus
    # the straggler (1) — a lost state store would re-emit 1, not 2
    assert got[(3, 2)][2] == 2


def test_handoff_gc_invariant_under_interleaved_replayed_delivery(
    spark, tmp_path
):
    """VERDICT_r11 #3, GC leg (reference TestChallenge1Concurrent):
    the handoff-GC obligations must be identical whether the op-log
    arrives in order, or interleaved across reordered batches WITH a
    replayed row (at-most-once dedup collapses it) and a sink
    restart between batches."""
    from mrgo_spark.operators import kv

    # routed writes under the rotation owner(s,e) = (s+e)%3+1:
    # gid must equal owner for the write to count toward the shard's
    # key population. key "2"→shard 0, "3"→1, "4"→2.
    rows = [
        (10, 0, 1, "put", "2", "a"),     # e0: owner(0,0)=1, client0→gid1 ✓
        (20, 1, 2, "put", "3", "b"),     # e0: owner(1,0)=2, gid2 ✓
        (1030, 1, 3, "put", "2", "c"),   # e1: owner(0,1)=2, gid2 ✓
        (1040, 2, 4, "append", "4", "d"),  # e1: owner(2,1)=3? (2+1)%3+1=1 ✗ unrouted
        (2050, 2, 5, "put", "4", "e"),   # e2: owner(2,2)=(2+2)%3+1=2? no → gid3? (2+2)%3=1→2; client2→gid3 ✗
        (2060, 0, 6, "put", "3", "f"),   # e2: owner(1,2)=(1+2)%3+1=1, gid1 ✓
    ]
    replay = (1030, 1, 3, "put", "2", "c")  # exact redelivery
    d = tmp_path / "gc_stream"
    d.mkdir()
    lake = str(tmp_path / "gc_lake")
    ckpt = str(tmp_path / "gc_ckpt")
    # reordered interleaving: later epochs first, replay in batch 2
    _write_ops(spark, tmp_path, d, 0, [rows[5], rows[2], rows[0]])

    def start():
        stream = spark.readStream.schema(OPS_SCHEMA).parquet(str(d))
        return (
            stream.writeStream.outputMode("append")
            .option("checkpointLocation", ckpt)
            .option("path", lake)
            .format("parquet")
            .start()
        )

    q = start()
    q.processAllAvailable()
    q.stop()  # restart boundary
    q = start()
    _write_ops(
        spark, tmp_path, d, 1, [rows[4], replay, rows[1], rows[3]]
    )
    q.processAllAvailable()
    q.stop()
    got = sorted(
        map(tuple, kv.handoff_gc_obligations(
            spark.read.parquet(lake)
        ).collect())
    )
    want = sorted(
        map(tuple, kv.handoff_gc_obligations(
            spark.createDataFrame(rows, OPS_SCHEMA)
        ).collect())
    )
    assert got == want and got


def test_incremental_dedup_invariants_under_reorder(spark, tmp_path):
    """Cross-batch reordered delivery: first-SEEN (arrival order)
    wins within the stream — not smallest id — the lake always wins,
    and every fingerprint has exactly one 'new' verdict."""
    lake = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "delta epsilon zeta")],
        "doc_id long, text string",
    )
    d = tmp_path / "docs_stream"
    d.mkdir()

    def write(i, rows):
        df = spark.createDataFrame(rows, "doc_id long, text string")
        stage = tmp_path / f"doc_stage{i}"
        df.coalesce(1).write.parquet(str(stage))
        os.rename(next(stage.glob("part-*.parquet")), d / f"b{i:03d}.parquet")

    # delivered FIRST: the high ids; 31 dupes the lake, 33 is fresh
    write(0, [(31, "alpha beta gamma"), (33, "eta theta iota")])
    stream = spark.readStream.schema("doc_id long, text string").parquet(
        str(d)
    )
    out = stream_ops.streaming_incremental_dedup(stream, lake)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("chaos_dedup")
        .start()
    )
    q.processAllAvailable()
    # delivered SECOND (reordered: smaller ids arrive later): 11 dups
    # 33's fingerprint within-stream, 12 dups the lake, 13 is fresh
    write(
        1,
        [
            (11, "eta theta iota"),
            (12, "delta epsilon zeta"),
            (13, "kappa lambda mu"),
        ],
    )
    q.processAllAvailable()
    q.stop()
    got = {
        r.doc_id: (r.verdict, r.match_id)
        for r in spark.sql("SELECT * FROM chaos_dedup").collect()
    }
    # lake wins, match = lake min id
    assert got[31] == ("dup_of_existing", 1)
    assert got[12] == ("dup_of_existing", 2)
    # arrival order wins within the stream: 33 (delivered first) is
    # 'new'; the SMALLER id 11 arriving later is the within-stream dup
    assert got[33] == ("new", None)
    assert got[11] == ("dup_within_stream", 33)
    assert got[13] == ("new", None)
    # exactly one 'new' per non-lake fingerprint
    news = [k for k, (v, _) in got.items() if v == "new"]
    assert sorted(news) == [13, 33]
