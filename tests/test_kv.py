"""Unit tests for the KV op-log engine (semantics + rebalancer)."""

from __future__ import annotations

import pytest

from mrgo_spark.operators import kv


def _oplog_df(spark, rows):
    return spark.createDataFrame(
        rows, "seq long, client long, reqid long, op string, key string, value string"
    )


def test_fold_put_replaces_and_append_concats(spark):
    rows = [
        (1, 1, 1, "put", "a", "A1"),
        (2, 1, 2, "append", "a", "+x"),
        (3, 1, 3, "put", "a", "A2"),  # replaces everything before
        (4, 1, 4, "append", "a", "+y"),
        (5, 2, 5, "append", "b", "B1"),  # append-before-put acts as put
    ]
    out = {r.key: r.state for r in kv.fold_state(_oplog_df(spark, rows)).collect()}
    assert out == {"a": "A2+y", "b": "B1"}


def test_fold_at_most_once_dedup(spark):
    rows = [
        (1, 1, 100, "append", "a", "X"),
        (9, 1, 100, "append", "a", "X"),  # duplicate delivery, same reqid
        (2, 1, 101, "append", "a", "Y"),
    ]
    out = {r.key: r.state for r in kv.fold_state(_oplog_df(spark, rows)).collect()}
    assert out == {"a": "XY"}


def test_get_sees_state_at_its_seq(spark):
    rows = [
        (1, 1, 1, "get", "a", None),  # missing key -> ""
        (2, 1, 2, "put", "a", "V"),
        (3, 1, 3, "get", "a", None),
        (4, 1, 4, "append", "a", "W"),
        (5, 1, 5, "get", "a", None),
        (6, 1, 6, "put", "a", "Z"),
        (7, 1, 7, "get", "a", None),
    ]
    out = {r.seq: r.val for r in kv.get_results(_oplog_df(spark, rows)).collect()}
    assert out == {1: "", 3: "V", 5: "VW", 7: "Z"}


def _check_balance(assignment, groups):
    counts = {g: 0 for g in groups}
    for gid in assignment.values():
        assert gid in counts
        counts[gid] += 1
    assert max(counts.values()) - min(counts.values()) <= 1


@pytest.mark.parametrize("ngroups", [1, 2, 3, 4, 7, 10])
def test_rebalance_balance_invariant(ngroups):
    groups = list(range(100, 100 + ngroups))
    a = kv.rebalance({s: 0 for s in range(kv.NSHARDS)}, groups)
    _check_balance(a, groups)


def test_rebalance_minimal_moves_on_join():
    groups = [1]
    a = kv.rebalance({s: 0 for s in range(10)}, groups)
    # second group joins: exactly 5 shards must move
    b = kv.rebalance(a, [1, 2])
    _check_balance(b, [1, 2])
    moved = sum(1 for s in a if a[s] != b[s])
    assert moved == 5


def test_rebalance_minimal_moves_on_leave():
    a = kv.rebalance({s: 0 for s in range(10)}, [1, 2, 3])
    b = kv.rebalance(a, [1, 2])
    _check_balance(b, [1, 2])
    # only shards of the departed group move
    moved = {s for s in a if a[s] != b[s]}
    assert all(a[s] == 3 for s in moved)


def test_salted_agg_equals_plain_agg(spark):
    """Salting must be result-invariant (SCALE.md skew remedy)."""
    from pyspark.sql import functions as F

    from mrgo_spark.operators.mrapps import tokenize
    from mrgo_spark.operators.skew import salted_agg
    from mrgo_spark.sources.tables import load_table

    tok = tokenize(load_table(spark, "/root/testdata/sf0.001", "documents"))
    plain = {
        (r.word): (r.cnt,) for r in tok.groupBy("word").agg(F.count("*").alias("cnt")).collect()
    }
    salted = {
        (r.word): (r.cnt,) for r in salted_agg(tok, "word", {"cnt": ("count", "*")}).collect()
    }
    assert salted == plain


def test_asof_forward_direction(spark):
    """Forward as-of: earliest right row with right_ts >= left_ts
    (inclusive at equal timestamps)."""
    from mrgo_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, "u", 100), (2, "u", 250), (3, "u", 400)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("u", 100, "a"), ("u", 300, "b")], "k string, t long, v string"
    )
    out = {
        r.id: r.v
        for r in asof_join(
            left, right, on="k", left_ts="t", right_ts="t",
            value_cols=["v"], direction="forward",
        ).collect()
    }
    assert out == {1: "a", 2: "b", 3: None}


def test_compaction_equivalence_at_any_point(spark):
    """fold(compact(log, S)) == fold(log) for S below, inside, and
    above the seq range (empty snapshot / mixed / all-snapshot)."""
    from mrgo_spark.sources.tables import load_table

    oplog = kv.dedup_at_most_once(
        kv.synth_oplog(load_table(spark, "/root/testdata/sf0.001", "events"))
    )
    expected = sorted(map(tuple, kv.fold_state(oplog).collect()))
    lo, hi = oplog.selectExpr("min(seq)", "max(seq)").first()
    for s in (lo - 1, (lo + hi) // 2, hi + 1):
        got = sorted(map(tuple, kv.fold_state(kv.compact_oplog(oplog, s)).collect()))
        assert got == expected, f"split at {s}"
    # and the compacted log is genuinely smaller than the original
    mid = kv.compact_oplog(oplog, hi + 1)
    assert mid.count() <= oplog.select("key").distinct().count()


def test_epoch_serving_conservation_and_ownership(spark):
    """O24 invariants: (1) every deduped op is either served or
    rejected — per-epoch totals are conserved; (2) a group only
    serves shards it owns in that epoch per the rotating schedule;
    (3) rejected ops are exactly those whose client-cached group
    differs from the epoch owner."""
    from pyspark.sql import functions as F

    from mrgo_spark.operators import kv
    from mrgo_spark.sources.tables import load_table

    oplog = kv.synth_oplog(load_table(spark, "/root/testdata/sf0.001", "events"))
    deduped = kv.dedup_at_most_once(oplog)
    out = kv.epoch_serving(oplog)

    per_epoch = {
        r.epoch: (r.total_served, r.total_rejected)
        for r in out.groupBy("epoch")
        .agg(
            F.sum("n_served").alias("total_served"),
            F.sum("n_wrong_group").alias("total_rejected"),
        )
        .collect()
    }
    want = {
        r.epoch: r.n
        for r in deduped.withColumn("epoch", F.expr(f"seq div {kv.EPOCH_WIDTH}"))
        .groupBy("epoch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(per_epoch) == set(want)
    for e, (srv, rej) in per_epoch.items():
        assert srv + rej == want[e], (e, srv, rej, want[e])

    # ownership: recompute served counts per (epoch, gid) directly
    direct = {
        (r.epoch, r.gid): r.n
        for r in deduped.withColumn("epoch", F.expr(f"seq div {kv.EPOCH_WIDTH}"))
        .withColumn("shard", kv.key2shard("key"))
        .withColumn("owner", (F.col("shard") + F.col("epoch")) % kv.NGROUPS + 1)
        .withColumn("gid", F.col("client") % kv.NGROUPS + 1)
        .filter(F.col("owner") == F.col("gid"))
        .groupBy("epoch", "gid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {(r.epoch, r.gid): r.n_served for r in out.collect() if r.n_served > 0}
    assert got == direct


def test_rebalance_history_matches_python_fold(spark):
    """Three-way cross-check, leg 1: the declared (literal) rebalance
    history must equal BOTH the declarative DataFrame step fold
    (rebalance_config_history_df, the executable spec) and folding
    kv.rebalance/migration_plan inline (leg 2 is the DuckDB oracle
    via the driver's compare)."""
    served = kv.rebalance_config_history(spark)
    spec = kv.rebalance_config_history_df(spark)
    assert served.schema == spec.schema or [
        (f.name, f.dataType) for f in served.schema
    ] == [(f.name, f.dataType) for f in spec.schema]
    assert sorted(map(tuple, served.collect())) == sorted(
        map(tuple, spec.collect())
    )
    hist = {
        (r.cfg, r.shard): (r.gid, r.moved)
        for r in served.collect()
    }
    assign = {s: 0 for s in range(kv.NSHARDS)}
    expect = {(0, s): (0, 0) for s in range(kv.NSHARDS)}
    for i, (op, arg, live) in enumerate(kv.schedule_groups(), start=1):
        if op == "move":
            shard, gid = arg
            new = dict(assign)
            new[shard] = gid
        else:
            new = kv.rebalance(assign, live)
        for s in range(kv.NSHARDS):
            expect[(i, s)] = (new[s], int(new[s] != assign[s]))
        assign = new
    assert hist == expect


def test_rebalance_history_invariants(spark):
    """Balance (max−min ≤ 1 over live groups) and join/leave coverage
    on every non-move config of the declared schedule."""
    rows = kv.rebalance_config_history(spark).collect()
    by_cfg = {}
    for r in rows:
        by_cfg.setdefault(r.cfg, {})[r.shard] = r.gid
    for i, (op, arg, live) in enumerate(kv.schedule_groups(), start=1):
        gids = list(by_cfg[i].values())
        assert set(gids) <= set(live) | ({0} if not live else set())
        if op == "move":
            continue
        counts = [gids.count(g) for g in live]
        assert max(counts) - min(counts) <= 1, (i, counts)


def test_put_history_scd2_partitions_seq_space(spark, sf_dir):
    from mrgo_spark.sources.tables import load_table

    oplog = kv.dedup_at_most_once(
        kv.synth_oplog(load_table(spark, sf_dir, "events"))
    )
    hist = kv.put_history_scd2(oplog).collect()
    by_key: dict[str, list] = {}
    for r in hist:
        by_key.setdefault(r.key, []).append(r)
    puts = {
        (r.key, r.seq): r.value
        for r in oplog.filter("op = 'put'").collect()
    }
    assert sum(len(v) for v in by_key.values()) == len(puts)
    for key, rows in by_key.items():
        rows.sort(key=lambda r: r.valid_from_seq)
        # versions number 1..n in interval order; intervals are
        # contiguous and only the last is open (-1)
        assert [r.version for r in rows] == list(range(1, len(rows) + 1))
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to_seq == b.valid_from_seq - 1
        assert rows[-1].valid_to_seq == -1
        assert all(r.valid_to_seq >= r.valid_from_seq for r in rows[:-1])
        # each interval carries exactly the put at its valid_from
        for r in rows:
            assert puts[(key, r.valid_from_seq)] == r.value


def test_put_history_scd2_point_query_matches_last_put(spark, sf_dir):
    from pyspark.sql import functions as F

    from mrgo_spark.sources.tables import load_table

    oplog = kv.dedup_at_most_once(
        kv.synth_oplog(load_table(spark, sf_dir, "events"))
    )
    hist = kv.put_history_scd2(oplog)
    puts = sorted(
        (r.seq, r.key, r.value)
        for r in oplog.filter("op = 'put'").collect()
    )
    s = puts[len(puts) // 2][0]  # probe mid-history
    got = {
        (r.key, r.value)
        for r in hist.filter(
            (F.col("valid_from_seq") <= s)
            & ((F.col("valid_to_seq") == -1) | (F.col("valid_to_seq") >= s))
        ).collect()
    }
    want = {}
    for seq, key, value in puts:
        if seq <= s:
            want[key] = value
    assert got == set(want.items())


def test_handoff_gc_matches_python_replay(spark):
    """Three-way leg: handoff_gc_obligations over a hand-built oplog
    must equal a pure-Python replay of the ownership rotation and
    key-population model (leg 2 is the DuckDB oracle)."""
    from pyspark.sql import functions as F  # noqa: F401

    # keys '0'..'9' map to shards ascii('0'..'9') % 10 = 8,9,0..7
    rows = [
        # epoch 0: served writes (owner(s,0) = s%3+1, gid=client%3+1)
        (10, 0, 10, "put", "2", "a"),   # shard 0, owner 1, gid 1 → served
        (20, 1, 20, "put", "3", "b"),   # shard 1, owner 2, gid 2 → served
        (30, 0, 30, "put", "4", "c"),   # shard 2, owner 3, gid 1 → REJECTED
        # epoch 1: shard 0 now owner 2
        (1010, 1, 40, "put", "20", "d"),  # shard 0, owner 2, gid 2 → served
        (1020, 1, 41, "put", "2", "e"),   # shard 0 same key again
        # epoch 2 exists so the audit covers epochs 1..2
        (2010, 0, 50, "get", "2", None),
    ]
    out = {
        (r.epoch, r.gid): (
            r.n_shards_owned,
            r.n_shards_handed_off,
            r.n_reap_keys,
        )
        for r in kv.handoff_gc_obligations(_oplog_df(spark, rows)).collect()
    }

    # python replay
    def owner(s, e):
        return (s + e) % 3 + 1

    writes = {}  # (shard, key) -> min epoch, served writes only
    for seq, client, _r, op, key, _v in rows:
        if op not in ("put", "append"):
            continue
        e, s = seq // 1000, ord(key[0]) % 10
        if owner(s, e) != client % 3 + 1:
            continue
        writes[(s, key)] = min(writes.get((s, key), e), e)
    want = {}
    for e in (1, 2):
        for g in (1, 2, 3):
            owned = sum(1 for s in range(10) if owner(s, e) == g)
            ho = [s for s in range(10) if owner(s, e - 1) == g]
            pop = {
                s: sum(
                    1
                    for (ss, _k), mw in writes.items()
                    if ss == s and mw <= e - 1
                )
                for s in ho
            }
            want[(e, g)] = (
                owned,
                sum(1 for s in ho if pop[s] > 0),
                sum(pop.values()),
            )
    assert out == want
    # spot-check the story: at epoch 1, group 1 (owner of shard 0 at
    # epoch 0) must reap key '2'; at epoch 2, group 2 holds shard 0's
    # two keys from its epoch-1 tenure
    assert out[(1, 1)][1] == 1 and out[(1, 1)][2] >= 1
    assert out[(2, 2)][2] >= 2


def test_storage_leak_audit_flags_planted_shard(spark):
    """VERDICT_r10 #2 'done' criterion: plant one unreaped shard in
    an otherwise-correct storage table and see exactly it reported."""
    epoch = 5
    correct = [
        (int((s + epoch) % kv.NGROUPS + 1), s, 3) for s in range(kv.NSHARDS)
    ]
    planted = correct + [(1, 7, 4)] if (7 + epoch) % kv.NGROUPS + 1 != 1 else (
        correct + [(2, 7, 4)]
    )
    storage = spark.createDataFrame(
        planted, "gid int, shard int, n_keys int"
    )
    out = kv.storage_leak_audit(storage, epoch).collect()
    leaked = [(r.gid, r.shard, r.n_keys) for r in out if r.verdict == "leaked"]
    assert len(leaked) == 1 and leaked[0][1] == 7 and leaked[0][2] == 4
    assert sum(1 for r in out if r.verdict == "owned") == kv.NSHARDS


def test_transfer_serving_unaffected_always_served(spark):
    """Challenge2Unaffected pin: in EVERY (epoch, gid) row, every
    correctly-routed request to a non-moving shard is served —
    n_unaffected_served == n_unaffected_req — and outcome counts
    conserve the deduped op total per epoch."""
    from pyspark.sql import functions as F

    from mrgo_spark.sources.tables import load_table

    oplog = kv.synth_oplog(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    out = kv.transfer_serving(oplog).collect()
    assert out
    for r in out:
        assert r.n_unaffected_served == r.n_unaffected_req, r
        assert 0 <= r.avail_milli <= 1000
    per_epoch = {}
    for r in out:
        per_epoch[r.epoch] = per_epoch.get(r.epoch, 0) + (
            r.n_served + r.n_wrong_group + r.n_in_transfer
        )
    want = {
        r.epoch: r.n
        for r in kv.dedup_at_most_once(oplog)
        .withColumn("epoch", F.expr(f"seq div {kv.EPOCH_WIDTH}"))
        .groupBy("epoch")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert per_epoch == want


def test_config_catchup_three_epoch_backlog_in_order(spark):
    """TestMissChange pin (VERDICT_r11 #2): group 3 misses epochs
    6-8 (a 3-epoch backlog), returns at 9 with 4 unapplied configs,
    rejects as stale through its 400-entry catch-up window, serves
    after — and the running sum of n_applied equals epoch + 1 at
    every up-to-date epoch (configs applied in order, none skipped)."""
    # client 2 → gid 3; one request per epoch 0..10 plus targeted
    # rows inside epoch 9's catch-up window boundary.
    rows = [(e * 1000 + 500, 2, 100 + e, "put", "3", "v") for e in range(11)]
    rows += [
        (9399, 2, 201, "put", "4", "v"),  # off 399 < 400 → stale
        (9400, 2, 202, "put", "4", "v"),  # off 400, owner(2,9)=3 → served
        (6100, 2, 203, "put", "4", "v"),  # offline epoch → dropped
    ]
    out = {
        (r.epoch, r.gid): r
        for r in kv.config_catchup_serving(_oplog_df(spark, rows)).collect()
        if r.gid == 3
    }
    assert [out[(e, 3)].configs_behind for e in range(11)] == [
        0, 0, 0, 0, 0, 0, 1, 2, 3, 4, 0,
    ]
    for e in (6, 7, 8):
        r = out[(e, 3)]
        assert r.n_served == 0 and r.n_rejected_stale == 0
        assert r.n_dropped_offline > 0 and r.n_applied == 0
    r9 = out[(9, 3)]
    assert r9.n_rejected_stale == 1  # only off 399 (< 400 window)
    # off 400: key "4" → shard 2, owner(2,9)=3 → served;
    # off 500: key "3" → shard 1, owner(1,9)=2 ≠ 3 → wrong_group
    assert r9.n_served == 1 and r9.n_wrong_group == 1
    assert r9.n_applied == 4
    # in-order, no-skip application: cumulative applied == epoch + 1
    # at every up-to-date epoch
    cum = 0
    for e in range(11):
        cum += out[(e, 3)].n_applied
        if e < 6 or e >= 9:
            assert cum == e + 1, (e, cum)
        else:
            assert cum < e + 1, (e, cum)


def test_config_catchup_conservation_fixture(spark):
    """Outcome counts conserve the deduped total per (epoch, gid) on
    the real fixture; groups are current outside their outage."""
    from pyspark.sql import functions as F

    from mrgo_spark.sources.tables import load_table

    oplog = kv.synth_oplog(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    out = kv.config_catchup_serving(oplog).collect()
    assert out
    for r in out:
        assert 0 <= r.serve_milli <= 1000
        if r.epoch < 2:
            assert r.configs_behind == 0 and r.n_applied == 1
    got = {}
    for r in out:
        got[(r.epoch, r.gid)] = (
            r.n_served + r.n_wrong_group + r.n_rejected_stale
            + r.n_dropped_offline
        )
    want = {
        (r.epoch, r.gid): r.n
        for r in kv.dedup_at_most_once(oplog)
        .withColumn("epoch", F.expr(f"seq div {kv.EPOCH_WIDTH}"))
        .withColumn("gid", F.col("client") % kv.NGROUPS + 1)
        .groupBy("epoch", "gid")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


def test_transfer_serving_partial_arrival(spark):
    """Challenge2Partial pin: a moving shard serves at its new owner
    AS SOON as it arrives (its staggered offset), not at epoch end —
    and before arrival the correctly-routed request is in_transfer,
    not wrong_group."""
    # shard 0 (key '2') moves at epoch 3 (e%3 == s%3 == 0);
    # owner(0, 3) = (0 + 1) % 3 + 1 = 2 → clients with gid 2 route
    # correctly. Arrival offset = (0+1)*80 = 80.
    rows = [
        (3010, 1, 1, "put", "2", "a"),   # off 10 < 80 → in_transfer
        (3200, 1, 2, "put", "2", "b"),   # off 200 ≥ 80 → served
        (3020, 0, 3, "put", "2", "c"),   # gid 1 ≠ owner → wrong_group
        # shard 1 (key '3') does NOT move at epoch 3; owner(1, 3) =
        # (1 + moves(1,3)) % 3 + 1 = (1 + 1) % 3 + 1 = 3 → gid 3
        (3015, 2, 4, "put", "3", "d"),   # unaffected, served at off 15
    ]
    out = {
        (r.epoch, r.gid): r
        for r in kv.transfer_serving(_oplog_df(spark, rows)).collect()
    }
    g2 = out[(3, 2)]
    assert g2.n_in_transfer == 1 and g2.n_served == 1
    assert g2.avail_milli == 500
    g1 = out[(3, 1)]
    assert g1.n_wrong_group == 1 and g1.n_served == 0
    g3 = out[(3, 3)]
    assert g3.n_unaffected_req == 1 == g3.n_unaffected_served
    assert g3.n_served == 1 and g3.avail_milli == 1000


def test_session_guarantees_python_replay(spark):
    """r13: the full per-get verdict table replayed in pure Python
    over the sf0.001 synthetic oplog."""
    from mrgo_spark.sources.tables import load_table

    oplog = kv.synth_oplog(load_table(spark, "/root/testdata/sf0.001",
                                      "events"))
    got = {
        r.seq: (
            r.client, r.key, r.replica, r.horizon, r.version_seen,
            r.own_last_put_seq, r.ryw_ok, r.mr_ok,
        )
        for r in kv.session_guarantee_audit(oplog).collect()
    }
    rows = sorted(
        ((r.seq, r.client, r.reqid, r.op, r.key) for r in oplog.collect()),
    )
    seen, ops = set(), []
    for seq, client, reqid, op, key in rows:
        if (client, reqid) in seen:
            continue
        seen.add((client, reqid))
        if op in ("put", "get"):
            ops.append((seq, client, op, key))
    puts_by_key, own, want, last_ver = {}, {}, {}, {}
    for seq, client, op, key in ops:  # already seq-sorted
        if op == "put":
            puts_by_key.setdefault(key, []).append(seq)
            own[client] = seq
        else:
            rep = (client + seq // kv.SG_HOP) % kv.SG_REPLICAS
            hor = seq - rep * kv.SG_LAG
            ver = sum(1 for p in puts_by_key.get(key, []) if p <= hor)
            ol = None
            for s2, c2, o2, k2 in ops:
                if s2 >= seq:
                    break
                if c2 == client and o2 == "put" and k2 == key:
                    ol = s2
            ryw = ol is None or ol <= hor
            mr = (client, key) not in last_ver or ver >= last_ver[
                (client, key)
            ]
            last_ver[(client, key)] = ver
            want[seq] = (client, key, rep, hor, ver, ol, ryw, mr)
    assert got == want and len(got) > 50
    flat = list(got.values())
    assert any(not v[6] for v in flat)   # RYW violations exist
    assert any(v[6] for v in flat)


def test_session_guarantees_hand_case(spark):
    """Pinned hazard pair: a fresh own put hidden by replica lag
    (RYW), and a replica hop regressing the horizon (MR)."""
    rows = [
        # client 7 on key "k": put, then get 50 seqs later served by
        # replica (7 + 150//250) % 3 = 1 → horizon 150-100=50 < 100
        (100, 7, 100, "put", "k", "v1"),
        (150, 7, 150, "get", "k", None),
        # second get at seq 260: replica (7 + 1) % 3 = 2 → horizon
        # 260-200=60 — REGRESSED below the put again; version drops
        # only if the first get saw it (it didn't here), so version
        # stays 0 → mr_ok True but ryw still False
        (260, 7, 260, "get", "k", None),
        # a later put then a replica-0 get: lag 0 sees everything
        (800, 2, 800, "put", "k", "v2"),
        (849, 2, 849, "get", "k", None),  # (2+3)%3=2... seq 849
    ]
    df = _oplog_df(spark, rows)
    got = {r.seq: r for r in kv.session_guarantee_audit(df).collect()}
    g1 = got[150]
    assert (g1.replica, g1.horizon, g1.version_seen) == (1, 50, 0)
    assert g1.own_last_put_seq == 100 and not g1.ryw_ok and g1.mr_ok
    g2 = got[260]
    assert (g2.replica, g2.horizon, g2.version_seen) == (2, 60, 0)
    assert not g2.ryw_ok and g2.mr_ok
    g3 = got[849]
    # replica (2 + 849//250) % 3 = (2+3)%3 = 2 → horizon 649 < 800:
    # own put invisible again
    assert (g3.replica, g3.horizon, g3.version_seen) == (2, 649, 1)
    assert not g3.ryw_ok


def test_session_guarantees_mr_violation_constructed(spark):
    """A horizon regression across a put boundary: version_seen
    drops between successive reads → mr_ok False on the second."""
    rows = [
        (10, 3, 10, "put", "k", "a"),
        # get at 240: replica (3+0)%3=0 → horizon 240, sees the put
        (240, 3, 240, "get", "k", None),
        # get at 255: replica (3+1)%3=1 → horizon 155 — still >= 10,
        # sees it; need regression PAST the put: put at 200
        (200, 5, 200, "put", "k", "b"),
        (245, 3, 245, "get", "k", None),  # replica 0, horizon 245: ver 2
        (260, 3, 260, "get", "k", None),  # replica 1, horizon 160: ver 1
    ]
    df = _oplog_df(spark, rows)
    got = {r.seq: r for r in kv.session_guarantee_audit(df).collect()}
    assert got[245].version_seen == 2 and got[245].mr_ok
    assert got[260].version_seen == 1 and not got[260].mr_ok


def test_consistent_ring_python_replay_and_movement(spark):
    """r13 consistent hashing: owner assignment replayed in Python;
    adding a server moves ONLY the keys the new server claims — the
    invariant that justifies the ring over mod-N routing."""
    import hashlib

    from mrgo_spark.sources.tables import load_table

    oplog = kv.dedup_at_most_once(
        kv.synth_oplog(load_table(spark, "/root/testdata/sf0.001",
                                  "events"))
    )
    got5 = {r.key: (r.key_pos, r.owner, r.n_ops)
            for r in kv.consistent_ring_stats(oplog).collect()}
    got6 = {r.key: r.owner
            for r in kv.consistent_ring_stats(oplog, n_servers=6).collect()}

    def py_owner(key, pts):
        kp = int(hashlib.md5(key.encode()).hexdigest()[:12], 16)
        ge = [s for p, s in pts if p >= kp]
        return kp, (ge[0] if ge else pts[0][1])

    pts5 = kv.ring_points(5)
    for key, (kp, owner, _n) in got5.items():
        wkp, wown = py_owner(key, pts5)
        assert (kp, owner) == (wkp, wown), key
    # ring invariant: every reassigned key lands on the NEW server
    moved = {k for k in got5 if got6[k] != got5[k][1]}
    assert moved, "a 6th server should claim some arc"
    assert all(got6[k] == 5 for k in moved)
    # and unmoved keys keep their exact owner (no global reshuffle)
    assert all(got6[k] == got5[k][1] for k in got5 if k not in moved)
    # vnode damping: the 40-point ring spreads the fixture's key set
    # across most servers (sf0.001 carries a SUBSET of the 50 keys,
    # so demanding all 5 would pin fixture coverage, not the ring)
    assert len({o for _kp, o, _n in got5.values()}) >= 3


def test_session_guarantees_single_oplog_pass(spark):
    """The deduped + own-writes ops frame is checkpointed once — the
    puts/gets visibility branches replay from ExistingRDD instead of
    re-running the oplog windows per branch."""
    from mrgo_spark.sources.tables import load_table

    oplog = kv.synth_oplog(
        load_table(spark, "/root/testdata/sf0.001", "events")
    )
    plan = (
        kv.session_guarantee_audit(oplog)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("ExistingRDD") >= 2  # both branches, one frame
    assert "events.parquet" not in plan


def test_session_guarantees_are_per_item(spark):
    """r13 review fix: a session interleaving two keys must not flag
    cross-key hazards — MR compares versions of the SAME key only,
    and RYW only considers the client's own puts TO THAT KEY."""
    rows = [
        # client 1 works key "a" heavily, then reads key "b" once:
        (10, 1, 10, "put", "a", "v"),
        (20, 9, 20, "put", "a", "v"),
        (30, 9, 30, "put", "a", "v"),
        (240, 1, 240, "get", "a", None),   # replica 1, horizon 140:
        #                                     sees all 3 'a' puts
        # next get is key "b" — its version (0 at horizon 143) being
        # far below key a's 3 must NOT be an MR violation (different
        # item); pre-fix client-only windows flagged exactly this
        (200, 5, 200, "put", "b", "w"),
        (243, 1, 243, "get", "b", None),   # replica 1, horizon 143
        # and RYW: client 1 put "a" at 10; this get of "b" at a lagged
        # replica must not consider that cross-key put
        (260, 1, 260, "get", "b", None),   # replica 1, horizon 160
    ]
    df = _oplog_df(spark, rows)
    got = {r.seq: r for r in kv.session_guarantee_audit(df).collect()}
    assert got[240].version_seen == 3 and got[240].mr_ok
    g = got[243]
    assert g.version_seen == 0 and g.mr_ok          # not a regression
    assert g.own_last_put_seq is None and g.ryw_ok  # no own put on b
    g2 = got[260]
    assert g2.own_last_put_seq is None and g2.ryw_ok
