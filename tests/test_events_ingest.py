"""Events timestamp-ingestion robustness.

The driver's fixture generator has already changed events.ts encoding
once (round 1-2: parquet TIMESTAMP(NANOS); round 3: naive-µs
TIMESTAMP_NTZ) and broke every operator riding on it. This matrix
pins the loader contract: whatever encoding lands on disk, load_table
yields a plain TIMESTAMP whose unix_micros equals the stored naive
micros, independent of the host session's timezone.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from mrgo_spark.sources.tables import load_table
from mrgo_spark.streaming import stream_ops

# Wall-clock instants with sub-second parts (gap math is µs-precise).
WALL = [
    datetime.datetime(2026, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2026, 1, 1, 0, 29, 59, 999999),
    datetime.datetime(2026, 1, 2, 13, 45, 1, 7),
]
EPOCH = datetime.datetime(1970, 1, 1)
MICROS = [int((w - EPOCH).total_seconds() * 1_000_000) for w in WALL]


def _write_events(dir_path, ts_array: pa.Array) -> str:
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": ts_array,
            "user_id": pa.array([10, 10, 11], pa.int64()),
            "event_type": pa.array(["view", "view", "purchase"]),
            "value": pa.array([1.0, 2.0, 3.0]),
            "props": pa.array(["{}", "{}", "{}"]),
        }
    )
    dir_path.mkdir(exist_ok=True)
    pq.write_table(tbl, dir_path / "events.parquet", store_schema=False)
    return str(dir_path)


ENCODINGS = {
    # round-1/2 fixtures: TIMESTAMP(NANOS), read as long via legacy conf
    "nanos": pa.array([m * 1000 for m in MICROS], pa.timestamp("ns")),
    # round-3 fixtures: naive microseconds (TIMESTAMP_NTZ)
    "micros_naive": pa.array(MICROS, pa.timestamp("us")),
    # plain instant micros (isAdjustedToUTC=true)
    "micros_utc": pa.array(MICROS, pa.timestamp("us", tz="UTC")),
}


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_table_normalizes_every_ts_encoding(spark, tmp_path, enc):
    d = _write_events(tmp_path / enc, ENCODINGS[enc])
    df = load_table(spark, d, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = [
        r.us
        for r in df.select(F.unix_micros("ts").alias("us"))
        .orderBy("us")
        .collect()
    ]
    assert got == sorted(MICROS)


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_load_table_is_timezone_independent(spark, tmp_path, enc):
    """A driver-shaped session may start with any session timezone;
    the loader must pin its own semantics rather than inherit one."""
    d = _write_events(tmp_path / enc, ENCODINGS[enc])
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        spark.conf.set("spark.sql.session.timeZone", "America/New_York")
        df = load_table(spark, d, "events")
        got = sorted(
            r.us for r in df.select(F.unix_micros("ts").alias("us")).collect()
        )
        assert got == sorted(MICROS)
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


@pytest.mark.parametrize("enc", sorted(ENCODINGS))
def test_stream_reader_agrees_with_batch(spark, tmp_path, enc):
    """read_events_stream must land on the same ts instants as
    load_table for every encoding (round 2 regression: the stream
    path kept a ns→µs divide after the fixtures went µs and every
    streamed window landed in January 1970)."""
    d = _write_events(tmp_path / enc, ENCODINGS[enc])
    stream = stream_ops.read_events_stream(spark, d)
    assert dict(stream.dtypes)["ts"] == "timestamp"
    q = (
        stream.select(F.unix_micros("ts").alias("us"))
        .writeStream.format("memory")
        .queryName(f"ts_probe_{enc}")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        r.us for r in spark.sql(f"SELECT us FROM ts_probe_{enc}").collect()
    )
    assert got == sorted(MICROS)


def test_real_fixture_loads_as_timestamp(spark):
    """The actual driver fixture, whatever encoding this round's
    generator produced."""
    df = load_table(spark, "/root/testdata/sf0.001", "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    lo, hi = df.select(
        F.min(F.year("ts")).alias("lo"), F.max(F.year("ts")).alias("hi")
    ).first()
    # not 1970 (double-divide regression), not year-56k (missed ns div)
    assert 2000 <= lo <= hi <= 2100


def test_widen_scan_self_disables(spark, tmp_path):
    """widen_scan repartitions a 1-split scan up to default
    parallelism, and passes an already-wide frame through untouched
    (no extra exchange at scale)."""
    from mrgo_spark.sources.tables import widen_scan

    df = spark.range(1000).toDF("x")
    narrow = df.coalesce(1)
    widened = widen_scan(narrow)
    assert widened.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism
    assert widened.count() == 1000

    wide = df.repartition(spark.sparkContext.defaultParallelism + 4)
    assert widen_scan(wide) is wide
