"""Loader robustness: events.ts unit is SNIFFED from the parquet
footer, never assumed.

Round-3 regression being pinned here: the corpus regenerated from
timestamp[ns] to timestamp[us] while the loader hard-coded a div-1000
ns workaround, silently compressing 30 days of events into ~43 minutes
(7 red driver rows).  These tests run a µs-typed AND an ns-typed
fixture through the same loader and assert identical epoch seconds, so
the next corpus regeneration cannot silently skew the clock again.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

# 2024-01-01T00:00:00Z and 2024-01-31T00:00:00Z, in epoch µs
EPOCH_US = [1_704_067_200_000_000, 1_706_659_200_000_000]


def _write_events(path: str, unit: str) -> None:
    scale = {"us": 1, "ns": 1_000}[unit]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2], pa.int64()),
            "ts": pa.array([u * scale for u in EPOCH_US], pa.timestamp(unit)),
            "user_id": pa.array([10, 11], pa.int64()),
            "event_type": pa.array(["view", "click"]),
            "value": pa.array([1.5, 2.5], pa.float64()),
            "props": pa.array(['{"k": 1}', '{"k": 2}']),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize("unit", ["us", "ns"])
def test_events_ts_unit_sniffed(spark, tmp_path, unit):
    from raster2points_spark.io import load_events, parquet_ts_unit

    path = str(tmp_path / "events.parquet")
    _write_events(path, unit)
    assert parquet_ts_unit(path) == unit

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = load_events(spark, path)
    # normalized to TimestampType regardless of storage unit
    assert df.schema["ts"].dataType.typeName() == "timestamp"
    secs = [r[0] for r in df.orderBy("event_id").select(F.unix_seconds("ts")).collect()]
    assert secs == [u // 1_000_000 for u in EPOCH_US]


def test_events_us_and_ns_load_identically(spark, tmp_path):
    from raster2points_spark.io import load_events

    p_us = str(tmp_path / "ev_us.parquet")
    p_ns = str(tmp_path / "ev_ns.parquet")
    _write_events(p_us, "us")
    _write_events(p_ns, "ns")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    rows_us = load_events(spark, p_us).orderBy("event_id").collect()
    rows_ns = load_events(spark, p_ns).orderBy("event_id").collect()
    assert rows_us == rows_ns


def test_stream_loader_matches_batch_loader(spark, tmp_path):
    """The streaming source must apply the SAME normalization as the
    batch loader (it sniffs the split dir's footer itself)."""
    from raster2points_spark.io import load_events
    from raster2points_spark.streaming import read_events_stream, run_available_now

    sf_dir = str(tmp_path)
    _write_events(str(tmp_path / "events.parquet"), "us")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    stream = read_events_stream(spark, sf_dir)
    out = run_available_now(stream.select("event_id", "ts"), "ts_unit_probe")
    got = {(r.event_id, r.ts) for r in out.collect()}
    want = {
        (r.event_id, r.ts)
        for r in load_events(spark, str(tmp_path / "events.parquet"))
        .select("event_id", "ts")
        .collect()
    }
    assert got == want


def test_real_corpus_ts_is_calendar_scale(spark):
    """The loaded corpus must span days, not minutes — the exact
    invariant the r3 unit bug broke (30 days collapsed to 43 min)."""
    from tests.conftest import SF0001
    from raster2points_spark.io import table

    spark.conf.set("spark.sql.session.timeZone", "UTC")
    ev = table(spark, SF0001, "events")
    lo, hi = ev.select(F.min("ts"), F.max("ts")).first()
    assert (hi - lo).days >= 7
