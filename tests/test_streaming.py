"""Streaming semantics: session merge rule, watermark replay, stateful
dedup — the non-SQL-expressible invariants (SURVEY §2.10 smoke keys)."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF0001


def _literal_events(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, value double")


def test_session_window_merge_rule(spark):
    """delta == gap merges, delta > gap splits (verified against the
    registered oracle semantics)."""
    from datetime import datetime

    ev = _literal_events(
        spark,
        [
            (1, datetime(2024, 1, 1, 0, 0, 0), 1.0),
            (1, datetime(2024, 1, 1, 0, 10, 0), 1.0),  # exactly 600s later -> merges
            (1, datetime(2024, 1, 1, 0, 20, 1), 1.0),  # 601s later -> new session
        ],
    )
    out = (
        ev.groupBy("user_id", F.session_window("ts", "10 minutes"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert sorted(r.n for r in out) == [1, 2]


def test_watermark_replay_smoke(spark, registry):
    out = registry["stream_watermark"].fn(spark, SF0001)
    rows = out.collect()
    assert len(rows) > 0
    assert [f.name for f in out.schema.fields] == ["ws", "event_type", "n"]
    assert all(r.n > 0 for r in rows)
    # tumbling-window starts are hour-aligned epoch seconds
    assert all(r.ws % 3600 == 0 for r in rows)


def test_stream_dedup_preserves_unique_events(spark, registry):
    """event_id is unique in the corpus, so stateful dedup must be a
    no-op: per-type counts equal the batch counts."""
    out = {r.event_type: r.n for r in registry["stream_dedup_state"].fn(spark, SF0001).collect()}
    from raster2points_spark.io import table

    batch = {
        r.event_type: r.n
        for r in table(spark, SF0001, "events")
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert out == batch


def test_funnel_ordering_invariant(spark, registry):
    rows = registry["stream_funnel"].fn(spark, SF0001).collect()
    for r in rows:
        assert r.t_signup <= r.t_view <= r.t_purchase


def test_stream_stream_join_equals_batch_join(spark, registry):
    """Bounded replay ⇒ the watermarked stream-stream inner join must
    emit exactly the batch interval-join result (same pairs, same
    values) — the stateful join machinery drops or duplicates nothing."""
    from raster2points_spark.io import table
    from raster2points_spark.queries._util import unix_secs

    out = registry["stream_stream_join"].fn(spark, SF0001)
    got = {tuple(r) for r in out.collect()}

    ev = table(spark, SF0001, "events").select(
        "event_id", "user_id", "event_type", unix_secs(F.col("ts")).alias("tsec")
    )
    p = ev.filter(F.col("event_type") == "purchase").alias("p")
    v = ev.filter(F.col("event_type") == "view").alias("v")
    batch = (
        p.join(
            v,
            (F.col("p.user_id") == F.col("v.user_id"))
            & (F.col("v.tsec") >= F.col("p.tsec") - 3600)
            & (F.col("v.tsec") <= F.col("p.tsec")),
        )
        .select(
            F.col("p.event_id").alias("purchase_id"),
            F.col("v.event_id").alias("view_id"),
            F.col("p.user_id").alias("user_id"),
            F.col("p.tsec").alias("purchase_tsec"),
            F.col("v.tsec").alias("view_tsec"),
        )
    )
    want = {tuple(r) for r in batch.collect()}
    assert got == want and len(got) > 0
