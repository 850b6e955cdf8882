"""Pin the per-session relation cache semantics (io.table, r8).

The cache exists to kill a py4j round-trip + parquet footer read per
table load (~200 loads per bench pass).  These tests pin the three
properties that make it SAFE, so a refactor that silently breaks one
becomes a red test instead of a stale-relation heisenbug:

1. same session + same (sf_dir, name) -> the SAME DataFrame object
   (the load work actually is saved, not just memoized-by-value);
2. path spelling doesn't split the cache (abspath-keyed);
3. events still goes through load_events (ts normalized to
   TimestampType µs) when served from the cache — the cache must not
   bypass the footer-sniffing loader.
"""

from __future__ import annotations

from pyspark.sql.types import TimestampType

from raster2points_spark.io import table
from tests.conftest import SF0001


def test_same_session_same_key_returns_same_object(spark):
    a = table(spark, SF0001, "nation")
    b = table(spark, SF0001, "nation")
    assert a is b


def test_path_spelling_does_not_split_cache(spark):
    a = table(spark, SF0001, "region")
    b = table(spark, SF0001 + "/", "region")
    c = table(spark, SF0001 + "/../sf0.001", "region")
    assert a is b is c


def test_distinct_tables_and_dirs_are_distinct_entries(spark):
    assert table(spark, SF0001, "nation") is not table(spark, SF0001, "region")
    assert table(spark, SF0001, "nation") is not table(
        spark, "/root/testdata/sf0.01", "nation"
    )


def test_cached_events_is_normalized(spark):
    ev = table(spark, SF0001, "events")
    assert ev is table(spark, SF0001, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType)


def test_cached_relation_still_answers(spark):
    assert table(spark, SF0001, "nation").count() == 25
