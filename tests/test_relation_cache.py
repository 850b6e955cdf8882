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


def test_cache_lives_on_the_session_object(spark):
    """r9 (ADVICE r8): no module-level registry may hold the session.

    A module-level WeakKeyDictionary could never evict — cached
    DataFrames strong-ref their session, so the values kept the key
    alive.  The cache must live as an attribute of the session object
    so its lifetime follows the session exactly.
    """
    import os

    import raster2points_spark.io as io_mod

    table(spark, SF0001, "nation")
    assert (os.path.abspath(SF0001), "nation") in spark._r2p_relations
    assert not hasattr(io_mod, "_RELATION_CACHE")


def test_utc_repinned_after_conf_drift(spark):
    """r9 (ADVICE r8): the UTC pin re-checks the conf on every load.

    Queries run in the DRIVER's session; if co-hosted code resets the
    session TZ between keys, the next t() load must restore UTC or
    every timestamp↔epoch key silently diverges from the oracle.
    """
    from raster2points_spark.queries._util import t

    t(spark, SF0001, "nation")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    t(spark, SF0001, "region")
    assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
