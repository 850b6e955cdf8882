"""Corpus-assumption guards (FIXTURES.md §A, SURVEY §7 R3).

The driver regenerates /root/testdata between rounds and has already
changed dtypes once (events.ts ns→µs, l_shipdate/o_orderdate ms→µs).
These pyarrow-only checks fail LOUDLY when an assumption the query
layer depends on stops holding, instead of letting the oracle gate
discover it.  No Spark session needed — they run in milliseconds.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.conftest import SF0001, SF001

SF_DIRS = [SF0001, SF001]


def _schema(sf_dir, name):
    return pq.read_schema(os.path.join(sf_dir, f"{name}.parquet"))


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_events_ts_is_spark_readable_or_handled(sf_dir):
    """Any timestamp unit is fine — ns has a dedicated loader path —
    but a non-timestamp, non-int64 ts would break both paths."""
    typ = _schema(sf_dir, "events").field("ts").type
    assert pa.types.is_timestamp(typ) or typ == pa.int64()


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_date_columns_are_not_ns(sf_dir):
    """l_shipdate/o_orderdate are read with plain spark.read.parquet,
    which throws PARQUET_TYPE_ILLEGAL on NANOS — if this fires, those
    tables need the same footer-sniffed loader treatment as events."""
    for tbl, col in [("lineitem", "l_shipdate"), ("orders", "o_orderdate")]:
        typ = _schema(sf_dir, tbl).field(col).type
        assert pa.types.is_timestamp(typ) and typ.unit != "ns", f"{tbl}.{col} is {typ}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_embeddings_shape(sf_dir):
    """sim_* / dedup_embed assume fixed-dim float vectors."""
    tbl = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"))
    assert pa.types.is_list(tbl.schema.field("embedding").type)
    lens = {len(v) for v in tbl.column("embedding").to_pylist()[:50]}
    assert lens == {64}, f"embedding dims changed: {lens}"


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_expected_columns_present(sf_dir):
    expect = {
        "region": {"r_regionkey", "r_name"},
        "nation": {"n_nationkey", "n_name", "n_regionkey"},
        "customer": {"c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"},
        "supplier": {"s_suppkey", "s_name", "s_nationkey", "s_acctbal"},
        "part": {"p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"},
        "orders": {
            "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate", "o_orderpriority",
        },
        "lineitem": {
            "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        },
        "events": {"event_id", "ts", "user_id", "event_type", "value", "props"},
        "documents": {"doc_id", "text", "lang", "source", "n_chars"},
        "embeddings": {"vec_id", "embedding", "label"},
    }
    for tbl, cols in expect.items():
        names = set(_schema(sf_dir, tbl).names)
        assert cols <= names, f"{tbl} missing {cols - names}"


def test_events_natural_order_is_ts_sorted():
    """The streaming replay slices by ts; if the corpus stops being
    ts-sorted, re-check FIXTURES.md §C's out-of-orderness claims."""
    t = pq.read_table(os.path.join(SF001, "events.parquet"), columns=["ts"])
    a = t.column("ts").to_numpy()
    assert int((a[1:] < a[:-1]).sum()) == 0
