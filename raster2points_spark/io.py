"""Table loading + sinks.

All reads are plain ``spark.read.parquet`` so Catalyst gets parquet
column pruning / predicate pushdown / row-group stats pruning for
free.  At 100 TB these tables would be directory-partitioned; the
loader takes any path, so partitioned layouts work unchanged.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dimension tables small enough to broadcast at ANY scale factor —
# region/nation are fixed-size (5/25 rows) even at 100 TB.
BROADCAST_DIMS = frozenset({"region", "nation"})


# Some corpus generations store events.ts as parquet TIMESTAMP(NANOS),
# which Spark 4 refuses to read as a timestamp ([PARQUET_TYPE_ILLEGAL]).
# For that case only, we read ts as raw int64 nanos via an explicit
# schema (works in ANY session, no conf needed) and truncate to µs with
# exact integer division.  The current corpus stores timestamp[us]
# (NTZ), which Spark reads natively — so the unit is SNIFFED from the
# parquet footer per file, never assumed (a ts-unit assumption baked in
# as an invariant cost 7 correctness rows in round 3).
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def parquet_ts_type(path: str, field: str = "ts"):
    """pyarrow type of ``field`` from the parquet footer.  Accepts a
    bare file or a directory of part files (checks the first).

    RAISES on an unreadable footer / missing field / empty directory —
    a sniff failure must never be silently conflated with "plain
    int64" (that failure mode is exactly the r3 clock-compression bug
    class; fail LOUDLY instead)."""
    import pyarrow.parquet as pq

    p = path
    if os.path.isdir(p):
        parts = sorted(
            f
            for f in os.listdir(p)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        if not parts:
            raise FileNotFoundError(f"no parquet part files in {path!r}")
        p = os.path.join(p, parts[0])
    return pq.read_schema(p).field(field).type  # KeyError/OSError propagate


def parquet_ts_unit(path: str, field: str = "ts"):
    """Time unit ('s'/'ms'/'us'/'ns') of ``field``, or None when the
    column is stored as a non-timestamp type (e.g. plain int64).
    Raises when the footer itself cannot be read."""
    return getattr(parquet_ts_type(path, field), "unit", None)


def load_events(spark: SparkSession, path: str) -> DataFrame:
    """events with ``ts`` normalized to TimestampType (µs precision).

    ns storage → raw-int64 read + integer div (Spark can't read NANOS);
    plain int64 → treated as epoch µs; logical timestamps → native
    read, with a cast that lifts TIMESTAMP_NTZ to TimestampType
    (identity wall-clock under the UTC session TZ the query layer pins
    — queries/_util.t).  Any other storage type is an error, not a
    guess.
    """
    import pyarrow as pa

    typ = parquet_ts_type(path)
    unit = getattr(typ, "unit", None)
    if unit == "ns":
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if unit is not None:
        return spark.read.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))
    if typ == pa.int64():
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts)"))
    raise ValueError(f"events.ts has unsupported parquet type {typ!r} in {path!r}")


def local_df(spark: SparkSession, rows, schema: str) -> DataFrame:
    """Small local-data DataFrame via the ARROW path (pandas input).

    ``spark.createDataFrame(list_of_tuples)`` plans as a pickled
    Python-RDD scan: every task spins a Python worker to unpickle its
    slice, so even a 6-row relation costs ~0.5 s across 32 spurious
    tasks — and coalescing it to one task is WORSE (the merged task
    round-trips the worker once per parent partition, measured ~4-5 s
    for 32 slices).  Routing the same rows through a pandas frame uses
    Spark's Arrow conversion instead, which plans a pure-JVM
    LocalTableScan: no Python at execution time, one task, ~3x faster
    even for row counts in the thousands (guide: eliminate the
    JVM<->Python boundary where a built-in path exists).

    ``dtype=object`` keeps None as None so Arrow converts it to a SQL
    NULL — a numeric pandas column would coerce None to NaN first.
    The explicit ``schema`` (DDL string) fixes the column types exactly
    like the tuple path did.
    """
    import pandas as pd
    from pyspark.sql.types import StructType

    names = StructType.fromDDL(schema).fieldNames()
    pdf = pd.DataFrame(list(rows), columns=names, dtype=object)
    return spark.createDataFrame(pdf, schema)


# Per-session relation cache (the catalog pattern): building a reader
# costs a py4j round-trip plus a footer read PER CALL, which at ~97
# benchmark keys × ~2 tables each is pure fixed overhead — a real
# engine resolves a table name through its catalog once.  DataFrames
# are immutable and every corpus directory here is write-once
# (testdata is read-only; probe corpora are content-digest-keyed).
# The dict lives ON the session object itself — not in a module-level
# WeakKeyDictionary, which could never evict because cached DataFrames
# hold a strong ref to their session (df._session → value keeps key
# alive; r8 ADVICE) — so its lifetime genuinely follows the session:
# a stopped/replaced session drops the attribute with the object, and
# a fresh session starts with no cache.


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    per_session = getattr(spark, "_r2p_relations", None)
    if per_session is None:
        per_session = spark._r2p_relations = {}
    key = (os.path.abspath(sf_dir), name)
    df = per_session.get(key)
    if df is None:
        path = os.path.join(sf_dir, f"{name}.parquet")
        df = load_events(spark, path) if name == "events" else spark.read.parquet(path)
        per_session[key] = df
    return df


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(table(spark, sf_dir, n) for n in names)


def register_views(spark: SparkSession, sf_dir: str, names: tuple[str, ...] = TABLES) -> None:
    """Temp views for queries expressed in Spark SQL."""
    for n in names:
        table(spark, sf_dir, n).createOrReplaceTempView(n)


def write_parquet(df: DataFrame, path: str, mode: str = "overwrite", **options: str) -> None:
    df.write.mode(mode).options(**options).parquet(path)


def write_csv(
    df: DataFrame, path: str, sep: str = ",", header: bool = True, mode: str = "overwrite"
) -> None:
    """CSV sink with selectable separator — the reference CLI's output
    contract (raster2points/raster2points.py::raster2csv supports
    ``,``/``;``/tab).  Each Spark task streams its partition to its own
    file; no driver-side concat.
    """
    df.write.mode(mode).option("sep", sep).option("header", str(header).lower()).csv(path)
