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


# events.ts is parquet TIMESTAMP(NANOS) which Spark 4 refuses to read
# as a timestamp ([PARQUET_TYPE_ILLEGAL]).  Reading it as raw int64
# nanos via an explicit schema works in ANY session (no conf needed);
# we then convert to TimestampType at µs with exact integer division.
_EVENTS_RAW_SCHEMA = (
    "event_id long, ts long, user_id long, event_type string, value double, props string"
)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        raw = spark.read.schema(_EVENTS_RAW_SCHEMA).parquet(path)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    return spark.read.parquet(path)


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
