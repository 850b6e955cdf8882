"""Structured Streaming surface over the events table.

Two layers:
- ``read_events_stream``: file-source stream of the events parquet with
  the same ns→µs timestamp normalization as the batch loader
  (raster2points_spark.io.table).
- ``run_available_now``: run a streaming DataFrame to a memory sink
  with ``trigger(availableNow=True)`` and return the materialized
  batch result — the test/driver-friendly way to exercise real
  streaming semantics (watermarks, stateful dedup) on finite input.

On a real cluster the same plans run unchanged against a file/Kafka
source with a processing-time trigger; availableNow is just the
bounded-replay trigger.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster2points_spark.io import _EVENTS_RAW_SCHEMA


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet as a streaming source (ns ts → µs TimestampType).

    The file source requires a DIRECTORY; the testdata table is a bare
    file, so we expose it through a scratch dir of symlinks (no copy).
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see queries._util.t
    src = os.path.join(sf_dir, "events.parquet")
    if os.path.isdir(src):
        stream_dir = src
    else:
        digest = hashlib.md5(os.path.abspath(src).encode()).hexdigest()[:10]
        stream_dir = os.path.join(tempfile.gettempdir(), f"r2p_stream_{digest}")
        os.makedirs(stream_dir, exist_ok=True)
        link = os.path.join(stream_dir, "events.parquet")
        if not os.path.exists(link):
            os.symlink(src, link)
    raw = (
        spark.readStream.schema(_EVENTS_RAW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(stream_dir)
    )
    return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))


def run_available_now(df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame into a memory sink; return the table."""
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    return spark.table(name)
