"""Structured Streaming surface over the events table.

Two layers:
- ``read_events_stream``: file-source stream of the events parquet with
  the same footer-sniffed timestamp normalization as the batch loader
  (raster2points_spark.io.load_events).  The single testdata file is
  materialized once as N time-sliced part files so availableNow replay
  with ``maxFilesPerTrigger=1`` runs N genuine micro-batches —
  watermark advancement, progressive window close, and state expiry are
  actually exercised, not collapsed into one mega-batch.
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
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from raster2points_spark.io import _EVENTS_RAW_SCHEMA, parquet_ts_type

# micro-batches per replay; sliced by event time so the watermark
# advances monotonically batch-over-batch (chronological arrival).
N_STREAM_SLICES = 8


def _split_events(src: str) -> str:
    """Materialize ``src`` (one parquet file) as N_STREAM_SLICES
    ts-ordered part files in a scratch dir, cached per (path, mtime).

    pyarrow does the slice — no Spark job at plan-build time.  Part
    mtimes are set strictly increasing because the file stream source
    orders pending files by modification time; names are zero-padded
    as a tiebreak.  The written slices keep the source's physical ts
    type (pyarrow preserves the schema), so the reader's footer sniff
    applies unchanged.
    """
    # size is part of the key: the corpus is regenerated between
    # rounds, and an install that preserves mtime (cp -p, rsync -t)
    # must not serve stale slices.
    st = os.stat(src)
    key = f"{os.path.abspath(src)}:{st.st_mtime}:{st.st_size}:{N_STREAM_SLICES}"
    digest = hashlib.md5(key.encode()).hexdigest()[:10]
    stream_dir = os.path.join(tempfile.gettempdir(), f"r2p_stream_{digest}")
    if os.path.isdir(stream_dir):
        return stream_dir
    import shutil

    import pyarrow.parquet as pq

    tbl = pq.read_table(src)
    tbl = tbl.sort_by("ts")
    n = max(1, min(N_STREAM_SLICES, tbl.num_rows))
    # build in a private tmp dir, then one atomic rename into place —
    # a concurrent session never observes half-written part files.
    tmp = f"{stream_dir}.tmp.{os.getpid()}"
    os.makedirs(tmp, exist_ok=True)
    step = -(-tbl.num_rows // n)  # ceil division
    now = time.time()
    for i in range(n):
        part = os.path.join(tmp, f"part-{i:05d}.parquet")
        pq.write_table(tbl.slice(i * step, step), part)
        os.utime(part, (now + i, now + i))
    try:
        os.rename(tmp, stream_dir)
    except OSError:
        # a concurrent builder won the rename; its content is identical
        shutil.rmtree(tmp, ignore_errors=True)
    return stream_dir


def read_events_stream(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """events.parquet as a streaming source, ``ts`` normalized to
    TimestampType (µs) exactly like the batch loader: footer-sniffed
    unit, raw-int64 workaround only for genuine ns storage.

    ``max_files_per_trigger`` controls replay granularity: 1 runs all
    N_STREAM_SLICES micro-batches (maximum watermark/state exercise);
    heavier stateful operators (stream-stream join) can pass a coarser
    value — still multi-batch, but with proportionally fewer
    state-store commit rounds.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")  # see queries._util.t
    src = os.path.join(sf_dir, "events.parquet")
    stream_dir = src if os.path.isdir(src) else _split_events(src)
    typ = parquet_ts_type(stream_dir)
    unit = getattr(typ, "unit", None)
    reader = spark.readStream.option(
        "maxFilesPerTrigger", str(max_files_per_trigger)
    )
    if unit == "ns":
        raw = reader.schema(_EVENTS_RAW_SCHEMA).parquet(stream_dir)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    if unit is None:
        # same contract as io.load_events: plain int64 = epoch µs;
        # anything else is an error, never a guess.
        import pyarrow as pa

        if typ != pa.int64():
            raise ValueError(f"events.ts has unsupported parquet type {typ!r}")
        raw = reader.schema(_EVENTS_RAW_SCHEMA).parquet(stream_dir)
        return raw.withColumn("ts", F.expr("timestamp_micros(ts)"))
    ts_ddl = "timestamp_ntz" if getattr(typ, "tz", None) is None else "timestamp"
    schema = (
        f"event_id long, ts {ts_ddl}, user_id long, "
        "event_type string, value double, props string"
    )
    raw = reader.schema(schema).parquet(stream_dir)
    return raw.withColumn("ts", F.col("ts").cast("timestamp"))


STREAM_SHUFFLE_PARTITIONS = "4"


class scoped_shuffle_partitions:
    """Temporarily lower spark.sql.shuffle.partitions for a bounded
    stream replay.  Stateful operators create one state-store instance
    per shuffle partition PER MICRO-BATCH; at replay scale (10k-100k
    rows, 8 batches) 32 partitions is pure per-task overhead — 4×
    fewer cuts stream_stream_join from ~35 s to ~10 s at sf0.01.  On
    a real cluster the state partition count is sized to state volume
    instead; the conf is restored on exit so batch plans are untouched.
    """

    _depth = 0  # reentrancy guard: only the OUTERMOST scope restores,
    _outer_prev: str | None = None  # so nested/overlapping scopes can't
    # capture the temporary value as "previous" and pin the session low.

    def __init__(self, spark: SparkSession, n: str = STREAM_SHUFFLE_PARTITIONS):
        self.spark, self.n = spark, n

    def __enter__(self):
        cls = scoped_shuffle_partitions
        if cls._depth == 0:
            cls._outer_prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        cls._depth += 1
        self.spark.conf.set("spark.sql.shuffle.partitions", self.n)

    def __exit__(self, *exc):
        cls = scoped_shuffle_partitions
        cls._depth -= 1
        if cls._depth == 0 and cls._outer_prev is not None:
            self.spark.conf.set("spark.sql.shuffle.partitions", cls._outer_prev)
        return False


def run_available_now(df: DataFrame, name: str, output_mode: str = "append") -> DataFrame:
    """Drain a streaming DataFrame into a memory sink; return the table."""
    spark = df.sparkSession
    for q in spark.streams.active:
        if q.name == name:
            q.stop()
    ckpt = tempfile.mkdtemp(prefix=f"ckpt_{name}_")
    with scoped_shuffle_partitions(spark):
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
