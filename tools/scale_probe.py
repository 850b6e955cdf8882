"""Scale probe: measured scaling behavior across sf0.001 → 0.01 → 0.1.

"Measure, don't guess": for each probed key, run the declared query at
all three shipped scale factors (same session, warmed) and report the
wall-clock plus the 0.01→0.1 growth ratio.  Data grows 10× per step —
a scale-safe plan should grow wall-clock well UNDER 10× at these sizes
(fixed job-submission cost amortizes; partial aggregation collapses
early), and must never grow super-linearly.

Usage: python tools/scale_probe.py [keys...]   (writes stdout; redirect
to reports/scale_probe_rN.txt to commit evidence)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark

SFS = [
    ("sf0.001", "/root/testdata/sf0.001"),
    ("sf0.01", "/root/testdata/sf0.01"),
    ("sf0.1", "/root/testdata/sf0.1"),
]

# heavy / representative keys where super-linear growth would show
DEFAULT_KEYS = [
    "agg_groupby",
    "join_broadcast_star",
    "tpch_q3",
    "sessionize_batch",
    "rle_events",
    "dedup_exact",
    "dedup_near",
    "dedup_jaccard",
    "dedup_chunks",
    "text_tfidf",
    "text_unigram_ppl",
    "sim_knn",
    "pack_sequences",
    "reshape_unpivot",
    "anomaly_mad",
]


def main() -> int:
    keys = sys.argv[1:] or DEFAULT_KEYS
    spark = get_spark("scale_probe")
    reg = load_all()
    # warm the session (JVM, codegen, FS caches) so sf0.001 numbers
    # aren't dominated by cold-start
    reg["scan_parquet"].fn(spark, SFS[0][1]).count()
    print(f"{'key':22s} {'sf0.001':>9s} {'sf0.01':>9s} {'sf0.1':>9s} {'x(0.01->0.1)':>13s}")
    worst = 0.0
    for key in keys:
        times = []
        for _, sf_dir in SFS:
            t0 = time.time()
            df = reg[key].fn(spark, sf_dir)
            df.count()
            times.append(time.time() - t0)
        ratio = times[2] / max(times[1], 1e-9)
        worst = max(worst, ratio)
        print(
            f"{key:22s} {times[0]:8.2f}s {times[1]:8.2f}s {times[2]:8.2f}s {ratio:12.1f}x"
        )
    print(
        f"\n10x data per step; worst 0.01->0.1 growth {worst:.1f}x "
        f"({'SUB-linear everywhere' if worst < 10 else 'SUPER-LINEAR KEY PRESENT'})"
    )
    return 0 if worst < 10 else 1


if __name__ == "__main__":
    raise SystemExit(main())
