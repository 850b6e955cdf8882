"""Measure probe-point wall-clock variance on identical code+data.

The scale probe's retry-on-gate-fail policy (tools/scale_probe.py::
_noise_retry) rests on a measured claim: heavy probe points swing
substantially between back-to-back runs of byte-identical code on the
same data, and the noise is strictly additive (GC, co-tenant CPU,
page cache).  r9 established the basis ad hoc
(reports/probe_variance_r9.txt); this tool makes the measurement
repeatable so each round can re-record it alongside the bench
(VERDICT r9 #7).

Three representative heavy points, N back-to-back timed runs each
(after one warm-up), same session:

  dedup_jaccard          @ the x100 dedup-fair document corpus
  dedup_semantic_cluster @ the x10 rotation-fair embedding corpus
  raster_flow_direction  @ the 5120x5120 synthetic pixel grid

Usage: python tools/probe_variance.py [N] > reports/probe_variance_rX.txt
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark

SF01 = "/root/testdata/sf0.1"


def main() -> int:
    n_runs = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from scale_probe import build_x10_dedup, build_xemb, build_xraster

    spark = get_spark("probe_variance")
    reg = load_all()
    reg["scan_parquet"].fn(spark, SF01).count()  # session warm-up

    dd100 = build_x10_dedup(SF01, copies_n=100)
    em10 = build_xemb(SF01, copies_n=10)
    grid = build_xraster(5120)

    points = [
        ("dedup_jaccard @ x100 docs", "dedup_jaccard", dd100, None),
        ("dedup_semantic_cluster @ x10 vecs", "dedup_semantic_cluster", em10, None),
        ("raster_flow_direction @ 5120^2 px", "raster_flow_direction", SF01, grid),
    ]

    print(
        f"== probe-point variance, N={n_runs} back-to-back runs, "
        "identical code+data =="
    )
    print(f"{'point':42s} {'runs (s)':>24s} {'min':>8s} {'max':>8s}  max/min")
    worst = 1.0
    for label, key, sf_dir, raster_grid in points:
        if raster_grid is not None:
            os.environ["SPARK_GRAFT_RASTER_GRID"] = raster_grid
            os.environ["SPARK_GRAFT_RASTER_W"] = "5120"
        try:
            reg[key].fn(spark, sf_dir).count()  # warm this point once
            ts = []
            for _ in range(n_runs):
                t0 = time.time()
                reg[key].fn(spark, sf_dir).count()
                ts.append(time.time() - t0)
        finally:
            if raster_grid is not None:
                os.environ.pop("SPARK_GRAFT_RASTER_GRID", None)
                os.environ.pop("SPARK_GRAFT_RASTER_W", None)
        spread = max(ts) / max(min(ts), 1e-9)
        worst = max(worst, spread)
        runs = " ".join(f"{t:8.2f}" for t in ts)
        print(f"{label:42s} {runs:>24s} {min(ts):7.2f}s {max(ts):7.2f}s {spread:7.2f}x")

    print(
        f"\nConclusion: worst max/min spread {worst:.2f}x across {n_runs} "
        "warm back-to-back runs of identical code+data.  Box noise is "
        "additive (spikes only inflate), which is why a gate-tripping "
        "ladder earns ONE re-measure gated on the retry ladder as "
        "measured (tools/scale_probe.py::_noise_retry), and why the "
        "bench's batched headline is the min of two passes with both "
        "raw passes recorded in the detail file."
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
