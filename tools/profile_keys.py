"""Per-key bench profiler: split a key's wall time into the BUILD
phase (spec.fn — driver pre-flight, internal collects/persists) and
the EXECUTE phase (the noop write), and count the Spark jobs each
phase submits.  The job count × the ~0.2 s local-mode submission
floor is the fixed-cost part of a key's wall; the remainder is plan
compute.  Usage:

    python tools/profile_keys.py key1 key2 ...     # sf0.1 by default
    python tools/profile_keys.py --runs 3 key ...
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("profile")
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    # warm like bench.py
    spark.range(1000).selectExpr("sum(id)").collect()
    from pyspark.sql import functions as F
    from pyspark.sql.functions import pandas_udf

    from raster2points_spark.io import table

    table(spark, args.sf_dir, "lineitem").select("l_orderkey").limit(10).collect()

    @pandas_udf("double")
    def _warm(v):
        return v * 1.0

    spark.range(100).select(_warm(F.col("id").cast("double"))).collect()

    print(f"{'key':32s} {'run':>3s} {'build_s':>8s} {'exec_s':>8s} {'jobs_b':>6s} {'jobs_e':>6s} {'stages':>6s}")
    for key in args.keys:
        spec = registry.get(key)
        if spec is None:
            print(f"{key}: NOT REGISTERED", file=sys.stderr)
            continue
        for run in range(args.runs):
            group = f"prof_{key}_{run}"
            sc.setJobGroup(group, key)
            j0 = set(tracker.getJobIdsForGroup(group))
            t0 = time.time()
            df = spec.fn(spark, args.sf_dir)
            t1 = time.time()
            jb = set(tracker.getJobIdsForGroup(group)) - j0
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            je = set(tracker.getJobIdsForGroup(group)) - j0 - jb
            n_stages = 0
            for j in jb | je:
                info = tracker.getJobInfo(j)
                if info is not None:
                    n_stages += len(info.stageIds)
            print(
                f"{key:32s} {run:3d} {t1 - t0:8.2f} {t2 - t1:8.2f} "
                f"{len(jb):6d} {len(je):6d} {n_stages:6d}"
            )
            sc.setJobGroup(None, None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
