"""Dump .explain("formatted") for the given keys to files.

Usage:
    python tools/explain_keys.py --out plans/r15 --suffix _after key1 key2 ...

Writes <out>/<key><suffix>.txt for each key.  Run from a pre-change
checkout with --suffix _before to capture the baseline plans.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.plans.inspect import explain_formatted
from raster2points_spark.registry import load_all
from raster2points_spark.session import get_spark


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("keys", nargs="+")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--out", required=True)
    ap.add_argument("--suffix", default="")
    args = ap.parse_args()

    registry = load_all()
    spark = get_spark("explain")
    os.makedirs(args.out, exist_ok=True)
    for key in args.keys:
        spec = registry.get(key)
        if spec is None:
            print(f"{key}: NOT REGISTERED", file=sys.stderr)
            continue
        df = spec.fn(spark, args.sf_dir)
        plan = explain_formatted(df)
        path = os.path.join(args.out, f"{key}{args.suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
