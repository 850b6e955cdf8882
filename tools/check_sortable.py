"""Pre-flight for the grading driver's canonicalizer.

The driver canonicalizes each result with pandas ``sort_values`` over
ALL columns before hashing — any unhashable/unorderable cell type
(list, dict, mixed types) crashes it and records a FAIL even when the
answer is right (r1: fn_array, agg_collect_sorted).  This tool runs the
first-N window keys end-to-end (Spark AND DuckDB oracle), applies the
same sort, and reports any key whose frame is not driver-sortable.

Usage: python tools/check_sortable.py [N=50]
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from raster2points_spark.entry import oracle_sql, queries
from raster2points_spark.io import TABLES
from raster2points_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def driver_sort(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return df.sort_values(by=list(df.columns))


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50
    spark = get_spark("check_sortable")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    qs, os_ = queries(), oracle_sql()
    bad = []
    for key in list(qs)[:n]:
        try:
            driver_sort(qs[key](spark, SF).toPandas())
            if key in os_:
                driver_sort(con.execute(os_[key]).df())
            print(f"ok {key}")
        except Exception as e:
            print(f"XX {key}: {type(e).__name__}: {e}")
            bad.append(key)
    print(f"\n{n - len(bad)} sortable, {len(bad)} NOT driver-sortable: {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
