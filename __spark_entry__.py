"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export; implementations live in raster2points_spark.entry and
the per-operator modules under raster2points_spark/queries/ (each key
documents its SURVEY.md §2 row and determinism rules).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from raster2points_spark.entry import entry, oracle_sql, queries  # noqa: F401,E402

__all__ = ["entry", "queries", "oracle_sql"]
