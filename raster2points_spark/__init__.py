"""raster2points_spark — a PySpark-native analytics engine with the
capabilities of ``wri/raster2points``, rebuilt Spark-first.

The reference (public GitHub repo ``wri/raster2points``; the local
mount ``/root/reference/`` was empty at survey time, see SURVEY.md §0)
is a single-node raster→point-table converter.  This package
re-expresses that dataflow — tiled scan → NoData mask → affine
projection → multi-band zip → geodesic area → CSV/Parquet sink — as
declarative DataFrame plans that Catalyst optimizes, and extends it
with the relational / LLM-data-pipeline / streaming operator surface
catalogued in SURVEY.md §2.

Public API (mirrors the reference's two entry points,
``raster2points/raster2points.py::raster2df`` / ``::raster2csv``):

    from raster2points_spark import raster2df, raster2csv
"""

from raster2points_spark.api import raster2csv, raster2df
from raster2points_spark.session import get_spark

__all__ = ["raster2df", "raster2csv", "get_spark"]
__version__ = "0.1.0"
