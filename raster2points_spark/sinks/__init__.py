"""Distributed raster sinks — the write half of the GeoTIFF story.

``sources/minitiff.py`` reads what GDAL writes; this package writes
what GDAL (and our own reader) can read back.  See
:mod:`raster2points_spark.sinks.geotiff`.
"""

from raster2points_spark.sinks.geotiff import encode_geotiff, write_geotiffs

__all__ = ["encode_geotiff", "write_geotiffs"]
