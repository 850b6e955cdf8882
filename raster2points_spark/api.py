"""Public API — mirrors the reference's two entry points.

reference (reconstructed, SURVEY §0):
    raster2points/raster2points.py::raster2df(*rasters, col_names=None,
        max_block_size=4096, calc_area=False) -> pandas.DataFrame
    raster2points/raster2points.py::raster2csv(*rasters, output, ...)

here:
    raster2df(spark, tiles, bands, ...)  -> pyspark DataFrame (lazy)
    raster2csv(spark, tiles, bands, output, separator=",", ...)

Inputs are tile tables (path or DataFrame) instead of GeoTIFF paths —
the scale-native landing format (see sources/tiles.py).  Tiling
replaces ``max_block_size``: the tile table is already blocked, and
Spark partitioning replaces the reference's parallelpipe workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from raster2points_spark.operators.grid import raster2points
from raster2points_spark.sources.tiles import read_tiles


def _as_tiles(spark: SparkSession, tiles: DataFrame | str) -> DataFrame:
    return read_tiles(spark, tiles) if isinstance(tiles, str) else tiles


def raster2df(
    spark: SparkSession,
    tiles: DataFrame | str,
    bands: list[str],
    col_names: list[str] | None = None,
    calc_area: bool = False,
) -> DataFrame:
    """Convert raster bands to a point table: band 1 masks (NoData
    rows dropped), bands 2..N contribute nullable value columns,
    coordinates are pixel centers.  Lazy — compose freely before
    writing."""
    return raster2points(_as_tiles(spark, tiles), bands, col_names, calc_area)


def raster2csv(
    spark: SparkSession,
    tiles: DataFrame | str,
    bands: list[str],
    output: str,
    col_names: list[str] | None = None,
    calc_area: bool = False,
    separator: str = ",",
) -> None:
    """CSV sink variant (the reference CLI's contract: ``,``/``;``/tab
    separators).  Writes a directory of part files — each task streams
    its partition; no driver-side concat."""
    df = raster2df(spark, tiles, bands, col_names, calc_area)
    df.write.mode("overwrite").option("sep", separator).option("header", "true").csv(output)
