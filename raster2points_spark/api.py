"""Public API — mirrors the reference's two entry points.

reference (reconstructed, SURVEY §0):
    raster2points/raster2points.py::raster2df(*rasters, col_names=None,
        max_block_size=4096, calc_area=False) -> pandas.DataFrame
    raster2points/raster2points.py::raster2csv(*rasters, output, ...)

here:
    raster2df(spark, tiles, bands, ...)  -> pyspark DataFrame (lazy)
    raster2csv(spark, tiles, bands, output, separator=",", ...)

Inputs are tile tables (path or DataFrame) — the scale-native landing
format (see sources/tiles.py) — or, reference-style, GeoTIFF paths
(a ``.tif`` path or a list of them): those convert through
sources/geotiff.py when rasterio is available, else through the
dependency-free mini reader (sources/minitiff.py — classic TIFF or
BigTIFF, striped or tiled, LZW/deflate/uncompressed, predictor 1/2/3,
single- or multi-band).
Tiling replaces ``max_block_size``: the tile table is
already blocked, and Spark partitioning replaces the reference's
parallelpipe workers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from raster2points_spark.operators.grid import (
    band_dtypes,
    raster2points,
    validate_band_alignment,
)
from raster2points_spark.sources.tiles import read_tiles


def tiles_from_rasters(
    spark: SparkSession,
    paths: list[str],
    tile_size: int | None = None,
    overview_level: int = 0,
) -> DataFrame:
    """GeoTIFF paths → tile table, band ids b1..bN positionally across
    files and samples (the reference's multi-raster convention, extended
    so one multi-band file contributes one band per sample).  Prefers
    the full rasterio adapter; falls back to the pure-Python mini reader
    (classic/BigTIFF, striped or tiled, LZW/deflate/uncompressed,
    PackBits, predictors 1/2/3, sub-byte 1/2/4-bit samples, COG
    overview IFDs) when rasterio is
    absent.
    ``tile_size=None`` aligns the grid with a tiled file's native tile
    layout (COG access pattern); striped files default to 512.
    ``overview_level=k`` reads the k-th COG overview pyramid level
    instead of full resolution — 1/4^k of the bytes for
    downsample-shaped queries (mini-reader path; the rasterio adapter
    takes full-res only and raises otherwise)."""
    if overview_level:
        from raster2points_spark.sources.minitiff import minitiff_to_tiles

        return minitiff_to_tiles(
            spark, paths, tile_size=tile_size, overview_level=overview_level
        )
    try:
        from raster2points_spark.sources.geotiff import geotiff_to_tiles

        return geotiff_to_tiles(spark, paths, tile_size=tile_size or 512)
    except ImportError:
        from raster2points_spark.sources.minitiff import minitiff_to_tiles

        return minitiff_to_tiles(spark, paths, tile_size=tile_size)


def _as_tiles(spark: SparkSession, tiles) -> DataFrame:
    if isinstance(tiles, (list, tuple)):
        return tiles_from_rasters(spark, list(tiles))
    if isinstance(tiles, str) and tiles.lower().endswith((".tif", ".tiff")):
        return tiles_from_rasters(spark, [tiles])
    return read_tiles(spark, tiles) if isinstance(tiles, str) else tiles


def raster2df(
    spark: SparkSession,
    tiles: DataFrame | str | list[str],
    bands: list[str],
    col_names: list[str] | None = None,
    calc_area: bool = False,
    max_block_size: int | None = None,
    validate: bool = True,
) -> DataFrame:
    """Convert raster bands to a point table: band 1 masks (NoData
    rows dropped), bands 2..N contribute nullable value columns,
    coordinates are pixel centers.  Lazy — compose freely before
    writing.  ``validate=True`` (default) runs the reference's eager
    pre-flight: unequal band resolutions or conflicting per-tile
    geometry raise before any pixel is read.

    ``max_block_size`` keeps the reference's memory-bound knob
    (``raster2df(..., max_block_size=4096)`` bounded each processing
    window to block² pixels): here it repartitions the tile table so
    each TASK handles ≈ max_block_size² pixels.  The pixel count comes
    from the tile METADATA columns (width·height) — a pruned scan that
    never touches the data arrays.  Default None = let Spark's file
    splits decide (the right answer on a real cluster)."""
    tdf = _as_tiles(spark, tiles)
    if validate:
        validate_band_alignment(tdf, bands)
    if max_block_size:
        import math

        from pyspark.sql import functions as F

        n_px = (
            tdf.filter(F.col("band_id") == bands[0])
            .agg(F.sum(F.col("width").cast("long") * F.col("height")))
            .first()[0]
            or 0
        )
        parts = max(1, math.ceil(n_px / float(max_block_size) ** 2))
        tdf = tdf.repartition(parts)
    # metadata-only dtype lookup (None for pre-dtype tile tables) —
    # value columns come out in each band's SOURCE numpy dtype, like
    # the reference's pandas frames (SURVEY §1.1(5))
    return raster2points(tdf, bands, col_names, calc_area, dtypes=band_dtypes(tdf, bands))


def raster2csv(
    spark: SparkSession,
    tiles: DataFrame | str | list[str],
    bands: list[str],
    output: str,
    col_names: list[str] | None = None,
    calc_area: bool = False,
    separator: str = ",",
    max_block_size: int | None = None,
    validate: bool = True,
) -> None:
    """CSV sink variant (the reference CLI's contract: ``,``/``;``/tab
    separators).  Writes a directory of part files — each task streams
    its partition; no driver-side concat."""
    df = raster2df(spark, tiles, bands, col_names, calc_area, max_block_size, validate)
    df.write.mode("overwrite").option("sep", separator).option("header", "true").csv(output)
