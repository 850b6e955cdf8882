"""CLI — the reference's console entry point, Spark-edition.

reference (reconstructed): ``raster2csv in1.tif [in2.tif ...] out.csv
[--col_names ...] [--separator {,|;|t}] [--calc_area]``.

here: tile-table parquet in — or, reference-style, GeoTIFF paths
(rasterio when available, else the pure-Python mini reader: classic
TIFF or BigTIFF, striped or tiled/COG incl. overview IFDs,
none/LZW/deflate/PackBits compression, predictor 1/2/3, sub-byte
(1/2/4-bit) samples, single- or multi-band chunky/planar) — CSV/
Parquet directory out:

    python -m raster2points_spark.cli TILES_PARQUET OUT_DIR \
        --bands b1 b2 [--col-names elev slope] [--separator ';'] \
        [--calc-area] [--format csv|parquet]

    python -m raster2points_spark.cli in1.tif in2.tif OUT_DIR \
        [--col-names elev slope] ...    # bands default to b1..bN
                                        # across files AND samples
"""

from __future__ import annotations

import argparse

from raster2points_spark.api import raster2csv, raster2df
from raster2points_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="raster2points-spark")
    ap.add_argument(
        "inputs",
        nargs="+",
        metavar="TILES_OR_TIF",
        help="one tile-table parquet path, or N GeoTIFF paths (one band each)",
    )
    ap.add_argument("output")
    ap.add_argument("--bands", nargs="+", default=None)
    ap.add_argument("--col-names", nargs="+", default=None)
    ap.add_argument("--separator", default=",", choices=[",", ";", "t"])
    ap.add_argument("--calc-area", action="store_true")
    ap.add_argument("--format", default="csv", choices=["csv", "parquet"])
    ap.add_argument(
        "--max-block-size",
        type=int,
        default=None,
        help="bound each task to ~N^2 pixels (the reference's memory knob; "
        "default: let Spark's file splits decide)",
    )
    args = ap.parse_args(argv)

    tif_mode = all(p.lower().endswith((".tif", ".tiff")) for p in args.inputs)
    if len(args.inputs) > 1 and not tif_mode:
        ap.error("multiple inputs are only supported for GeoTIFF paths")
    tiles = args.inputs if tif_mode else args.inputs[0]
    bands = args.bands
    if bands is None and not tif_mode:
        ap.error("--bands is required for tile-table input")

    sep = "\t" if args.separator == "t" else args.separator
    spark = get_spark("raster2points_cli")

    # eager band validation: a typo'd band silently yields an empty
    # point table otherwise (the library API stays lazy; the CLI is
    # the user-facing surface, so it checks).  Tiny column scan.
    from pyspark.sql import functions as F

    from raster2points_spark.api import _as_tiles

    present = {
        r[0] for r in _as_tiles(spark, tiles).select(F.col("band_id")).distinct().collect()
    }
    if bands is None:
        # GeoTIFF default: every band the inputs yield, positionally
        # across files AND samples (b2 < b10 — numeric-aware sort)
        bands = sorted(present, key=lambda b: (len(b), b))
    missing = [b for b in bands if b not in present]
    if missing:
        ap.error(f"band(s) not in tile table: {missing}; present: {sorted(present)}")
    if args.format == "csv":
        raster2csv(
            spark, tiles, bands, args.output,
            col_names=args.col_names, calc_area=args.calc_area, separator=sep,
            max_block_size=args.max_block_size,
        )
    else:
        df = raster2df(
            spark, tiles, bands, col_names=args.col_names,
            calc_area=args.calc_area, max_block_size=args.max_block_size,
        )
        df.write.mode("overwrite").parquet(args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
