"""Generate the committed golden GeoTIFF fixtures (fixtures/tif/).

Byte-stable by construction (struct packing + zlib level 6, no
timestamps): re-running must reproduce the committed bytes exactly,
like tools/make_grid.py.  The pixel values mirror the grid4 parquet
fixture's band semantics (FIXTURES.md §B): band 1 masks one pixel with
nodata, band 2 has nodata at a DIFFERENT pixel (kept as NULL), so the
README quickstart and the fixture test share one golden answer:
7 points, (10.25, 44.75) -> (1.0, 10.0), (10.75, 44.75) -> (2.0, NULL).

Five files exercise the mini reader's real-world layouts:
- elev.tif    single-band, striped, deflate (Compression=8)
- slope.tif   single-band, striped, uncompressed
- stack2.tif  BOTH bands in one file, tiled 4x4 (COG-style), deflate
- pyramid.tif 8x4 full-res + a 2-level COG overview pyramid (IFD 1:
  4x2 TILED 2x2 deflate = 2x2 box means; IFD 2: 2x1 striped = 4x4
  means), overview IFDs GDAL-style with NO geo tags (reader must
  inherit + scale the full-res transform)
- mask1.tif   1-bit bilevel mask (BitsPerSample=1, MSB-first,
  row-aligned), GDAL_NODATA=0 — the reference's raster #1 role as it
  commonly ships
- sparse_mask.tif  4x4 tiled 2x2 deflate with BOTH remaining common
  COG layouts: the bottom-right tile is all-nodata and stored SPARSE
  (TileOffsets=0, GDAL SPARSE_OK), and an internal 1-bit
  FILETYPE_MASK SubIFD (tag 330, the GDAL .msk-in-file convention)
  zeroes four pixels — two in stored tiles, two over the sparse tile
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_minitiff import _append_overview, _write_tiff  # golden-tested writer

W, H = 4, 2
BAND1 = [1.0, 2.0, -9999.0, 4.0, 5.0, 6.0, 7.0, 8.0]
BAND2 = [10.0, -9999.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]

# pyramid.tif: full res 8x4 (value = row*8 + col, exact 2x2/4x4 means
# in f8), overview levels computed as box means — the GDAL "average"
# resampling convention
PYR_W, PYR_H = 8, 4
PYR_FULL = [float(r * PYR_W + c) for r in range(PYR_H) for c in range(PYR_W)]
PYR_OV1 = [
    sum(PYR_FULL[(2 * r + dr) * PYR_W + 2 * c + dc] for dr in (0, 1) for dc in (0, 1)) / 4.0
    for r in range(2)
    for c in range(4)
]
PYR_OV2 = [
    sum(PYR_FULL[(4 * r + dr) * PYR_W + 4 * c + dc] for dr in range(4) for dc in range(4)) / 16.0
    for r in range(1)
    for c in range(2)
]

# mask1.tif: 1-bit mask raster over the same 4x2 grid as elev.tif —
# zeros at DIFFERENT pixels (idx 3, 5) than elev's nodata (idx 2), so
# the mask-first chain shows both semantics at once
MASK_BITS = [1, 1, 1, 0, 1, 0, 1, 1]

# sparse_mask.tif: 4x4, value = row*4 + col + 1, bottom-right 2x2 tile
# all nodata -> stored sparse; internal mask zeros at (0,1), (1,2)
# (stored tiles -> rows DROP) and (2,3), (3,2) (over the sparse tile
# -> those nodata pixels also drop; the surviving sparse pixels (2,2),
# (3,3) stay as NULL values).  Golden: 12 points.
SPARSE_W = SPARSE_H = 4
SPARSE_VALS = [
    float(r * 4 + c + 1) if not (r >= 2 and c >= 2) else -9999.0
    for r in range(4)
    for c in range(4)
]
SPARSE_MASK = [
    0 if (r, c) in ((0, 1), (1, 2), (2, 3), (3, 2)) else 1
    for r in range(4)
    for c in range(4)
]


# mixed-resolution pair (fixtures/tif_mixed/, SEPARATE dir so the
# catalog/extent-prune goldens over fixtures/tif stay stable):
# - fine.tif    4x4 @ 0.5 deg covering (10,43)-(12,45), value r*4+c+1,
#               the top-right 2x2 block all nodata (so the coarse
#               raster shows through INSIDE fine's extent)
# - coarse.tif  4x4 @ 1.0 deg covering (10,42)-(14,46), value 100+r*4+c
# Golden mosaic on the coarse grid (raster_mosaic_hetero): fine box
# means 3.5 / 11.5 / 13.5 win at (10.5,44.5), (10.5,43.5), (11.5,43.5);
# every other cell (incl. (11.5,44.5), fine's nodata block) is coarse.
FINE_VALS = [
    -9999.0 if (r < 2 and c >= 2) else float(r * 4 + c + 1)
    for r in range(4)
    for c in range(4)
]
COARSE_VALS = [float(100 + r * 4 + c) for r in range(4) for c in range(4)]


def main() -> int:
    out = os.path.join(REPO, "fixtures", "tif")
    os.makedirs(out, exist_ok=True)
    _write_tiff(os.path.join(out, "elev.tif"), BAND1, W, H, compression=8)
    # slope.tif deliberately carries NO geokey directory (crs=None):
    # the catalog's crs column must surface NULL for pre-geokey files,
    # and the oracle VALUES pins both the present and absent paths
    _write_tiff(os.path.join(out, "slope.tif"), BAND2, W, H, crs=None)
    _write_tiff(
        os.path.join(out, "stack2.tif"),
        None,
        W,
        H,
        bands=[BAND1, BAND2],
        tile=(4, 4),
        compression=8,
    )
    pyr = os.path.join(out, "pyramid.tif")
    _write_tiff(pyr, PYR_FULL, PYR_W, PYR_H, compression=8)
    _append_overview(pyr, PYR_OV1, 4, 2, compression=8, tile=(2, 2))
    _append_overview(pyr, PYR_OV2, 2, 1, compression=8)
    _write_tiff(os.path.join(out, "mask1.tif"), MASK_BITS, W, H, dtype="b1", nodata="0")
    _write_tiff(
        os.path.join(out, "sparse_mask.tif"),
        SPARSE_VALS,
        SPARSE_W,
        SPARSE_H,
        tile=(2, 2),
        compression=8,
        sparse=True,
        mask_bits=SPARSE_MASK,
    )
    mixed = os.path.join(REPO, "fixtures", "tif_mixed")
    os.makedirs(mixed, exist_ok=True)
    _write_tiff(os.path.join(mixed, "fine.tif"), FINE_VALS, 4, 4, compression=8)
    _write_tiff(
        os.path.join(mixed, "coarse.tif"),
        COARSE_VALS,
        4,
        4,
        pixel_scale=(1.0, 1.0),
        tiepoint=(0.0, 0.0, 0.0, 10.0, 46.0, 0.0),
        compression=8,
    )
    for f in (
        "elev.tif",
        "slope.tif",
        "stack2.tif",
        "pyramid.tif",
        "mask1.tif",
        "sparse_mask.tif",
    ):
        p = os.path.join(out, f)
        print(f"{f}: {os.path.getsize(p)} bytes")
    for f in ("fine.tif", "coarse.tif"):
        p = os.path.join(mixed, f)
        print(f"tif_mixed/{f}: {os.path.getsize(p)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
