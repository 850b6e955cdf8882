"""Generate the committed golden GeoTIFF fixtures (fixtures/tif/).

Byte-stable by construction (struct packing + zlib level 6, no
timestamps): re-running must reproduce the committed bytes exactly,
like tools/make_grid.py.  The pixel values mirror the grid4 parquet
fixture's band semantics (FIXTURES.md §B): band 1 masks one pixel with
nodata, band 2 has nodata at a DIFFERENT pixel (kept as NULL), so the
README quickstart and the fixture test share one golden answer:
7 points, (10.25, 44.75) -> (1.0, 10.0), (10.75, 44.75) -> (2.0, NULL).

Three files exercise the mini reader's real-world layouts:
- elev.tif   single-band, striped, deflate (Compression=8)
- slope.tif  single-band, striped, uncompressed
- stack2.tif BOTH bands in one file, tiled 4x4 (COG-style), deflate
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tests.test_minitiff import _write_tiff  # the golden-tested writer

W, H = 4, 2
BAND1 = [1.0, 2.0, -9999.0, 4.0, 5.0, 6.0, 7.0, 8.0]
BAND2 = [10.0, -9999.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]


def main() -> int:
    out = os.path.join(REPO, "fixtures", "tif")
    os.makedirs(out, exist_ok=True)
    _write_tiff(os.path.join(out, "elev.tif"), BAND1, W, H, compression=8)
    _write_tiff(os.path.join(out, "slope.tif"), BAND2, W, H)
    _write_tiff(
        os.path.join(out, "stack2.tif"),
        None,
        W,
        H,
        bands=[BAND1, BAND2],
        tile=(4, 4),
        compression=8,
    )
    for f in ("elev.tif", "slope.tif", "stack2.tif"):
        p = os.path.join(out, f)
        print(f"{f}: {os.path.getsize(p)} bytes")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
