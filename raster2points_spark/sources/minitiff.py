"""Pure-Python reader for small uncompressed striped (Geo)TIFFs.

The real GeoTIFF front door (sources/geotiff.py) needs rasterio, which
this environment cannot install — so the window-grid math there ran
only against synthetic metadata.  This module closes that gap: a
dependency-free parser for the subset of TIFF 6.0 the golden fixtures
use (single band, Compression=1, strip layout, both byte orders,
uint8/int16/uint16/int32/float32/float64), plus the GeoTIFF tags that
drive the tile-table transform (ModelPixelScale 33550, ModelTiepoint
33922, GDAL_NODATA 42113).

``minitiff_to_tiles`` mirrors geotiff_to_tiles' distributed shape
exactly — driver header pass for the window grid, executors read only
their own windows' bytes via mapInPandas — so the job shape itself is
exercised end-to-end against a REAL file layout, not a stub.

This is deliberately not a general TIFF library: tiled layout,
compression, multi-sample pixels and BigTIFF raise ValueError with the
offending tag, and full-fidelity ingestion remains geotiff_to_tiles on
a rasterio-equipped cluster.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from raster2points_spark.sources.geotiff import TILE_SCHEMA_DDL, window_grid

# TIFF tag ids
_W, _H = 256, 257
_BITS, _COMPRESSION, _PHOTO = 258, 259, 262
_STRIP_OFFSETS, _SAMPLES_PER_PX, _ROWS_PER_STRIP, _STRIP_COUNTS = 273, 277, 278, 279
_TILE_WIDTH = 322
_SAMPLE_FORMAT = 339
_MODEL_PIXEL_SCALE, _MODEL_TIEPOINT = 33550, 33922
_GDAL_NODATA = 42113

# (sample_format, bits) -> numpy dtype char (endian prefix added later)
_DTYPES = {
    (1, 8): "u1",
    (1, 16): "u2",
    (1, 32): "u4",
    (2, 16): "i2",
    (2, 32): "i4",
    (3, 32): "f4",
    (3, 64): "f8",
}

# short code -> the numpy NAME the tile table's dtype column uses
# (operators/grid.py NUMPY_TO_SPARK_DTYPE keys)
_DTYPE_NAMES = {
    "u1": "uint8",
    "u2": "uint16",
    "u4": "uint32",
    "i2": "int16",
    "i4": "int32",
    "f4": "float32",
    "f8": "float64",
}

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 8: "h", 9: "i", 11: "f", 12: "d"}


@dataclass
class MiniTiff:
    """Header of one parsed mini-TIFF (no pixel data held)."""

    path: str
    width: int
    height: int
    dtype: str  # numpy dtype string WITH endian prefix, e.g. "<f8"
    bytes_per_sample: int
    rows_per_strip: int
    strip_offsets: list[int]
    transform: list[float]  # [a, b, c, d, e, f] row-major affine
    nodata: float  # nan when absent


def _read_ifd_entries(buf: bytes, bo: str):
    (ifd_off,) = struct.unpack_from(bo + "I", buf, 4)
    (n,) = struct.unpack_from(bo + "H", buf, ifd_off)
    for i in range(n):
        base = ifd_off + 2 + 12 * i
        tag, typ, count = struct.unpack_from(bo + "HHI", buf, base)
        size = _TYPE_SIZES.get(typ, 1) * count
        if size <= 4:
            val_off = base + 8
        else:
            (val_off,) = struct.unpack_from(bo + "I", buf, base + 8)
        yield tag, typ, count, val_off


def _values(buf: bytes, bo: str, typ: int, count: int, off: int):
    if typ == 2:  # ASCII
        raw = buf[off : off + count]
        return raw.split(b"\x00")[0].decode("ascii", "replace")
    if typ in (5, 10):  # RATIONAL
        out = []
        fmt = "II" if typ == 5 else "ii"
        for i in range(count):
            num, den = struct.unpack_from(bo + fmt, buf, off + 8 * i)
            out.append(num / den if den else math.nan)
        return out
    fmt = _TYPE_FMT.get(typ)
    if fmt is None:
        raise ValueError(f"unsupported TIFF field type {typ}")
    return list(struct.unpack_from(bo + str(count) + fmt, buf, off))


def read_header(path: str) -> MiniTiff:
    """Parse the header of an uncompressed striped single-band TIFF."""
    with open(path, "rb") as f:
        buf = f.read()
    if len(buf) < 8:
        raise ValueError(f"{path}: not a TIFF (too short)")
    order = buf[:2]
    if order == b"II":
        bo = "<"
    elif order == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: bad TIFF byte-order mark {order!r}")
    (magic,) = struct.unpack_from(bo + "H", buf, 2)
    if magic == 43:
        raise ValueError(f"{path}: BigTIFF not supported by the mini reader")
    if magic != 42:
        raise ValueError(f"{path}: bad TIFF magic {magic}")

    tags: dict[int, object] = {}
    for tag, typ, count, off in _read_ifd_entries(buf, bo):
        tags[tag] = _values(buf, bo, typ, count, off)

    def one(tag, default=None):
        v = tags.get(tag)
        if v is None:
            return default
        return v[0] if isinstance(v, list) else v

    width, height = int(one(_W, 0)), int(one(_H, 0))
    if width <= 0 or height <= 0:
        raise ValueError(f"{path}: missing ImageWidth/ImageLength")
    if int(one(_COMPRESSION, 1)) != 1:
        raise ValueError(f"{path}: compressed TIFF (tag 259={one(_COMPRESSION)}); mini reader handles Compression=1 only")
    if _TILE_WIDTH in tags:
        raise ValueError(f"{path}: tiled TIFF layout; mini reader handles strips only")
    if int(one(_SAMPLES_PER_PX, 1)) != 1:
        raise ValueError(f"{path}: multi-sample pixels not supported")
    bits = int(one(_BITS, 8))
    sample_format = int(one(_SAMPLE_FORMAT, 1))
    np_char = _DTYPES.get((sample_format, bits))
    if np_char is None:
        raise ValueError(f"{path}: unsupported sample (format={sample_format}, bits={bits})")

    strip_offsets = [int(v) for v in tags.get(_STRIP_OFFSETS, [])]
    if not strip_offsets:
        raise ValueError(f"{path}: missing StripOffsets")
    rows_per_strip = int(one(_ROWS_PER_STRIP, height))

    # GeoTIFF georeferencing: pixel scale + one tiepoint -> affine
    scale = tags.get(_MODEL_PIXEL_SCALE)
    tie = tags.get(_MODEL_TIEPOINT)
    if scale and tie and len(tie) >= 6:
        sx, sy = float(scale[0]), float(scale[1])
        # tiepoint: (i, j, k, x, y, z) — raster (i,j) pinned to model (x,y)
        i, j, x, y = float(tie[0]), float(tie[1]), float(tie[3]), float(tie[4])
        c = x - i * sx
        f = y + j * sy
        transform = [sx, 0.0, c, 0.0, -sy, f]
    else:
        transform = [1.0, 0.0, 0.0, 0.0, -1.0, float(height)]

    nodata = math.nan
    nd = tags.get(_GDAL_NODATA)
    if isinstance(nd, str):
        try:
            nodata = float(nd.strip())
        except ValueError:
            pass

    return MiniTiff(
        path=os.path.abspath(path),
        width=width,
        height=height,
        dtype=bo + np_char,
        bytes_per_sample=bits // 8,
        rows_per_strip=rows_per_strip,
        strip_offsets=strip_offsets,
        transform=transform,
        nodata=nodata,
    )


def read_window(hdr: MiniTiff, col_off: int, row_off: int, width: int, height: int):
    """Read one window as a float list (row-major), touching only the
    strips that cover it — the same I/O discipline rasterio block reads
    have, so the mapInPandas task shape is honest about bytes read."""
    import numpy as np

    out = np.empty(width * height, dtype="f8")
    bps = hdr.bytes_per_sample
    with open(hdr.path, "rb") as f:
        for r in range(height):
            row = row_off + r
            strip = row // hdr.rows_per_strip
            in_strip = row % hdr.rows_per_strip
            off = hdr.strip_offsets[strip] + (in_strip * hdr.width + col_off) * bps
            f.seek(off)
            raw = f.read(width * bps)
            out[r * width : (r + 1) * width] = np.frombuffer(raw, dtype=hdr.dtype)
    return [float(v) for v in out]


def minitiff_to_tiles(
    spark: SparkSession,
    paths: list[str],
    band_ids: list[str] | None = None,
    tile_size: int = 512,
) -> DataFrame:
    """Distributed mini-TIFF → tile-table conversion; identical contract
    and job shape to geotiff_to_tiles (driver header pass → window-grid
    rows → executors read their own windows via mapInPandas), but with
    zero native dependencies."""
    band_ids = band_ids or [f"b{i + 1}" for i in range(len(paths))]
    if len(band_ids) != len(paths):
        raise ValueError("band_ids must match paths")

    meta = []
    for band_id, path in zip(band_ids, paths):
        hdr = read_header(path)
        for w in window_grid(hdr.width, hdr.height, tile_size):
            meta.append(
                (
                    band_id,
                    hdr.path,
                    w["tile_id"],
                    w["col_off"],
                    w["row_off"],
                    w["width"],
                    w["height"],
                    hdr.transform,
                    hdr.nodata,
                    _DTYPE_NAMES[hdr.dtype.lstrip("<>")],
                )
            )
    meta_df = spark.createDataFrame(
        meta,
        "band_id string, path string, tile_id long, col_off int, row_off int, "
        "width int, height int, transform array<double>, nodata double, dtype string",
    )

    def read_windows(batches):
        for pdf in batches:
            data = []
            for r in pdf.itertuples(index=False):
                hdr = read_header(r.path)
                data.append(read_window(hdr, r.col_off, r.row_off, r.width, r.height))
            out = pdf.drop(columns=["path"]).copy()
            out["data"] = data
            yield out

    return meta_df.repartition("band_id", "tile_id").mapInPandas(
        read_windows, schema=TILE_SCHEMA_DDL
    )
