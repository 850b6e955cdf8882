"""Golden test: a hand-built uncompressed GeoTIFF (written here with
raw struct packing — no TIFF library on either side) decodes through
the pure-Python mini reader into the tile table, proving the
window-grid math and the distributed job shape against a REAL file
layout, not synthetic metadata."""

from __future__ import annotations

import math
import struct

import pytest


def _write_tiff(
    path,
    values,  # row-major list of floats/ints
    width,
    height,
    byte_order="<",  # "<" II little-endian, ">" MM big-endian
    dtype="f8",  # f8 | i2
    rows_per_strip=2,
    pixel_scale=(0.5, 0.5),
    tiepoint=(0.0, 0.0, 0.0, 10.0, 45.0, 0.0),
    nodata="-9999",
):
    bo = byte_order
    sample_format = {"f8": 3, "i2": 2}[dtype]
    bits = {"f8": 64, "i2": 16}[dtype]
    bps = bits // 8
    pack_px = {"f8": "d", "i2": "h"}[dtype]

    n_strips = (height + rows_per_strip - 1) // rows_per_strip
    strips = []
    for s in range(n_strips):
        r0 = s * rows_per_strip
        rows = values[r0 * width : min(height, r0 + rows_per_strip) * width]
        strips.append(struct.pack(bo + str(len(rows)) + pack_px, *rows))

    # layout: 8B header | strip data | external arrays | IFD
    off = 8
    strip_offsets = []
    for s in strips:
        strip_offsets.append(off)
        off += len(s)

    ext = b""  # external value area, appended after strips

    def extern(fmt, vals):
        nonlocal ext
        o = off + len(ext)
        ext += struct.pack(bo + fmt, *vals)
        return o

    entries = []  # (tag, type, count, value_or_offset, inline)

    def entry(tag, typ, count, inline_val=None, offset=None):
        entries.append((tag, typ, count, inline_val, offset))

    entry(256, 3, 1, width)
    entry(257, 3, 1, height)
    entry(258, 3, 1, bits)
    entry(259, 3, 1, 1)  # uncompressed
    entry(262, 3, 1, 1)
    if n_strips == 1:
        entry(273, 4, 1, strip_offsets[0])
    else:
        entry(273, 4, n_strips, offset=extern(f"{n_strips}I", strip_offsets))
    entry(277, 3, 1, 1)
    entry(278, 3, 1, rows_per_strip)
    counts = [len(s) for s in strips]
    if n_strips == 1:
        entry(279, 4, 1, counts[0])
    else:
        entry(279, 4, n_strips, offset=extern(f"{n_strips}I", counts))
    entry(339, 3, 1, sample_format)
    entry(33550, 12, 3, offset=extern("3d", [pixel_scale[0], pixel_scale[1], 0.0]))
    entry(33922, 12, 6, offset=extern("6d", list(tiepoint)))
    nd = nodata.encode() + b"\x00"
    entry(42113, 2, len(nd), offset=extern(f"{len(nd)}s", [nd]))

    ifd_off = off + len(ext)
    ifd = struct.pack(bo + "H", len(entries))
    for tag, typ, count, inline_val, ext_off in sorted(entries):
        e = struct.pack(bo + "HHI", tag, typ, count)
        if ext_off is not None:
            e += struct.pack(bo + "I", ext_off)
        elif typ == 3:  # SHORT inline, padded
            e += struct.pack(bo + "H", inline_val) + b"\x00\x00"
        else:  # LONG inline
            e += struct.pack(bo + "I", inline_val)
        ifd += e
    ifd += struct.pack(bo + "I", 0)  # next-IFD terminator

    order_mark = b"II" if bo == "<" else b"MM"
    with open(path, "wb") as f:
        f.write(order_mark + struct.pack(bo + "HI", 42, ifd_off))
        for s in strips:
            f.write(s)
        f.write(ext)
        f.write(ifd)


@pytest.fixture()
def tiny_tif(tmp_path):
    # 6x4 float64, values = row*10 + col, 2-row strips
    w, h = 6, 4
    vals = [float(r * 10 + c) for r in range(h) for c in range(w)]
    p = tmp_path / "tiny.tif"
    _write_tiff(str(p), vals, w, h)
    return str(p), vals, w, h


def test_header_parse_golden(tiny_tif):
    from raster2points_spark.sources.minitiff import read_header

    path, vals, w, h = tiny_tif
    hdr = read_header(path)
    assert (hdr.width, hdr.height) == (w, h)
    assert hdr.dtype == "<f8"
    assert hdr.rows_per_strip == 2
    assert len(hdr.strip_offsets) == 2
    # affine from scale (0.5, 0.5) + tiepoint (0,0)->(10,45)
    assert hdr.transform == [0.5, 0.0, 10.0, 0.0, -0.5, 45.0]
    assert hdr.nodata == -9999.0


def test_window_read_exact(tiny_tif):
    from raster2points_spark.sources.minitiff import read_header, read_window

    path, vals, w, h = tiny_tif
    hdr = read_header(path)
    # full raster
    assert read_window(hdr, 0, 0, w, h) == vals
    # interior window crossing the strip boundary
    got = read_window(hdr, 1, 1, 3, 2)
    want = [vals[r * w + c] for r in (1, 2) for c in (1, 2, 3)]
    assert got == want


def test_big_endian_int16_header():
    import tempfile

    from raster2points_spark.sources.minitiff import read_header, read_window

    w, h = 4, 3
    vals = [r * 10 + c for r in range(h) for c in range(w)]
    with tempfile.NamedTemporaryFile(suffix=".tif", delete=False) as f:
        path = f.name
    _write_tiff(path, vals, w, h, byte_order=">", dtype="i2", rows_per_strip=3)
    hdr = read_header(path)
    assert hdr.dtype == ">i2"
    assert read_window(hdr, 0, 0, w, h) == [float(v) for v in vals]


def test_minitiff_to_tiles_golden(spark, tiny_tif):
    """End-to-end: real file layout -> distributed tile table with the
    same schema/partitioning as the rasterio path."""
    from raster2points_spark.sources.minitiff import minitiff_to_tiles

    path, vals, w, h = tiny_tif
    df = minitiff_to_tiles(spark, [path], band_ids=["elev"], tile_size=4)
    rows = {r.tile_id: r for r in df.collect()}
    # 6x4 @ tile_size 4 -> two tiles: (0: 4x4 at 0,0) (1: 2x4 at 4,0)
    assert set(rows) == {0, 1}
    t0, t1 = rows[0], rows[1]
    assert (t0.col_off, t0.row_off, t0.width, t0.height) == (0, 0, 4, 4)
    assert (t1.col_off, t1.row_off, t1.width, t1.height) == (4, 0, 2, 4)
    assert t0.band_id == "elev" and t0.dtype == "float64"
    assert t0.transform == [0.5, 0.0, 10.0, 0.0, -0.5, 45.0]
    assert t0.nodata == -9999.0
    assert t0.data == [vals[r * w + c] for r in range(4) for c in range(4)]
    assert t1.data == [vals[r * w + c] for r in range(4) for c in (4, 5)]


def test_mini_reader_rejects_unsupported(tmp_path):
    from raster2points_spark.sources.minitiff import read_header

    p = tmp_path / "bad.tif"
    p.write_bytes(b"II\x2b\x00" + b"\x00" * 12)  # BigTIFF magic 43
    with pytest.raises(ValueError, match="BigTIFF"):
        read_header(str(p))
    p2 = tmp_path / "notatiff.bin"
    p2.write_bytes(b"GARBAGE!")
    with pytest.raises(ValueError, match="byte-order"):
        read_header(str(p2))


def test_nodata_masks_through_grid_operators(spark, tmp_path):
    """The decoded tile feeds the existing raster2points mask: nodata
    pixels drop exactly as they do for the parquet grid fixtures."""
    import pyspark.sql.functions as F

    from raster2points_spark.sources.minitiff import minitiff_to_tiles

    w, h = 4, 2
    vals = [1.0, -9999.0, 3.0, -9999.0, 5.0, 6.0, -9999.0, 8.0]
    p = tmp_path / "masked.tif"
    _write_tiff(str(p), vals, w, h, rows_per_strip=2)
    tiles = minitiff_to_tiles(spark, [str(p)], band_ids=["b1"], tile_size=4)
    pts = (
        tiles.select(
            "nodata", F.posexplode("data").alias("pos", "val")
        ).filter(F.col("val") != F.col("nodata"))
    )
    got = sorted(r.val for r in pts.collect())
    assert got == [1.0, 3.0, 5.0, 6.0, 8.0]


def test_raster2df_from_tif_paths(spark, tmp_path):
    """Reference parity, end to end: raster2df fed GeoTIFF PATHS (the
    reference's actual signature) runs through the minitiff fallback —
    band 1 masks nodata, band 2 contributes a nullable column, pixel
    centers come from the GeoTIFF transform."""
    from raster2points_spark.api import raster2df

    w, h = 4, 2
    # band 1: mask band — one nodata pixel
    b1 = [1.0, 2.0, -9999.0, 4.0, 5.0, 6.0, 7.0, 8.0]
    # band 2: values — nodata at a DIFFERENT pixel (kept as NULL)
    b2 = [10.0, -9999.0, 30.0, 40.0, 50.0, 60.0, 70.0, 80.0]
    p1, p2 = str(tmp_path / "band1.tif"), str(tmp_path / "band2.tif")
    _write_tiff(p1, b1, w, h)
    _write_tiff(p2, b2, w, h)

    df = raster2df(spark, [p1, p2], bands=["b1", "b2"], col_names=["elev", "slope"])
    rows = {(r.lon, r.lat): (r.elev, r.slope) for r in df.collect()}
    # transform: scale 0.5, origin (10, 45); pixel centers at +0.25
    # 7 points survive (band-1 nodata at pixel (2,0) dropped)
    assert len(rows) == 7
    assert (10.25, 44.75) in rows and rows[(10.25, 44.75)] == (1.0, 10.0)
    assert (11.25, 44.75) not in rows  # masked by band 1
    # band-2 nodata -> NULL, row kept
    assert rows[(10.75, 44.75)] == (2.0, None)
    # dtype preservation: float64 source -> double columns
    assert dict(df.dtypes)["elev"] == "double"


def test_cli_accepts_tif_paths(spark, tmp_path):
    """Reference CLI contract: ``raster2csv in1.tif in2.tif out`` with
    bands defaulting to b1..bN positionally."""
    from raster2points_spark.cli import main

    w, h = 4, 2
    _write_tiff(str(tmp_path / "a.tif"), [1.0, 2.0, -9999.0, 4.0, 5.0, 6.0, 7.0, 8.0], w, h)
    _write_tiff(str(tmp_path / "b.tif"), [float(v) for v in range(10, 90, 10)], w, h)
    out = str(tmp_path / "out")
    rc = main(
        [str(tmp_path / "a.tif"), str(tmp_path / "b.tif"), out,
         "--col-names", "elev", "slope", "--separator", ";"]
    )
    assert rc == 0
    import glob

    lines = sorted(
        l for f in glob.glob(f"{out}/part-*.csv") for l in open(f).read().splitlines() if l
    )
    assert "lon;lat;elev;slope" in lines
    data = [l for l in lines if not l.startswith("lon")]
    assert len(data) == 7  # one pixel masked by band-1 nodata
    assert "10.25;44.75;1.0;10.0" in data
