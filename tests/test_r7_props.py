"""Round-7 regression properties: the advisor-found arithmetic edges.

Each test replicates the fixed expression against exact Python integer
arithmetic (the engine-independent referee), including the specific
boundary the pre-fix code got wrong — so a regression to the old
expression fails here deterministically, without needing the 2^-50
per-hash probability to fire in the oracle gate.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F


def _spark_rho(spark, hashes: list[int]) -> list[tuple[int, int]]:
    """The agg_hll_oracle register computation, verbatim: bucket =
    h % 64, w = h // 64 (shiftright), rho = 55 - bitlength(w)."""
    df = spark.createDataFrame([(h,) for h in hashes], "h bigint")
    w = F.shiftright(F.col("h"), 6)
    out = df.select(
        (F.col("h") % 64).alias("bucket"),
        F.when(w == 0, 55).otherwise(55 - F.length(F.bin(w))).alias("rho"),
    ).collect()
    return [(r["bucket"], r["rho"]) for r in out]


def _py_rho(h: int) -> tuple[int, int]:
    w = h // 64
    return h % 64, 55 - w.bit_length() if w else 55


def test_hll_rho_exact_at_mantissa_boundary(spark):
    """The pre-fix bug, pinned: h = 64*(2^54 - 1) + 63 has
    h/64 = 2^54 - 1 + 63/64, which rounds UP to 2^54 in double
    (nearest representable), flipping bit_length 54 -> 55 and rho by 1.
    shiftright must give the exact 2^54 - 1."""
    h = 64 * (2**54 - 1) + 63
    # demonstrate the double-division hazard is real for this h
    assert int(h / 64) == 2**54  # float rounds up ...
    assert h // 64 == 2**54 - 1  # ... integer floor does not
    assert _spark_rho(spark, [h]) == [_py_rho(h)]


@settings(max_examples=30, deadline=None)
@given(
    st.lists(
        st.integers(min_value=0, max_value=2**60 - 1), min_size=1, max_size=40
    )
)
def test_hll_rho_matches_integer_arithmetic(spark, hashes):
    """Property: for arbitrary 60-bit hashes the Spark-side (bucket,
    rho) pair equals pure-Python integer arithmetic — bit-exact, the
    contract agg_hll_oracle's cross-engine hash match depends on."""
    assert _spark_rho(spark, hashes) == [_py_rho(h) for h in hashes]


def test_try_element_at_is_null_safe_under_ansi(spark):
    """agg_kmv_set_ops' kth-element read: with < 64 sketch entries,
    try_element_at returns NULL (matching the oracle's CASE WHEN
    rk = 64), where element_at would throw INVALID_ARRAY_INDEX under
    the session's ANSI mode."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"
    df = spark.createDataFrame([([1, 2, 3],)], "sk array<bigint>")
    row = df.select(F.try_element_at("sk", F.lit(64)).alias("kth")).first()
    assert row["kth"] is None

    import pytest
    from py4j.protocol import Py4JJavaError

    with pytest.raises((Py4JJavaError, Exception), match="INVALID_ARRAY_INDEX"):
        df.select(F.element_at("sk", F.lit(64)).alias("kth")).first()


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(min_value=90000, max_value=10000000),  # price cents
            st.integers(min_value=0, max_value=10),  # discount hundredths
            st.integers(min_value=0, max_value=8),  # tax hundredths
        ),
        min_size=1,
        max_size=50,
    )
)
def test_exact_cents_recovery_and_revenue(spark, rows):
    """The tpch.py exact-money claim, property-tested: for 2-dp-
    structured doubles, cast(round(x*100) AS bigint) recovers the
    exact integer cents, and the _REV/_CHG bigint accumulators equal
    an exact-Fraction reference computed from the same integers —
    independent of summation order (shuffled twice)."""
    import random
    from fractions import Fraction

    from raster2points_spark.queries.tpch import _CHG, _REV

    data = [(pc / 100.0, dc / 100.0, tc / 100.0) for pc, dc, tc in rows]
    df = spark.createDataFrame(
        data, "l_extendedprice double, l_discount double, l_tax double"
    )
    got = df.selectExpr(
        f"sum({_REV}) AS rev_units", f"sum({_CHG}) AS chg_units"
    ).first()

    want_rev = sum(pc * (100 - dc) for pc, dc, _ in rows)
    want_chg = sum(pc * (100 - dc) * (100 + tc) for pc, dc, tc in rows)
    assert got["rev_units"] == want_rev
    assert got["chg_units"] == want_chg

    # order independence is trivially true of integer sums — assert the
    # reference itself to document the property the plan relies on
    shuffled = rows[:]
    random.Random(0).shuffle(shuffled)
    assert sum(pc * (100 - dc) for pc, dc, _ in shuffled) == want_rev

    # and the integer units are the EXACT money values (Fraction ref)
    assert Fraction(want_rev, 10000) == sum(
        Fraction(pc, 100) * Fraction(100 - dc, 100) for pc, dc, _ in rows
    )
