"""The local gate must never be MORE forgiving than the driver's
canonicalizer.  Round 5 shipped a driver hash-fail (agg_decimal_exact)
that the local gate could not see because tools/diff_oracle.py bridged
Decimal→float while the driver does not.  These tests pin the strict
behavior: any object-dtype cell class the driver renders
engine-dependently (Decimal, bytes, list/dict) must raise locally so
the failure is caught before grading."""

from __future__ import annotations

from datetime import date, datetime
from decimal import Decimal

import pytest

from tools.diff_oracle import NULL, canon_val


def test_decimal_cell_rejected():
    # The exact pre-r6-fix failure: Spark sum(decimal) returns
    # Decimal('1251869314.00'), DuckDB .df() returns float64 — bridging
    # them locally hid a driver red.
    with pytest.raises(TypeError, match="Decimal"):
        canon_val(Decimal("1251869314.00"))


def test_bytes_cell_rejected():
    with pytest.raises(TypeError, match="bytes"):
        canon_val(b"\x00\x01")
    with pytest.raises(TypeError, match="bytes"):
        canon_val(bytearray(b"\x00"))


def test_list_dict_cells_rejected():
    with pytest.raises(TypeError, match="unhashable"):
        canon_val([1, 2])
    with pytest.raises(TypeError, match="unhashable"):
        canon_val({"a": 1})


def test_scalar_bridges_still_work():
    assert canon_val(None) == NULL
    assert canon_val(float("nan")) == NULL
    assert canon_val(-0.0) == "0.0"
    assert canon_val(1.5) == "1.5"
    assert canon_val(3) == "3"
    assert canon_val("x") == "x"
    assert canon_val(True) == "bool:True"
    assert canon_val(date(2026, 8, 14)) == "2026-08-14"
    assert canon_val(datetime(2026, 8, 14, 1, 2, 3)) == "2026-08-14T01:02:03"
