"""The non-oracle evidence contract (r9, VERDICT r8 #4).

Every registry key that can't be oracle-checked (rows-only + smoke)
must carry a quantitative pin in tools/nonoracle_pins.py, and the
newest committed reports/nonoracle_pins_r*.txt must show every one of
them green — so adding a non-oracle key without extending the pin set
AND regenerating the report is a red test, not a silent evidence gap.
"""

from __future__ import annotations

import glob
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))


def _nonoracle_keys(registry):
    return {k for k, s in registry.items() if s.check != "oracle"}


def test_pin_set_matches_registry_nonoracle(registry):
    from nonoracle_pins import PINS

    assert set(PINS) == _nonoracle_keys(registry)


def test_committed_report_covers_every_nonoracle_key_green(registry):
    reports = sorted(
        glob.glob(os.path.join(REPO, "reports", "nonoracle_pins_r*.txt")),
        key=lambda p: int(re.search(r"_r(\d+)\.txt$", p).group(1)),
    )
    assert reports, "no committed reports/nonoracle_pins_r*.txt — run tools/nonoracle_pins.py"
    text = open(reports[-1]).read()
    for key in _nonoracle_keys(registry):
        m = re.search(rf"^(PASS|FAIL) {re.escape(key)}\b", text, re.M)
        assert m, f"{key} missing from {os.path.basename(reports[-1])}"
        assert m.group(1) == "PASS", f"{key} is FAIL in {os.path.basename(reports[-1])}"
    assert re.search(r", 0 FAIL$", text.strip().splitlines()[-1]), "report has failures"
