"""Driver-evidence audit: which registry keys has the grading driver
actually verified, when, and what does the current DRIVER_PRIORITY
window do to the gap?

The grading driver checks only the first 50 ``queries()`` keys per
round (CORRECTNESS_r{N}.json), so driver-side evidence structurally
lags the registry.  The window rotation (entry.DRIVER_PRIORITY) is
hand-planned per round; this tool makes the bookkeeping mechanical so
a stale plan or a key that silently fell out of every window is a
report diff, not an archaeology project:

- per-family rollup: keys / driver-graded / never-graded / newest row
- the exact never-graded key list
- staleness: keys whose NEWEST driver row predates round R-2
- window audit: how many never-graded + changed keys the CURRENT
  first-50 window retires, and the projected gap after it runs

Usage:  python tools/evidence_audit.py [--repo /root/repo]
Commit the stdout as reports/evidence_audit_r{N}.txt.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load_driver_rows(repo: str) -> dict[str, dict[int, bool]]:
    """key -> {round: green} from every CORRECTNESS_r*.json."""
    rows: dict[str, dict[int, bool]] = defaultdict(dict)
    for f in sorted(glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", f)
        if not m:
            continue
        rnd = int(m.group(1))
        for key, rec in json.load(open(f)).items():
            err = rec.get("err")
            rows_only = bool(err) and "no_oracle" in str(err)
            green = bool(rec.get("hash_match")) or (
                rows_only and rec.get("spark_rows") is not None
            )
            rows[key][rnd] = green
    return rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repo", default=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    args = ap.parse_args()

    from raster2points_spark.entry import DRIVER_PRIORITY
    from raster2points_spark.registry import load_all

    registry = load_all()
    driver = load_driver_rows(args.repo)
    latest_round = max((r for m in driver.values() for r in m), default=0)

    # keys graded at some point but no longer in the registry would be
    # silent registry shrinkage — surface them loudly
    ghosts = sorted(k for k in driver if k not in registry)

    fam_of = {k: s.fn.__module__.rsplit(".", 1)[-1] for k, s in registry.items()}
    fams: dict[str, dict[str, list[str]]] = defaultdict(lambda: defaultdict(list))
    for k in registry:
        fams[fam_of[k]]["all"].append(k)
        (fams[fam_of[k]]["graded" if k in driver else "never"]).append(k)

    print(f"== evidence audit (driver rounds found: 1..{latest_round}) ==")
    print(f"registry keys: {len(registry)}   driver-graded ever: "
          f"{sum(1 for k in registry if k in driver)}   never: "
          f"{sum(1 for k in registry if k not in driver)}")
    if ghosts:
        print(f"!! GHOST KEYS (graded once, now unregistered): {ghosts}")
    print()
    print(f"{'family':<16} {'keys':>5} {'graded':>7} {'never':>6} {'newest':>7}")
    for fam in sorted(fams):
        ks = fams[fam]["all"]
        graded = [k for k in ks if k in driver]
        newest = max((r for k in graded for r in driver[k]), default=0)
        print(f"{fam:<16} {len(ks):>5} {len(graded):>7} "
              f"{len(ks) - len(graded):>6} {('r%d' % newest) if newest else '-':>7}")

    never = sorted(k for k in registry if k not in driver)
    print(f"\nnever-driver-graded ({len(never)}):")
    for i in range(0, len(never), 6):
        print("  " + ", ".join(never[i : i + 6]))

    stale_cut = latest_round - 2
    stale = sorted(
        (max(driver[k]), k) for k in registry if k in driver and max(driver[k]) < stale_cut
    )
    print(f"\nstale (newest driver row < r{stale_cut}): {len(stale)}")
    for rnd, k in stale:
        print(f"  r{rnd}  {k}")

    window = list(DRIVER_PRIORITY)
    win_never = [k for k in window if k not in driver]
    print(f"\ncurrent DRIVER_PRIORITY window: {len(window)} keys "
          f"({len(win_never)} never-graded, {len(window) - len(win_never)} re-grades)")
    print(f"projected never-graded gap after this window runs: "
          f"{len(never) - len(win_never)}")

    reds = sorted(
        k for k in registry if k in driver and not driver[k][max(driver[k])]
    )
    print(f"\nkeys whose LATEST driver row is not green: {len(reds)}")
    for k in reds:
        print(f"  {k}: {driver[k]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
