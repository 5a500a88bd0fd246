"""Advisory: compute the next driver-window rotation from the recorded
CORRECTNESS ledger.

The verify driver grades the first 50 entries of queries(); the
endgame discipline spends every slot on (a) any non-excluded red
re-spends, then (b) the OLDEST surviving green proofs (latest green
round per name, ascending; alphabetical tie-break). Round 7's verdict
mis-named the stalest cohort by working from memory of prior windows —
this script derives it from the files, which is the only ground truth.

Prints the latest-green-round histogram, the proposed 50-name window,
and a diff against the currently committed _DRIVER_WINDOW. Advisory
only (NOT a test): at the start of a new round the proposal SHOULD
differ from the committed window — that difference is the rotation the
new round must commit.

Usage: python scripts/rotation_plan.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def latest_green_rounds() -> dict[str, int]:
    latest: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        k = int(m.group(1)) if m else 0
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match")
            ):
                latest[name] = max(latest.get(name, 0), k)
    return latest


def main() -> None:
    from streambench_spark.plans.queries import (
        _DRIVER_EXCLUDED,
        _DRIVER_WINDOW,
        REGISTRY,
    )

    latest = latest_green_rounds()
    names = [n for n in REGISTRY if n not in _DRIVER_EXCLUDED]
    never = sorted(n for n in names if n not in latest)
    hist = Counter(latest[n] for n in names if n in latest)
    print(f"registry: {len(REGISTRY)}  excluded: {sorted(_DRIVER_EXCLUDED)}")
    print(f"latest-green histogram: {dict(sorted(hist.items()))}")
    if never:
        print(f"NEVER-GREEN (non-excluded — re-spend first): {never}")

    # reds/never-green first, then oldest green proofs, alphabetical ties
    proposal = (never + sorted(
        (n for n in names if n in latest), key=lambda n: (latest[n], n)
    ))[:50]
    print("\nproposed window (50):")
    for n in proposal:
        print(f"  {n}  (r{latest.get(n, 0) or '--'})")

    cur = set(_DRIVER_WINDOW)
    add = [n for n in proposal if n not in cur]
    drop = [n for n in _DRIVER_WINDOW if n not in set(proposal)]
    if not add and not drop:
        print("\ncommitted _DRIVER_WINDOW already matches the proposal.")
    else:
        print(f"\nvs committed window — add {len(add)}: {add}")
        print(f"vs committed window — drop {len(drop)}: {drop}")


if __name__ == "__main__":
    main()
