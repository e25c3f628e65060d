#!/usr/bin/env python3
"""Regenerate tools/graded_history.json (query name -> last driver-graded
round) from the CORRECTNESS_r*.json records. Run at the start of each
round, after the driver has written the previous round's record:

    python tools/update_graded_history.py

The staleness rotation (registry._DRIVER_WINDOW) and its guard
(tests/test_entry.py::test_rotation_regrades_oldest_evidence_first) read
this file; the window should regrade the names with the SMALLEST rounds
here, with never-graded (absent) names taking slots first."""

from __future__ import annotations

import glob
import json
import os

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)


def main() -> None:
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        rnd = int(os.path.basename(f).split("_r")[1].split(".")[0])
        for name in json.load(open(f)):
            last[name] = max(last.get(name, 0), rnd)
    out = os.path.join(HERE, "graded_history.json")
    json.dump(last, open(out, "w"), indent=1, sort_keys=True)
    by_round: dict[int, int] = {}
    for r in last.values():
        by_round[r] = by_round.get(r, 0) + 1
    print(f"{len(last)} ever-graded queries -> {out}")
    print("last-graded round histogram:", dict(sorted(by_round.items())))


if __name__ == "__main__":
    main()
