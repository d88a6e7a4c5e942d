#!/usr/bin/env python
"""Fetch/verify the Beattie-2018 cell-5 data files.

The reference does not redistribute the experimental recordings
(reference data/README.md): the real-data studies (r0/r1/r2, figures 4-8,
tables 2/S1's MAE columns) expect these CSVs under data/:

  pr3-steady-activation-cell-5.csv   pr4-inactivation-cell-5.csv
  pr5-deactivation-cell-5.csv        cell-5.csv (sinewave)   ap-cell-5.csv

plus test-protocols/{staircase,sinewave,aps}.csv.

Upstream source: https://github.com/mirams/sine-wave (per the reference's
data/README.md).  This environment has no network egress, so this script only
verifies presence and prints instructions; with egress, drop the files into
<repo>/data/ and every real-data path picks them up.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")

EXPECTED = [
    "pr3-steady-activation-cell-5.csv",
    "pr4-inactivation-cell-5.csv",
    "pr5-deactivation-cell-5.csv",
    "cell-5.csv",
    "ap-cell-5.csv",
]


def main() -> int:
    present = [f for f in EXPECTED if os.path.exists(os.path.join(DATA, f))]
    missing = [f for f in EXPECTED if f not in present]
    for f in present:
        print(f"  [ok]      data/{f}")
    for f in missing:
        print(f"  [missing] data/{f}")
    if missing:
        print("\nFetch from https://github.com/mirams/sine-wave and place "
              f"under {DATA}/ .\nUntil then, real-data studies run on the "
              "reference's cached surfaces and nominal protocol templates "
              "(see README 'Data caveat').")
        return 1
    print("all real-data files present")
    return 0


if __name__ == "__main__":
    sys.exit(main())
