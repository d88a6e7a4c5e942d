#!/usr/bin/env python
"""Study r1: NN-f on real Beattie-2018 cell-5 data (reference train-r1.py).

Without the raw cell-5 CSVs in the mount, trains on the reference's own
cached derivative surfaces (exact training inputs); see ionflux/rstudies.py.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr real data fit with NN-f (r1).", real=True).parse_args()
OUT = setup(args, "r1")

from ionflux.rstudies import (R1, predict_real_study,  # noqa: E402
                             run_real_study)

if args.pred:
    predict_real_study(R1, OUT)
else:
    run_real_study(R1, OUT, iters=args.iters, smoothi=args.smoothi)
