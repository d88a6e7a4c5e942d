#!/usr/bin/env python
"""Study r2: NN-d on real Beattie-2018 cell-5 data (reference train-r2.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr real data fit with NN-d (r2).", real=True).parse_args()
OUT = setup(args, "r2")

from ionflux.rstudies import (R2, predict_real_study,  # noqa: E402
                             run_real_study)

if args.pred:
    predict_real_study(R2, OUT)
else:
    run_real_study(R2, OUT, iters=args.iters, smoothi=args.smoothi)
