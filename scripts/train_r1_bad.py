#!/usr/bin/env python
"""Study r1-bad: NN-f trained on insufficient protocols (Pr3+Pr4 only) —
the negative control demonstrating unidentifiability, analysed in figures
6/7 (reference train-r1-bad.py)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr real data fit with NN-f, insufficient protocols "
                    "(r1-bad).", real=True).parse_args()
OUT = setup(args, "r1-bad")

from ionflux.rstudies import (R1BAD, predict_real_study,  # noqa: E402
                             run_real_study)

if args.pred:
    predict_real_study(R1BAD, OUT)
else:
    run_real_study(R1BAD, OUT, iters=args.iters, smoothi=args.smoothi)
