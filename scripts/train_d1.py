#!/usr/bin/env python
"""Study d1: NN-f under model discrepancy (ground truth = 3-state Markov).
TPU-native rebuild of reference train-d1.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr syn. discrepancy fit with NN-f (d1).").parse_args()
OUT = setup(args, "d1")

from ionflux.studies import D1, load_study_params, predict_study, run_study  # noqa: E402

if args.pred:
    predict_study(D1, load_study_params(D1, OUT))
else:
    run_study(D1, OUT, iters=args.iters, cached=args.cached,
              debug=args.debug)
