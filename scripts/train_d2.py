#!/usr/bin/env python
"""Study d2: NN-d under model discrepancy (ground truth = 3-state Markov).
TPU-native rebuild of reference train-d2.py (smoothing window 151, spline
s=1, sparse 21)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr syn. discrepancy fit with NN-d (d2).").parse_args()
OUT = setup(args, "d2")

from ionflux.studies import (D2, load_study_params, predict_study,  # noqa: E402
                             run_study_validated)

if args.pred:
    predict_study(D2, load_study_params(D2, OUT))
else:
    # checkpoint-validated training: every 400-iter checkpoint of every
    # seed is rolled out on the five table-1 protocols vs clean ground
    # truth and the global best kept (replaces the reference's single
    # lucky torch draw; see studies.run_study_validated rationale)
    run_study_validated(D2, OUT, n_seeds=6, iters=args.iters,
                        cached=args.cached, debug=args.debug)
