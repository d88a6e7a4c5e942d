#!/usr/bin/env python
"""Study d1: NN-f under model discrepancy (ground truth = 3-state Markov).
TPU-native rebuild of reference train-d1.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr syn. discrepancy fit with NN-f (d1).").parse_args()
OUT = setup(args, "d1")

from ionflux.studies import (D1, load_study_params, predict_study,  # noqa: E402
                             run_study_validated)

if args.pred:
    predict_study(D1, load_study_params(D1, OUT))
else:
    # checkpoint-validated training, as d2 (studies.run_study_validated):
    # the prediction columns peak mid-trajectory here too
    run_study_validated(D1, OUT, n_seeds=4, iters=args.iters,
                        cached=args.cached, debug=args.debug)
