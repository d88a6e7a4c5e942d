#!/usr/bin/env python
"""Study s1: NN-f on synthetic no-discrepancy data (ground truth = candidate
HH).  TPU-native rebuild of reference train-s1.py; see ionflux/studies.py."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr simple syn. fit with NN-f (s1).").parse_args()
OUT = setup(args, "s1")

from ionflux.studies import (S1, load_study_params, predict_study,  # noqa: E402
                             run_study_validated, s_rollout_maes)

if args.pred:
    predict_study(S1, load_study_params(S1, OUT))
else:
    # checkpoint-validated training (studies.run_study_validated) on the
    # s-study prediction rollouts
    run_study_validated(S1, OUT, n_seeds=4, iters=args.iters,
                        cached=args.cached, debug=args.debug,
                        metric=s_rollout_maes)
