#!/usr/bin/env python
"""Study s2: NN-d (discrepancy MLP) on synthetic no-discrepancy data.
TPU-native rebuild of reference train-s2.py: init std 1e-3, no pretrain,
residual training target, s1 "Target Loss" cross-check."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr simple syn. fit with NN-d (s2).").parse_args()
OUT = setup(args, "s2")

from ionflux.studies import (  # noqa: E402
    S1,
    S2,
    load_study_params,
    predict_study,
    run_study,
)

if args.pred:
    predict_study(S2, load_study_params(S2, OUT))
else:
    # "Target Loss": what the s1-trained net scores on s2's surface
    # (train-s2.py:841-849); uses our s1 run if present
    target_net = None
    s1_model = os.path.join(os.path.dirname(OUT), "s1", "model.npz")
    if os.path.exists(s1_model):
        target_net = load_study_params(S1, os.path.dirname(s1_model)).net
    from ionflux.studies import run_study_validated, s_rollout_maes
    run_study_validated(S2, OUT, n_seeds=4, iters=args.iters,
                        cached=args.cached, debug=args.debug,
                        metric=s_rollout_maes, target_net=target_net)
