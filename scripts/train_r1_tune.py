#!/usr/bin/env python
"""Study r1-tune: NN-f architecture sweep on real cell-5 data (reference
train-r1-tune.py + architectures/sNN.py).

--info sNN trains one architecture; --all sweeps all 12 (the reference ran
them as 12 separate jobs; table-s1 summarizes)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("IKr real data fit with NN-f, tunable arch (r1-tune).",
                      real=True)
parser.add_argument("--all", action="store_true", help="sweep all 12 archs")
args = parser.parse_args()
OUT = setup(args, "r1-tune")

from ionflux.models.registry import ARCHITECTURES  # noqa: E402
from ionflux.rstudies import (predict_real_study, run_real_study,  # noqa: E402
                              tune_study)

ids = list(ARCHITECTURES) if args.all else [args.info or "s00"]
for arch_id in ids:
    print(f"=== architecture {arch_id} "
          f"(n_layers={ARCHITECTURES[arch_id][0]}, "
          f"n_nodes={ARCHITECTURES[arch_id][1]}) ===")
    spec = tune_study(arch_id)
    outdir = os.path.join(OUT, arch_id)
    if args.pred:
        predict_real_study(spec, outdir)
    else:
        run_real_study(spec, outdir, iters=args.iters,
                       smoothi=args.smoothi)
