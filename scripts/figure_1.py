#!/usr/bin/env python
"""Figure 1: 3-D (V, a, da/dt) phase portraits (paper Fig. 2) on the real
Pr3/Pr5 recordings.  Panel A: the d0-fitted candidate's trajectories lie ON
its own da/dt surface; panel B: the 3-state ground truth's (a, da/dt)
trajectories leave it — the model-discrepancy picture motivating the NN
studies.  Reference figure-1.py:72-320.

--s1 / --s2 render the supplementary variants (figure-1-s1.py: Pr3+Pr4;
figure-1-s2.py: sinewave+APs), which need the reconstructed protocols."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 1: phase portraits.")
parser.add_argument("--s1", action="store_true", help="figure-1-s1 variant")
parser.add_argument("--s2", action="store_true", help="figure-1-s2 variant")
args = parser.parse_args()

PR3_COLOR, PR5_COLOR = "#fdbb84", "#bcbddc"  # figure-1.py:232, 247

view, v_hi = (30, -125), 60.0
if args.s1:
    out_name, fig_name = "figure-1-s1", "fig1-s1.png"
    cases = [("pr3-cell5", PR3_COLOR, "Pr3"), ("pr4-cell5", PR5_COLOR, "Pr4")]
elif args.s2:
    out_name, fig_name = "figure-1-s2", "fig1-s2.png"
    cases = [("sinewave-cell5", PR3_COLOR, "Sinusoidal"),
             ("aps-cell5", PR5_COLOR, "APs")]
    view, v_hi = (20, -95), 75.0  # figure-1-s2.py:215, 261
else:
    out_name, fig_name = "figure-1", "fig1.png"
    cases = [("pr3-cell5", PR3_COLOR, "Pr3"), ("pr5-cell5", PR5_COLOR, "Pr5")]

OUT = setup(args, out_name)

from ionflux.figures import phase_portrait_figure  # noqa: E402

phase_portrait_figure(os.path.join(OUT, fig_name), cases, OUT,
                      cached=args.cached, view=view, v_hi=v_hi)
