#!/usr/bin/env python
"""Table 1: d-study MAEs (Original / NN-f / NN-d) on training and prediction
protocols.  Reference table-1.py; columns whose recorded protocol files are
absent (Pr4, sinusoidal, APs) are replaced by the available AP2Hz and
activation-tau predictions, labelled accordingly."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Table 1: d-study MAE table.").parse_args()
OUT = setup(args, "table-1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, latex_table, mae_row  # noqa: E402
from ionflux.models.registry import MARKOV_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise  # noqa: E402

from ionflux.figures import load_d_models  # noqa: E402

REFDIR = "/root/reference"
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
models = load_d_models(os.path.join(REPO, "out"))

columns = [
    ("Pr3", P.activation_family(dt_ms=1.0), np.linspace(0.0, 8000.0, 8001)),
    ("Pr5", P.deactivation_family(dt_ms=1.0), np.linspace(0.0, 10000.0, 10001)),
    ("AP2Hz", [P.load_csv(f"{REFDIR}/test-protocols/ap2hz.csv")],
     np.linspace(0.0, 3000.0, 1501)),
    ("Act-tau", P.atau_family(dt_ms=1.0), np.linspace(0.0, 5000.0, 5001)),
]

rows = {label: [] for label in models}
for col_name, fam, ts in columns:
    col_mae = {label: [] for label in models}
    for k, proto in enumerate(fam):
        truth = cached_sim(OUT, f"{col_name}-gt-{k}", args.cached, "markov",
                           MARKOV_B06, proto, ts, SYNTHETIC)
        data = np.asarray(add_noise(jax.random.PRNGKey(k),
                                    jnp.asarray(truth)), np.float64)
        preds = {
            label: cached_sim(OUT, f"{col_name}-{label}-{k}", args.cached,
                              kind, params, proto, ts, SYNTHETIC)
            for label, (kind, params, _s) in models.items()
        }
        for label, v in mae_row(data, preds).items():
            col_mae[label].append(v)
    for label in models:
        rows[label].append(float(np.mean(col_mae[label])))

latex_table(
    os.path.join(OUT, "table-1.txt"),
    [c[0] for c in columns],
    rows,
    caption="d-study MAE (nA) on nominal protocols; Pr3/Pr5 are training "
            "protocols, AP2Hz/Act-tau predictions (recorded Pr4/sinusoidal/"
            "APs files not in mount)",
)
