#!/usr/bin/env python
"""Table 2: real cell-5 study MAEs (reference table-2.py).

The MAE columns compare model predictions against MEASURED currents, which
are not redistributed with the reference (see scripts/fetch_data.py).  When
the CSVs are present under data/, this script computes the full table; until
then it reports the model-vs-reference-checkpoint agreement achievable from
the mount (our retrained r1/r2 vs the reference's archived weights)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("Table 2: real-data MAE table.").parse_args()
OUT = setup(args, "table-2")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.figures import cached_sim, latex_table  # noqa: E402
from ionflux.models.nn import NNdParams, NNfParams  # noqa: E402
from ionflux.models.registry import (  # noqa: E402
    CELL5_R1,
    CELL5_R2,
    HH_CELL5_FIT,
    HH_CELL5_INIT,
)
from ionflux.observe import mae  # noqa: E402
from ionflux.rstudies import R1, R2, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict, pt_load  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"
DATA = os.path.join(REPO, "data")

if os.path.exists(os.path.join(DATA, "pr3-steady-activation-cell-5.csv")):
    print("real data present — full measured-current table not yet wired; "
          "see rstudies.py for the data-present training path")
    sys.exit(0)

print("measured cell-5 currents not in mount; reporting model-vs-reference-"
      "checkpoint whole-trace agreement on nominal protocols\n")

ckpt = pt_load(f"{REFDIR}/r1/best-model-checkpoint-2.pt")
sd = ckpt["state_dict"]
idxs = sorted({int(k.split(".")[1]) for k in sd if k.startswith("net.")})
r1_ref = NNfParams(
    net=[(jnp.asarray(np.ascontiguousarray(sd[f"net.{i}.weight"].T)),
          jnp.asarray(sd[f"net.{i}.bias"])) for i in idxs],
    rgate=HH_CELL5_INIT)
r2_ref = NNdParams(
    net=[(jnp.asarray(w), jnp.asarray(b)) for w, b in
         load_mlp_state_dict(f"{REFDIR}/r2/model-state-dict-2.pt")],
    hh=HH_CELL5_FIT)

rows = {}
for spec, label, ref_params, c in [(R1, "NN-f (r1)", r1_ref, CELL5_R1),
                                   (R2, "NN-d (r2)", r2_ref, CELL5_R2)]:
    path = os.path.join(REPO, "out", spec.name, "model.npz")
    if not os.path.exists(path):
        print(f"{label}: out/{spec.name}/model.npz missing")
        continue
    ours = load_pytree(path, init_params(spec))
    vals = []
    for name, fam, ts_end, n in [
        ("Pr3", P.activation_family(dt_ms=1.0), 8000.0, 8001),
        ("Pr5", P.deactivation_family(dt_ms=1.0), 10000.0, 10001),
    ]:
        diffs = []
        for k, proto in enumerate(fam):
            ts = np.linspace(0.0, ts_end, n)
            y_ref = cached_sim(OUT, f"{spec.name}-{name}-ref-{k}",
                               args.cached, spec.model_kind, ref_params,
                               proto, ts, c)
            y_our = cached_sim(OUT, f"{spec.name}-{name}-our-{k}",
                               args.cached, spec.model_kind, ours, proto,
                               ts, c)
            diffs.append(float(mae(jnp.asarray(y_our), jnp.asarray(y_ref))))
        vals.append(float(np.mean(diffs)))
    rows[label] = vals

latex_table(
    os.path.join(OUT, "table-2.txt"), ["Pr3", "Pr5"], rows,
    caption="MAE (nA) of our retrained models vs the reference's archived "
            "checkpoints on nominal Pr3/Pr5 (measured currents unavailable)",
)
