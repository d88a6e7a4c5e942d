#!/usr/bin/env python
"""Study s1: fit NN-f to synthetic no-discrepancy data (ground truth = the
candidate HH model).  TPU-native rebuild of reference train-s1.py.

Pipeline (SURVEY.md §3.2):
  synth data (HH + noise) -> derivative surface -> MLP pretrain (1000 it,
  shifted analytic surface) -> Adam+StepLR surface training (4000 it) ->
  AP2Hz validation MAE -> save params.

--pred replays the trained model on all prediction protocols and prints
per-protocol MAEs (reference train-s1.py:257-546).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

args = study_parser("IKr simple syn. fit with NN-f (s1).").parse_args()
OUT = setup(args, "s1")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.data import synth_study_currents  # noqa: E402
from ionflux.eval import report_mae, simulate, simulate_cases  # noqa: E402
from ionflux.fit import fit_surface, pretrain  # noqa: E402
from ionflux.models import nnf_init  # noqa: E402
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import HH_B06, SYNTHETIC  # noqa: E402
from ionflux.surface import (  # noqa: E402
    SurfaceConfig,
    concat_surfaces,
    estimate_gate_surface,
)
from ionflux.utils.ckpt import load_pytree, save_pytree  # noqa: E402

REFDIR = "/root/reference"
GT = HH_B06          # s1 ground truth IS the candidate HH (SURVEY.md §0)
RGATE = HH_B06       # r-gate assumed known
C = SYNTHETIC

T1 = jnp.linspace(0.0, 8000.0, 80001, dtype=jnp.float32)
T2 = jnp.linspace(0.0, 10000.0, 100001, dtype=jnp.float32)
PRED_T = jnp.linspace(0.0, 3000.0, 1501, dtype=jnp.float32)


def build_surface():
    cache = os.path.join(OUT, "surface.npz")
    if args.cached and os.path.exists(cache):
        d = np.load(cache)
        return d["v"], d["a"], d["dadt"]
    act, deact = synth_study_currents(GT, T1, T2)
    mask1, mask2 = P.s_study_masks()
    cfg = SurfaceConfig()
    parts = [
        estimate_gate_surface(pr, T1, act[k], RGATE, C, mask1, cfg)
        for k, pr in enumerate(P.activation_family())
    ] + [
        estimate_gate_surface(pr, T2, deact[k], RGATE, C, mask2, cfg)
        for k, pr in enumerate(P.deactivation_family())
    ]
    v, a, dadt = concat_surfaces(parts)
    np.savez(cache, v=v, a=a, dadt=dadt)
    return v, a, dadt


def params_template():
    return nnf_init(jax.random.PRNGKey(0), RGATE)


def prediction_cases():
    """All --pred protocols as (label, header, proto, ts) rows
    (reference train-s1.py:311-543)."""
    rows = [("AP 2Hz prediction", None,
             P.load_csv(f"{REFDIR}/test-protocols/ap2hz.csv"), PRED_T)]
    for name, fname, ts in [
        ("APs prediction", "aps.csv",
         jnp.linspace(0.0, 8000.0, 4001, dtype=jnp.float32)),
        ("Sinewave prediction", "sinewave.csv",
         jnp.linspace(0.0, 8000.0, 4001, dtype=jnp.float32)),
        ("Staircase prediction", "staircase.csv",
         jnp.linspace(0.0, 15000.0, 7501, dtype=jnp.float32)),
    ]:
        path = f"{REFDIR}/test-protocols/{fname}"
        if os.path.exists(path):
            rows.append((name, None, P.load_csv(path), ts))
        else:
            print(f"{name}: protocol file {fname} not in mount, skipped")
    fams = [
        ("Activation prediction:", P.activation_family(dt_ms=1.0),
         jnp.linspace(0.0, 8000.0, 8001, dtype=jnp.float32),
         [f"{v:.1f}mV" for v in P.ACTIVATION_STEPS_MV]),
        ("Deactivation prediction:", P.deactivation_family(dt_ms=1.0),
         jnp.linspace(0.0, 10000.0, 10001, dtype=jnp.float32),
         [f"{v:.1f}mV" for v in P.DEACTIVATION_STEPS_MV]),
        ("Activation time constant at 40mV prediction:",
         P.atau_family(dt_ms=1.0),
         jnp.linspace(0.0, 5000.0, 5001, dtype=jnp.float32),
         [f"{d:.1f}ms" for d in P.ATAU_DURATIONS_MS]),
    ]
    for header, protos, ts, labels in fams:
        for k, (pr, lab) in enumerate(zip(protos, labels)):
            rows.append((f"    {lab}", header if k == 0 else None, pr, ts))
    return rows


def predict_all(params: NNfParams):
    """--pred mode: per-protocol MAEs vs the ground truth, all through one
    canonical-shape compiled solve per model."""
    rows = prediction_cases()
    cases = [(proto, ts) for _, _, proto, ts in rows]
    truths = simulate_cases("hh", GT, cases, C)
    preds = simulate_cases("nnf", params, cases, C)
    for (label, header, _, _), t_, p_ in zip(rows, truths, preds):
        if header:
            print(header)
        report_mae(label, p_, t_)


def main():
    if args.pred:
        params = load_pytree(os.path.join(OUT, "model.npz"), params_template())
        predict_all(params)
        return

    v, a, dadt = build_surface()
    params = params_template()

    # pretrain towards the shifted analytic surface (train-s1.py:836-870)
    res = pretrain(params.net, GT, kind="s", iters=1000)
    net = res.params
    print(f"pretrain done | final loss {float(res.losses[-1]):.6f}")

    # main surface training, keep 0 < a < 1 (train-s1.py:890-912)
    keep = (a > 0) & (a < 1)
    x = jnp.asarray(np.stack([v[keep] / 100.0, a[keep]], axis=-1), jnp.float32)
    y = jnp.asarray(dadt[keep], jnp.float32)
    iters = args.iters or 4000
    res = fit_surface(net, x, y, iters=iters, lr=1e-3, step_size=100, gamma=0.9)
    net = res.params
    print(f"train done | iters {iters} | final loss {float(res.losses[-1]):.6f}")

    params = NNfParams(net=net, rgate=params.rgate)
    save_pytree(os.path.join(OUT, "model.npz"), params)

    # AP2Hz validation (train-s1.py:914-920)
    ap2hz = P.load_csv(f"{REFDIR}/test-protocols/ap2hz.csv")
    truth = simulate("hh", GT, ap2hz, PRED_T, C)
    pred = simulate("nnf", params, ap2hz, PRED_T, C)
    report_mae("Pretraining", pred, truth)


if __name__ == "__main__":
    main()
