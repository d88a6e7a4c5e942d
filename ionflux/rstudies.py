"""Real-data (Beattie 2018 cell-5) study definitions and runner.

  r1      NN-f on Pr3+Pr5 surfaces               (train-r1.py)
  r2      NN-d, cell-5 HH base, no E shift       (train-r2.py)
  r1-bad  NN-f on insufficient protocols          (train-r1-bad.py;
          negative control analysed in figures 6/7)
  r1-tune NN-f with swept (n_layers, n_nodes)     (train-r1-tune.py)

Data availability (SURVEY.md §1.1): the raw cell-5 CSVs are not in the
read-only mount.  When absent, the runner loads the reference's OWN cached
derivative surfaces (r1/{t,v,a,dadt}.pt ...) through the torch-free reader —
these are the exact training inputs the reference trained on, so the full
training path (pretrain -> 16000 chunked iters -> checkpoint/best-model
selection) runs with full fidelity.  Validation rollouts against measured
currents need the raw CSVs; degraded mode substitutes rollout-health checks
(finite whole-trace solves on nominal Pr5/AP2Hz templates) and tracks the
training loss for best-model selection, clearly labelled.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, replace

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.eval import simulate
from ionflux.fit.train import fit_chunk, init_opt_state, fit_surface, pretrain_grid_r
from ionflux.models import a_gate_rhs, nnd_init, nnf_init
from ionflux.models.nn import NNdParams, NNfParams
from ionflux.models.registry import (
    ARCHITECTURES,
    CELL5_R1,
    CELL5_R1BAD,
    CELL5_R2,
    Constants,
    HH_CELL5_FIT,
    HH_CELL5_INIT,
    HH_R1BAD_INIT,
    HHParams,
)
from ionflux.utils.ckpt import (save_checkpoint, save_model_bundle,
                                save_pytree)
from ionflux.utils.ptload import pt_load

REFDIR = "/root/reference"


@dataclass(frozen=True)
class RealStudy:
    name: str
    model_kind: str               # 'nnf' | 'nnd'
    rgate: HHParams               # known r-gate (p5-p8)
    base_hh: HHParams | None      # NN-d analytic part
    constants: Constants
    init_std: float
    pretrain_hh: HHParams         # analytic pretrain surface (p1-p4)
    pretrain_residual: bool       # NN-d pretrains through its analytic part
    surface_dir: str              # reference dir with cached {t,v,a,dadt}.pt
    n_layers: int = 5
    n_nodes: int = 200
    iters: int = 16000
    step_size: int = 400


R1 = RealStudy("r1", "nnf", HH_CELL5_INIT, None, CELL5_R1, 0.1,
               HH_CELL5_INIT, False, "r1")
R2 = RealStudy("r2", "nnd", HH_CELL5_FIT, HH_CELL5_FIT, CELL5_R2, 1e-3,
               HH_CELL5_FIT, True, "r2")
R1BAD = RealStudy("r1-bad", "nnf", HH_R1BAD_INIT, None, CELL5_R1BAD, 0.1,
                  HH_R1BAD_INIT, False, "r1-bad")

RSTUDIES = {s.name: s for s in (R1, R2, R1BAD)}


def tune_study(arch_id: str) -> RealStudy:
    """r1-tune variant: architecture from --info sNN (train-r1-tune.py,
    architectures/sNN.py)."""
    n_layers, n_nodes = ARCHITECTURES[arch_id]
    return replace(R1, name=f"r1-tune-{arch_id}", n_layers=n_layers,
                   n_nodes=n_nodes)


def surface_from_recordings(spec: RealStudy, data_dir: str,
                            smoothi: bool = False):
    """Data-present path: build the training surface from the raw cell-5
    CSVs (train-r1.py:80-130, 387-811).  r1 trains on Pr3+Pr5 ("not using
    sine wave", train-r1.py:794-797); r1-bad on Pr3+Pr4."""
    from ionflux.realdata import (
        RealSurfaceConfig,
        load_recording,
        real_surface_smoothi,
        real_surface_spline,
    )

    files = {
        "r1": ["pr3-steady-activation-cell-5.csv",
               "pr5-deactivation-cell-5.csv"],
        "r2": ["pr3-steady-activation-cell-5.csv",
               "pr5-deactivation-cell-5.csv"],
        "r1-bad": ["pr3-steady-activation-cell-5.csv",
                   "pr4-inactivation-cell-5.csv"],
    }[spec.surface_dir if spec.surface_dir in ("r1", "r2", "r1-bad")
      else "r1"]
    from ionflux.ops.expfit import X0_TRI
    from ionflux.realdata import PR5_BI_TIMES, PR5_CMA_VOLTAGES

    parts = []
    for fname in files:
        t, i, v = load_recording(os.path.join(data_dir, fname))
        kw = {}
        # per-protocol exp-vs-spline cutoffs and tri-exp initial guesses
        # (train-r1.py:460, 524, 602; x0 at :490 vs x02 at :545/634)
        cfg = RealSurfaceConfig(
            std_cutoff=0.01 if "pr3" in fname else 0.015,
            tri_x0=tuple(X0_TRI) if "pr3" in fname else None)
        if "pr5" in fname:
            kw = dict(bi_exp_times=PR5_BI_TIMES, cma_voltages=PR5_CMA_VOLTAGES)
        if smoothi:
            ts_, vs_, a_, dadt_, d2_ = real_surface_smoothi(
                t, i, v, spec.rgate, spec.constants, cfg, **kw)
        else:
            ts_, vs_, a_, dadt_ = real_surface_spline(
                t, i, v, spec.rgate, spec.constants, cfg)
        parts.append((ts_, vs_, a_, dadt_))
    t = np.concatenate([p[0] for p in parts])
    v = np.concatenate([p[1] for p in parts])
    a = np.concatenate([p[2] for p in parts])
    dadt = np.concatenate([p[3] for p in parts])
    return t, v, a, dadt


def load_reference_surface(spec: RealStudy):
    """The reference's cached training surface (train-r1.py:380-386)."""
    d = f"{REFDIR}/{spec.surface_dir}"
    v = pt_load(f"{d}/v.pt")
    a = pt_load(f"{d}/a.pt")
    dadt = pt_load(f"{d}/dadt.pt")
    t_path = f"{d}/t.pt"
    t = (pt_load(t_path) if os.path.exists(t_path)
         else np.arange(len(np.asarray(v)), dtype=np.float64))
    return (np.asarray(t), np.asarray(v), np.asarray(a), np.asarray(dadt))


def init_params(spec: RealStudy, key=None):
    key = jax.random.PRNGKey(0) if key is None else key
    if spec.model_kind == "nnf":
        return nnf_init(key, spec.rgate, spec.n_layers, spec.n_nodes,
                        spec.init_std)
    return nnd_init(key, spec.base_hh, spec.n_layers, spec.n_nodes,
                    spec.init_std)


def wrap_net(spec: RealStudy, net):
    if spec.model_kind == "nnf":
        return NNfParams(net=net, rgate=spec.rgate)
    return NNdParams(net=net, hh=spec.base_hh)


def pretrain_r(spec: RealStudy, net):
    """1000-iter pretrain on the 100x100 analytic grid (train-r1.py:840-877;
    r2 pretrains through its analytic residual, train-r2.py:869-897)."""
    x, y = pretrain_grid_r(spec.pretrain_hh)
    residual = None
    if spec.pretrain_residual:
        residual = a_gate_rhs(spec.base_hh, x[:, 1], x[:, 0] * 100.0)
    return fit_surface(net, x, y, residual, iters=1000, lr=1e-3,
                       step_size=None).params


def rollout_health(spec: RealStudy, params) -> tuple[float, bool]:
    """Degraded-mode validation: solve the nominal Pr5 template whole-trace;
    returns (mean |I|, finite?). Used only when neither the cell-5 CSVs nor
    the reconstructed protocols + cached surfaces are available."""
    proto = P.deactivation_protocol(-80.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 10000.0, 1001, dtype=jnp.float32)
    i = simulate(spec.model_kind, params, proto, ts, spec.constants)
    finite = bool(jnp.all(jnp.isfinite(i)))
    return float(jnp.mean(jnp.abs(i))) if finite else float("inf"), finite


class RealValidator:
    """Reference-faithful validation rollouts (train-r1.py:928-959).

    The reference scores every 400 iters by whole-trace MAE against the
    measured APs and Pr5 currents and keeps the best checkpoint — this
    selection does the heavy lifting (the archived r1 best checkpoint is from
    epoch 401/16000; by 15601 the Pr5 MAE has degraded 4.5x).  The measured
    APs current is not recoverable from the mount, so we score on the
    recovered Pr5 (+Pr3, reported) measurements at the retained sample times
    (realdata.recover_measurements) over the reconstructed real protocols.
    """

    def __init__(self, spec: RealStudy, protocols=("pr5", "pr3")):
        from ionflux import protorec
        from ionflux.realdata import recover_measurements

        # the measured current is a physical quantity — recover it from the
        # r1 surface cache with r1's own inversion constants regardless of
        # which study is being validated (r1-bad's cache covers Pr3+Pr4 only)
        meas = recover_measurements(f"{REFDIR}/r1", CELL5_R1, HH_CELL5_INIT)
        self.spec = spec
        self.cases = []
        for name in protocols:
            tl, i_meas = meas[name]
            idx = jnp.asarray(np.round(tl / protorec.DT_MS).astype(np.int64))
            self.cases.append((name, idx, jnp.asarray(i_meas, jnp.float32)))

    def __call__(self, params) -> dict[str, float]:
        from ionflux.eval import simulate_long

        out = {}
        for name, idx, i_meas in self.cases:
            # segment-chained whole-trace rollout (f32-exact local clocks)
            i = simulate_long(self.spec.model_kind, params, f"{name}-cell5",
                              self.spec.constants)[idx]
            mae = float(jnp.mean(jnp.abs(i - i_meas)))
            out[name] = mae if np.isfinite(mae) else float("inf")
        return out


def run_real_study(spec: RealStudy, outdir: str, iters: int | None = None,
                   surface=None, suffix: str = "-2",
                   smoothi: bool = False):
    """Full r-study training: pretrain + chunked Adam with per-chunk
    validation and best-checkpoint selection (train-r1.py:917-960).
    smoothi selects the exp-fit surface variant in the data-present branch
    (the --smoothi flag, train-r1.py:422-673)."""
    os.makedirs(outdir, exist_ok=True)
    if surface is None:
        data_dir = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data")
        if os.path.exists(os.path.join(
                data_dir, "pr3-steady-activation-cell-5.csv")):
            surface = surface_from_recordings(spec, data_dir,
                                              smoothi=smoothi)
        else:
            if smoothi:
                print("--smoothi requested but the raw CSVs are absent; "
                      "training on the reference's cached surfaces "
                      "(which ARE the smoothi product for r1)")
            surface = load_reference_surface(spec)
    _t, v, a, dadt = surface

    keep = a > 0  # train-r1.py:911-915
    x = jnp.asarray(np.stack([v[keep] / 100.0, a[keep]], axis=-1), jnp.float32)
    y = jnp.asarray(dadt[keep], jnp.float32)
    residual = None
    if spec.model_kind == "nnd":
        residual = a_gate_rhs(spec.base_hh, x[:, 1], x[:, 0] * 100.0)

    params0 = init_params(spec)
    net = pretrain_r(spec, params0.net)
    print("pretrain done")

    validator = None
    try:
        # Pr5-only during training (single-core budget); the reference sums
        # measured APs + Pr5 MAEs (train-r1.py:947-951)
        validator = RealValidator(spec, protocols=("pr5",))
        print("validator: best-checkpoint selection on Pr5 MAE only "
              "(reference sums measured APs + Pr5, train-r1.py:947-951; "
              "the measured APs currents are not recoverable from the "
              "reference artifacts)")
    except Exception as exc:  # reference surfaces/assets absent
        print(f"(real validation unavailable: {exc}; "
              "falling back to rollout-health selection)")

    total = iters if iters is not None else spec.iters
    chunk = min(400, total)
    opt_state = init_opt_state(net, 1e-3, spec.step_size, 0.9)
    best = float("inf")
    best_params = wrap_net(spec, net)
    done = 0
    while done < total:
        n = min(chunk, total - done)
        net, opt_state, losses = fit_chunk(
            net, opt_state, x, y, residual, iters=n, lr=1e-3,
            step_size=spec.step_size, gamma=0.9)
        done += n
        train_loss = float(losses[-1])
        params = wrap_net(spec, net)
        if validator is not None:
            maes = validator(params)
            # selection on the Pr5 prediction MAE (the reference sums the
            # measured APs + Pr5 MAEs, train-r1.py:947-951; APs data is
            # unrecoverable, Pr3 is reported for visibility)
            score = maes["pr5"]
            val_txt = " | ".join(
                f"{k} MAE {v_:.6f}" for k, v_ in maes.items())
            losses_meta = [train_loss] + list(maes.values())
        else:
            val, finite = rollout_health(spec, params)
            score = train_loss if finite else float("inf")
            val_txt = (f"rollout mean|I| {val:.4f} "
                       f"({'ok' if finite else 'DIVERGED'})")
            losses_meta = [train_loss, val]
        is_best = score < best
        if is_best:
            best = score
            best_params = params
        print(f"Iter {done} | Loss {train_loss:.6f} | {val_txt}"
              + (" | ===== Current best model =====" if is_best else ""))
        save_checkpoint(outdir, params, opt_state, done, losses_meta,
                        suffix=suffix, is_best=is_best)
    params = wrap_net(spec, net)
    save_pytree(os.path.join(outdir, "model.npz"), params)
    save_pytree(os.path.join(outdir, "best-model.npz"), best_params)
    # model-entire analogue (train-r1.py:964-965)
    save_model_bundle(os.path.join(outdir, "model-entire.npz"), best_params,
                      spec)
    return best_params


def predict_real_study(spec: RealStudy, outdir: str) -> dict:
    """--pred replay for the real studies (reference train-r1.py:219-374):
    per-protocol MAEs of the trained best checkpoint vs the measured data.

    The raw CSVs are not redistributed, so the Pr3/Pr5/Pr4 rows score the
    smoothed measured currents recovered from the reference's own surface
    caches (realdata.recover_measurements) on the reconstructed protocols;
    the measured sinewave/APs currents are unrecoverable, so those rows
    report agreement with the reference's archived model trace of the same
    family (table-2/y{1,2}-*.pt) when one exists, clearly labelled.
    """
    import json as _json

    from ionflux import protorec
    from ionflux.eval import simulate_long, solve_states_real
    from ionflux.models.registry import (CELL5_R1, CELL5_R1BAD,
                                         HH_CELL5_INIT, HH_R1BAD_INIT)
    from ionflux.observe import gate_current
    from ionflux.realdata import recover_measurements
    from ionflux.utils.ckpt import load_pytree
    from ionflux.utils.ptload import pt_load

    refdir = "/root/reference"
    path = os.path.join(outdir, "best-model.npz")
    if not os.path.exists(path):
        path = os.path.join(outdir, "model.npz")
    params = load_pytree(path, init_params(spec))
    meta = os.path.join(outdir, "best-model-checkpoint-2.json")
    if os.path.exists(meta):
        with open(meta) as fh:
            print("Best checkpoint loss:", _json.load(fh)["loss"])

    meas = dict(recover_measurements(f"{refdir}/r1", CELL5_R1,
                                     HH_CELL5_INIT))
    meas.update({"pr4": recover_measurements(
        f"{refdir}/r1-bad", CELL5_R1BAD, HH_R1BAD_INIT,
        protocols=("pr3", "pr4"), n_points=30)["pr4"]})

    out = {}
    for name, label in (("pr3", "Pr3"), ("pr5", "Pr5"), ("pr4", "Pr4")):
        tl, i_meas = meas[name]
        idx = np.round(np.asarray(tl) / protorec.DT_MS).astype(np.int64)
        i = np.asarray(simulate_long(spec.model_kind, params,
                                     f"{name}-cell5", spec.constants),
                       np.float64)
        out[name] = float(np.mean(np.abs(i[idx] - np.asarray(i_meas))))
        print(f"{label} prediction | Total Loss {out[name]:.6f}")
    tag = {"nnf": "y1", "nnd": "y2"}[spec.model_kind]
    for name, label in (("sinewave", "Sinewave"), ("aps", "APs")):
        stored = f"{refdir}/table-2/{tag}-{name}.pt"
        if spec.name not in ("r1", "r2") or not os.path.exists(stored):
            print(f"{label} prediction: measured currents not recoverable "
                  "(no stored trace for this study), skipped")
            continue
        ref_i = np.asarray(pt_load(stored)).reshape(-1)
        v, _dt = protorec.load_voltage(f"{name}-cell5")
        ours = gate_current(
            solve_states_real(spec.model_kind, params, f"{name}-cell5"),
            jnp.asarray(v, jnp.float32), spec.constants)
        out[name] = float(np.mean(np.abs(np.asarray(ours, np.float64)
                                         - ref_i)))
        print(f"{label} prediction (vs archived {tag}-{name}.pt trace) | "
              f"Total Loss {out[name]:.6f}")
    return out
