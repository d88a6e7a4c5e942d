#!/usr/bin/env python3
"""Reconstruct the missing cell-5 protocol files from reference artifacts.

Derives the real Pr3/Pr5 step tables from the r1 surface samples, inverts the
GroundTruth_a trajectories for Pr4 / sinewave / APs (ionflux.protorec), writes
the per-sample voltage assets, and validates every reconstruction by
re-simulating the reference's own models on it:

  * gt_a (a, u) trajectory vs figure-1-s{1,2}/yc-*.pt     (float32 storage)
  * d0-HH current vs table-1/yo-*.pt                      (clean float64)
  * Markov GT current vs table-1/yc-*.pt                  (sigma=0.1 noise)

Run:  python scripts/reconstruct_protocols.py [--skip-validate]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir))

import numpy as np

REF = os.environ.get("IONFLUX_REFERENCE", "/root/reference")


def _force_cpu_f64():
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), os.pardir,
                                   ".jax_cache"))


def derive_pr3_pr5():
    """Pin Pr3/Pr5 step boundaries from r1/t.pt + r1/v.pt mask-gap brackets.

    The training mask drops 90 samples (7 ms + 20 pts) after and 20 samples
    before each step boundary (train-r1.py:96-130), then keeps [10::7].  A
    boundary at sample b is therefore bracketed by
    [last_seen + 21, first_seen - 90] samples; intersecting the brackets of
    all sweeps under the recording's exact periodicity pins it to a few
    samples.  Levels are read off v.pt directly (they ARE the voltages).
    """
    from ionflux import protorec as R
    from ionflux.utils.ptload import pt_load

    t = np.asarray(pt_load(f"{REF}/r1/t.pt"))
    v = np.asarray(pt_load(f"{REF}/r1/v.pt"))
    si = np.round(t / R.DT_MS).astype(np.int64)  # original sample indices

    # split at the pr3/pr5 concatenation (t3 starts over near 0 + offset)
    dt_gap = np.diff(t)
    dv = np.diff(v)
    cut = None
    for i in range(len(t) - 1):
        # concat point: a time step of ~1.2 ms with no voltage change
        if 0.71 < dt_gap[i] < 2.0 and dv[i] == 0:
            cut = i + 1
            break
    assert cut is not None, "pr3/pr5 concat point not found"
    # t3 global = time1[-1] + time3 local; the retained pr5 samples sit at
    # local indices 10 + 7k (the [10::7] subsample of an unmasked head), so
    # time1[-1] is pinned by making the first retained local index exactly 10
    n1_minus_1 = si[cut] - 10
    n1 = n1_minus_1 + 1
    assert np.all(np.diff(si[cut:cut + 40]) == 7), "pr5 head not uniform"
    print(f"pr3 length N1 = {n1} samples ({(n1 - 1) * R.DT_MS:.1f} ms)")

    def brackets(si_loc, v_loc):
        """(lo, hi, v_before, v_after) sample-index brackets per boundary.

        A retained sample j requires no boundary in [j-90, j+20]
        (train-r1.py:101-130: 70 cap + 20 extra after, 20 before), so a
        boundary b (first new-level sample) satisfies
        last_seen + 21 <= b <= first_seen - 91."""
        out = []
        for i in range(len(si_loc) - 1):
            gap = si_loc[i + 1] - si_loc[i]
            if v_loc[i + 1] != v_loc[i] or gap > 30:
                out.append((si_loc[i] + 21, si_loc[i + 1] - 91,
                            v_loc[i], v_loc[i + 1]))
        return out

    br3 = brackets(si[:cut], v[:cut])
    br5 = brackets(si[cut:] - n1, v[cut:])
    return n1, br3, br5


def check_step_table(name, build, brackets, n_total):
    """Verify an analytic step table against the mask-gap brackets: each
    observed transition v_a -> v_b must occur at exactly one table boundary
    inside its bracket, and nowhere must the table disagree with an observed
    retained sample's level (v_a before lo, v_b after hi)."""
    vfull = build()
    assert len(vfull) == n_total, (name, len(vfull), n_total)
    bad = 0
    for lo, hi, v_a, v_b in brackets:
        if vfull[lo - 21] != v_a or vfull[min(hi + 91, n_total - 1)] != v_b:
            print(f"  {name}: bracket [{lo},{hi}] {v_a}->{v_b}: table has "
                  f"{vfull[lo - 21]}->{vfull[min(hi + 91, n_total - 1)]}")
            bad += 1
            continue
        jumps = np.where(np.diff(vfull[lo - 1:hi + 1]) != 0)[0]
        if len(jumps) != 1 and v_a != v_b:
            print(f"  {name}: bracket [{lo},{hi}] {v_a}->{v_b}: "
                  f"{len(jumps)} table boundaries inside")
            bad += 1
    print(f"{name}: {len(brackets)} mask-gap brackets, {bad} mismatches")
    return bad == 0


def reconstruct_aps():
    """APs waveform: gt_a inversion seeded, gradient trajectory-fitted."""
    from scipy.ndimage import median_filter

    from ionflux import protorec as R
    from ionflux.models.registry import HH_D0_FIT, TABLE1
    from ionflux.utils.ptload import pt_load

    a, u = [np.asarray(x) for x in
            pt_load(f"{REF}/figure-1-s2/yc-pr4.pt")]  # misnamed APs
    yo = np.asarray(pt_load(f"{REF}/table-1/yo-aps.pt")).reshape(-1)
    assert len(a) == len(yo) == 88245

    v, res, sens = R.invert_gt_a(a, u)
    # structure prior: truly dead samples sit at the holding potential;
    # weakly-conditioned stretches get heavier median smoothing
    v[sens < 1e-9] = -80.0
    weak = (sens >= 1e-9) & (sens < 1e-7)
    v[weak] = median_filter(v, size=51, mode="nearest")[weak]

    # staged schedule: structure-seeded fit, then alternating large-step
    # (timing corrections at AP upstrokes) and settle stages; lands at
    # i-RMSE ~1.1e-2 / a-RMSE ~2.4e-4 (table-1 APs column at full parity)
    v = R.fit_voltage(v, a, yo, HH_D0_FIT, TABLE1,
                      stages=((1e6, 1.0, 0.3, 400), (1e5, 100.0, 1.0, 800),
                              (1e6, 100.0, 0.05, 300),
                              (1e5, 100.0, 0.7, 700), (1e6, 100.0, 0.05, 400),
                              (1e5, 300.0, 0.3, 600), (1e6, 300.0, 0.02, 400)))
    path = R.save_asset("aps-cell5", v)
    print(f"aps-cell5 asset written: {path}")
    return v


def reconstruct_sinewave():
    """Recorded sinewave voltage: the analytic scaffold carries ~0.12 mV of
    recording noise inside the sine window (measured against the stored
    trajectories); recover the actual per-sample voltages there."""
    from ionflux import protorec as R
    from ionflux.models.registry import HH_D0_FIT, TABLE1
    from ionflux.utils.ptload import pt_load

    a, _u = [np.asarray(x) for x in pt_load(f"{REF}/figure-1-s2/yc-sinewave.pt")]
    yo = np.asarray(pt_load(f"{REF}/table-1/yo-sinewave.pt")).reshape(-1)
    v0 = R.sinewave_cell5_voltage()
    free = np.zeros(len(v0), bool)
    free[30001:65001] = True
    v = R.fit_voltage(v0, a, yo, HH_D0_FIT, TABLE1, free=free,
                      stages=((1e6, 100.0, 0.05, 400),
                              (1e6, 100.0, 0.01, 200)))
    path = R.save_asset("sinewave-cell5", v)
    print(f"sinewave-cell5 asset written: {path}")
    return v


def validate(name, src_traj, yo_name, yc_name=None, y1_name=None):
    import jax.numpy as jnp

    from ionflux import protorec as R
    from ionflux.eval import simulate, solve_states
    from ionflux.models.nn import NNfParams
    from ionflux.models.registry import (HH_D0_FIT, HH_D0_INIT, MARKOV_B06,
                                         TABLE1)
    from ionflux.utils import load_mlp_state_dict
    from ionflux.utils.ptload import pt_load

    v, dt = R.load_voltage(name)
    t = np.arange(len(v)) * dt
    from ionflux import protocols as P
    proto = P.from_time_series(t, v, dtype=jnp.float64)
    ts = jnp.asarray(t, jnp.float64)

    # 1) gt_a trajectory parity (stored float32)
    a_ref, u_ref = [np.asarray(x, np.float64) for x in
                    pt_load(f"{REF}/{src_traj}")]
    y0 = jnp.asarray(np.array([0.0, 0.0]), jnp.float64)
    ys = np.asarray(solve_states("gta", MARKOV_B06, proto, ts, y0=y0,
                                 rtol=1e-7, atol=1e-9,
                                 max_steps=1_000_000, buffer_size=65536))
    rmse_a = float(np.sqrt(np.mean((ys[:, 0] - a_ref) ** 2)))

    # 2) clean d0-HH current parity (stored float64)
    yo_ref = np.asarray(pt_load(f"{REF}/table-1/{yo_name}")).reshape(-1)
    i_hh = np.asarray(simulate("hh", HH_D0_FIT, proto, ts, TABLE1,
                               rtol=1e-7, atol=1e-9,
                                 max_steps=1_000_000, buffer_size=65536))
    rmse_yo = float(np.sqrt(np.mean((i_hh - yo_ref) ** 2)))

    # 3) Markov GT vs noisy stored data (sigma=0.1 -> MAE ~ 0.0798)
    mae_yc = float("nan")
    if yc_name is not None:
        yc_ref = np.asarray(pt_load(f"{REF}/table-1/{yc_name}")).reshape(-1)
        i_gt = np.asarray(simulate("markov", MARKOV_B06, proto, ts, TABLE1,
                                   rtol=1e-7, atol=1e-9,
                                 max_steps=1_000_000, buffer_size=65536))
        mae_yc = float(np.mean(np.abs(i_gt - yc_ref)))

    # 4) NN-f with the reference's d1 weights vs clean y1 trace
    rmse_y1 = float("nan")
    if y1_name is not None:
        y1_ref = np.asarray(pt_load(f"{REF}/table-1/{y1_name}")).reshape(-1)
        net = [(jnp.asarray(w), jnp.asarray(b)) for w, b in
               load_mlp_state_dict(f"{REF}/d1/model-state-dict.pt")]
        nnf = NNfParams(net=net, rgate=HH_D0_INIT)
        i_1 = np.asarray(simulate("nnf", nnf, proto, ts, TABLE1,
                                  rtol=1e-7, atol=1e-9,
                                 max_steps=1_000_000, buffer_size=65536))
        rmse_y1 = float(np.sqrt(np.mean((i_1 - y1_ref) ** 2)))

    print(f"{name}: gt_a a-RMSE {rmse_a:.3e} | d0-HH current RMSE "
          f"{rmse_yo:.3e} | GT-vs-noisy-data MAE {mae_yc:.4f} | "
          f"d1 NN-f RMSE {rmse_y1:.3e}")
    return rmse_a, rmse_yo, mae_yc, rmse_y1


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-validate", action="store_true")
    args = ap.parse_args()

    _force_cpu_f64()
    from ionflux import protorec as R

    n1, br3, br5 = derive_pr3_pr5()
    ok3 = check_step_table("pr3-cell5", R.pr3_cell5_voltage, br3, R.PR3_N)
    ok5 = check_step_table("pr5-cell5", R.pr5_cell5_voltage, br5, R.PR5_N)

    reconstruct_aps()
    reconstruct_sinewave()

    if not args.skip_validate:
        results = {}
        results["sinewave"] = validate("sinewave-cell5",
                                       "figure-1-s2/yc-sinewave.pt",
                                       "yo-sinewave.pt",
                                       yc_name="yc-sinewave.pt")
        results["aps"] = validate("aps-cell5", "figure-1-s2/yc-pr4.pt",
                                  "yo-aps.pt", yc_name="yc-aps.pt")
        # table-1 never cached yc-pr4 (the caching quirk, SURVEY §2.1);
        # cross-check with the clean d1 NN-f trace instead
        results["pr4"] = validate("pr4-cell5", "figure-1-s1/yc-pr4.pt",
                                  "yo-pr4.pt", y1_name="y1-pr4.pt")
    print("done; step tables ok:", ok3 and ok5)


if __name__ == "__main__":
    main()
