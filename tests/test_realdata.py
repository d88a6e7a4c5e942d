"""Raw-recording pipeline tested on synthetic stand-in recordings: simulate
the HH model on a nominal Pr3 sweep, add noise, run both derivative-
estimation variants, and check the recovered gate against the true a(t)."""

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.data import Y0_REST, _rhs_hh
from ionflux.models.registry import HH_B06, SYNTHETIC
from ionflux.observe import add_noise, gate_current
from ionflux.realdata import (
    RealSurfaceConfig,
    real_surface_smoothi,
    real_surface_spline,
)
from ionflux.solver import odeint


def _standin_recording():
    proto = P.activation_protocol(20.0)
    ts = jnp.linspace(0.0, 8000.0, 80001, dtype=jnp.float32)
    ys = odeint(_rhs_hh, jnp.asarray(Y0_REST), ts, (HH_B06, proto),
                rtol=1e-6, atol=1e-8)
    v = P.voltage(proto, ts)
    i = gate_current(ys, v, SYNTHETIC)
    i_noisy = add_noise(jax.random.PRNGKey(0), i)
    t = np.asarray(ts, np.float64)
    # a recording's voltage column has exact repeated step values — use the
    # protocol knots, not the f32-interpolated samples
    return (t, np.asarray(i_noisy, np.float64),
            np.asarray(proto.v, np.float64),
            np.asarray(ys[:, 0], np.float64))


def test_spline_path_recovers_gate():
    t, i, v, a_true = _standin_recording()
    ts, vs, a, dadt = real_surface_spline(t, i, v, HH_B06, SYNTHETIC)
    assert len(ts) > 500
    a_ref = np.interp(ts, t, a_true)
    # inversion noise scales with 1/(r(V-E)); gate recovery within 0.05 RMS
    assert np.sqrt(np.mean((a - a_ref) ** 2)) < 0.05
    assert np.all(np.isfinite(dadt))


def test_smoothi_path_recovers_gate_and_second_derivative():
    t, i, v, a_true = _standin_recording()
    ts, vs, a, dadt, d2 = real_surface_smoothi(
        t, i, v, HH_B06, SYNTHETIC, RealSurfaceConfig(std_cutoff=0.01))
    assert len(ts) > 500
    a_ref = np.interp(ts, t, a_true)
    assert np.sqrt(np.mean((a - a_ref) ** 2)) < 0.05
    assert np.all(np.isfinite(dadt)) and np.all(np.isfinite(d2))
    # the exp-fit derivative must track the analytic HH rate on the step
    from ionflux.models.hh import a_gate_rhs

    m = (ts > 1200) & (ts < 5500)  # interior of the +20 mV step
    dadt_ref = np.asarray(a_gate_rhs(HH_B06, jnp.asarray(a_ref[m]),
                                     jnp.asarray(vs[m])))
    assert np.sqrt(np.mean((dadt[m] - dadt_ref) ** 2)) < 2e-4


def test_smoothi_sine_window_branch():
    """Segments flagged by sine_times take the quintic-spline branch
    (train-r1.py:564-573) regardless of their std: the recovered gate
    still tracks the truth and yields a smooth second derivative, and the
    output differs from the exp-fit branch on the same segment."""
    t, i, v, a_true = _standin_recording()
    cfg = RealSurfaceConfig(std_cutoff=0.01)
    # t=3000 sits inside the +20 mV activation step (1000-6000 ms): with
    # sine_times it must spline (k=5, window 21) instead of exp-fitting
    ts, vs, a, dadt, d2 = real_surface_smoothi(
        t, i, v, HH_B06, SYNTHETIC, cfg, sine_times=(3000,))
    a_ref = np.interp(ts, t, a_true)
    assert np.sqrt(np.mean((a - a_ref) ** 2)) < 0.05
    assert np.all(np.isfinite(dadt)) and np.all(np.isfinite(d2))
    ts0, _, a0, dadt0, _ = real_surface_smoothi(
        t, i, v, HH_B06, SYNTHETIC, cfg)
    m = (ts > 1200) & (ts < 5500)
    assert np.max(np.abs(a[m] - a0[m])) > 0.0  # a different estimator ran
    # and the quintic spline still tracks the analytic rate loosely (the
    # window-21 smooth keeps more noise than the exp fit by design)
    from ionflux.models.hh import a_gate_rhs

    dadt_ref = np.asarray(a_gate_rhs(HH_B06, jnp.asarray(a_ref[m]),
                                     jnp.asarray(vs[m])))
    assert np.sqrt(np.mean((dadt[m] - dadt_ref) ** 2)) < 2e-2


# ---------------------------------------------------------------------------
# Cache-refit parity vs the reference's real-lineage --smoothi surfaces
# (VERDICT r3 next #8): the archived r-study caches were produced WITH
# --smoothi (d2adt2.pt exists only on that branch, train-r1.py:809-811), so
# re-running our segment-fit dispatch on the cached gate values must
# reproduce the cached analytic derivatives.
# ---------------------------------------------------------------------------

import os

import pytest

REFERENCE = "/root/reference"
SLOW = os.environ.get("IONFLUX_SLOW_TESTS") == "1"


def test_fit_exp_ls_exact_recovery():
    from ionflux.ops.expfit import eval_exp, fit_exp_ls, tri_exp

    t = np.linspace(0.0, 500.0, 801)
    # includes a mildly NEGATIVE rate (growing component) — the basin a
    # log-rate parameterisation cannot represent
    x_true = np.array([0.8, 1 / 30, -0.3, 1 / 120, 0.15, -1 / 900, 0.05])
    a = tri_exp(t, x_true)
    x = fit_exp_ls(t, a, "tri")
    av, dv, d2v = eval_exp("tri", t, x)
    assert np.max(np.abs(av - a)) < 1e-8
    _, dv_true, d2_true = eval_exp("tri", t, x_true)
    assert np.max(np.abs(dv - dv_true)) < 1e-8
    assert np.max(np.abs(d2v - d2_true)) < 1e-9


@pytest.mark.skipif(not os.path.exists(f"{REFERENCE}/r1/d2adt2.pt"),
                    reason="reference r1 smoothi cache not mounted")
def test_smoothi_refit_matches_r1_cache():
    """Fast tier: the first 8 fitted Pr5 segments cover all three dispatch
    branches (spline holds, bi-exp +50 mV tails, tri-exp deactivation
    steps); the full three-study parity runs under IONFLUX_SLOW_TESTS=1."""
    from ionflux.realdata import smoothi_refit_cache

    out = smoothi_refit_cache(f"{REFERENCE}/r1", protocols=("pr3", "pr5"),
                              max_segments=8)
    r = out["pr5"]
    fit = r["branch"] != ""
    assert {"tri", "bi", "spline"} <= set(r["branch"][fit])
    for field, ref, tol in (("a", "a_ref", 1e-3),
                            ("dadt", "dadt_ref", 3e-4),
                            ("d2", "d2_ref", 5e-5)):
        err = np.abs(r[field] - r[ref])[fit]
        assert err.max() < tol, (field, err.max())


@pytest.mark.skipif(not SLOW, reason="full-study smoothi cache parity "
                    "(set IONFLUX_SLOW_TESTS=1)")
@pytest.mark.parametrize("study,kw", [
    ("r1", {}),
    ("r2", {}),
    ("r1-bad", dict(protocols=("pr3", "pr4"), n_points_cap=30)),
])
def test_smoothi_refit_full_study(study, kw):
    from ionflux.realdata import smoothi_refit_cache

    out = smoothi_refit_cache(f"{REFERENCE}/{study}", **kw)
    for name, r in out.items():
        fit = r["branch"] != ""
        # bounds calibrated from the measured refit (see ROADMAP): exp
        # segments reproduce to ~1e-7; spline segments re-fit on the
        # subsampled lattice to a few 1e-4 of the gate / derivative
        for field, ref, tol in (("a", "a_ref", 2e-2),
                                ("dadt", "dadt_ref", 2e-3),
                                ("d2", "d2_ref", 5e-4)):
            err = np.abs(r[field] - r[ref])[fit]
            assert err.max() < tol, (study, name, field, err.max())
            assert np.percentile(err, 99) < tol / 5, (study, name, field)
