"""Exact piecewise-constant propagators (ionflux.solver.analytic).

The reference integrates its linear ground truths numerically
(train-s1.py:556-595, train-d0.py:427-439); the analytic module propagates
them in closed form on step protocols.  Oracle: scipy solve_ivp at 1e-11
on the reference's linear-interp voltage semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.integrate import solve_ivp

from ionflux.models.registry import HH_B06, MARKOV_B06
from ionflux.solver.analytic import (
    hh_solve_analytic,
    markov_generator,
    markov_solve_analytic,
)

DT = 0.1


def _staircase(seed=3, n_levels=6, knots_per=50):
    rng = np.random.RandomState(seed)
    levels = rng.uniform(-120, 60, n_levels)
    return np.repeat(levels, knots_per).astype(np.float32)


def _hh_p8():
    return [float(getattr(HH_B06, f"p{i}")) for i in range(1, 9)]


def _scipy_hh(v, p, y0=(0.0, 1.0)):
    t = np.arange(v.size) * DT

    def rhs(tt, y):
        vv = np.interp(tt, t, v.astype(np.float64))
        k1 = p[0] * np.exp(p[1] * vv)
        k2 = p[2] * np.exp(-p[3] * vv)
        k3 = p[4] * np.exp(p[5] * vv)
        k4 = p[6] * np.exp(-p[7] * vv)
        return [k1 * (1 - y[0]) - k2 * y[0], -k3 * y[1] + k4 * (1 - y[1])]

    return solve_ivp(rhs, (0, t[-1]), list(y0), t_eval=t, rtol=1e-11,
                     atol=1e-13, method="LSODA").y.T


def test_expm1_accurate_one_ulp():
    # _hh_interval_maps must NOT go through the hardware exp: the TPU VPU's
    # f32 exp carries ~3e-6 relative error whose correlated per-interval
    # bias compounds ~20% over a long constant segment, and 1-exp(-x)
    # amplifies it by 1/x through cancellation (chip-measured, round 4).
    # The custom series/exp split must be ~1 ulp across the s*dt range.
    from ionflux.solver.analytic import _expm1_accurate

    x = -np.logspace(-7, 1, 400).astype(np.float32)
    got = np.asarray(jax.jit(_expm1_accurate)(jnp.asarray(x)), np.float64)
    ref = np.expm1(x.astype(np.float64))
    rel = np.abs(got - ref) / np.abs(ref)
    assert rel.max() < 5e-7, rel.max()
    # non-finite escapes for wild CMA-ES candidates stay non-finite
    bad = np.asarray(_expm1_accurate(jnp.asarray(
        np.array([-np.inf, np.nan], np.float32))))
    assert bad[0] == -1.0 and np.isnan(bad[1])


def test_hh_analytic_vs_scipy_oracle():
    v = _staircase()
    p = _hh_p8()
    ys = np.asarray(hh_solve_analytic(
        jnp.asarray(np.array(p, np.float32)), jnp.asarray(v), DT))
    err = np.abs(ys - _scipy_hh(v, p)).max()
    assert err < 5e-5, err


def test_hh_analytic_perturbed_params_fuzz():
    rng = np.random.RandomState(11)
    p0 = np.array(_hh_p8())
    for trial in range(4):
        v = _staircase(seed=20 + trial, n_levels=5, knots_per=40)
        p = p0 * rng.uniform(0.5, 2.0, 8)
        ys = np.asarray(hh_solve_analytic(
            jnp.asarray(p.astype(np.float32)), jnp.asarray(v), DT))
        err = np.abs(ys - _scipy_hh(v, list(p))).max()
        # 2x-perturbed exponents make the one-knot step-edge ramps much
        # stiffer; the k=4 midpoint subdivision holds ~3e-4 there while
        # constant segments stay exact
        assert err < 1e-3, (trial, err)


def test_hh_analytic_batch_matches_single():
    v = _staircase()
    rng = np.random.RandomState(7)
    p8 = np.array(_hh_p8())[None] * rng.uniform(0.8, 1.25, (4, 8))
    batched = np.asarray(hh_solve_analytic(
        jnp.asarray(p8.astype(np.float32)), jnp.asarray(v), DT))
    for b in range(4):
        single = np.asarray(hh_solve_analytic(
            jnp.asarray(p8[b].astype(np.float32)), jnp.asarray(v), DT))
        assert np.array_equal(single, batched[b])


def test_hh_analytic_sweep_chaining_is_exact():
    """Splitting a protocol and carrying y0 must reproduce the unsplit
    solve bit-for-bit at shared knots apart from f32 re-rounding — the
    per-sweep scan in train_d0's --analytic objective relies on this."""
    v = _staircase(n_levels=4, knots_per=60)
    p = jnp.asarray(np.array(_hh_p8(), np.float32))
    full = np.asarray(hh_solve_analytic(p, jnp.asarray(v), DT))
    cut = 97  # mid-segment, not a boundary
    first = hh_solve_analytic(p, jnp.asarray(v[:cut + 1]), DT)
    second = hh_solve_analytic(p, jnp.asarray(v[cut:]), DT,
                               y0=first[..., -1, :])
    glued = np.concatenate([np.asarray(first)[:-1],
                            np.asarray(second)], axis=0)
    assert np.abs(glued - full).max() < 2e-6


def test_markov_generator_columns_sum_to_zero():
    a = np.asarray(markov_generator(MARKOV_B06, jnp.asarray(
        np.linspace(-120, 60, 7, dtype=np.float32))))
    assert np.abs(a.sum(axis=-2)).max() < 1e-6  # f32 rounding floor


def test_markov_analytic_vs_scipy_oracle_and_conservation():
    v = _staircase()
    t = np.arange(v.size) * DT
    pm = [float(getattr(MARKOV_B06, f"p{i}")) for i in range(1, 13)]

    def rhs(tt, y):
        vv = np.interp(tt, t, v.astype(np.float64))
        a1 = pm[0] * np.exp(pm[1] * vv)
        b1 = pm[2] * np.exp(-pm[3] * vv)
        bh = pm[4] * np.exp(pm[5] * vv)
        ah = pm[6] * np.exp(-pm[7] * vv)
        a2 = pm[8] * np.exp(pm[9] * vv)
        b2 = pm[10] * np.exp(-pm[11] * vv)
        c1, c2, i, ic1, ic2, o = y
        return [a1 * c2 + ah * ic1 + b2 * o - (b1 + bh + a2) * c1,
                b1 * c1 + ah * ic2 - (a1 + bh) * c2,
                a2 * ic1 + bh * o - (b2 + ah) * i,
                a1 * ic2 + bh * c1 + b2 * i - (b1 + ah + a2) * ic1,
                b1 * ic1 + bh * c2 - (ah + a1) * ic2,
                a2 * c1 + ah * i - (b2 + bh) * o]

    oracle = solve_ivp(rhs, (0, t[-1]), [0, 1, 0, 0, 0, 0], t_eval=t,
                       rtol=1e-11, atol=1e-13, method="LSODA").y.T
    ys = np.asarray(markov_solve_analytic(MARKOV_B06, jnp.asarray(v), DT))
    assert np.abs(ys - oracle).max() < 1e-4
    assert np.abs(ys.sum(-1) - 1.0).max() < 1e-4


def test_analytic_objective_matches_lockstep_on_short_staircase():
    """Mini version of train_d0's SSE objective: the analytic path must
    agree with the adaptive lockstep solve within the solver's own
    tolerance-limited accuracy (the full-protocol f0 gap is ~0.7%,
    attributable to the lockstep's rtol=1e-5 f32 error — certified
    against the 1e-11 scipy oracle above)."""
    from ionflux import protocols as P
    from ionflux.solver import odeint_batched

    v = _staircase(seed=5, n_levels=5, knots_per=80)
    ts = jnp.arange(v.size, dtype=jnp.float32) * jnp.float32(DT)
    proto = P.Protocol(jnp.asarray(0.0, jnp.float32),
                       jnp.asarray(DT, jnp.float32), jnp.asarray(v))
    rng = np.random.RandomState(0)
    p8 = np.array(_hh_p8())[None] * rng.uniform(0.9, 1.1, (3, 8))
    p8 = jnp.asarray(p8.astype(np.float32))

    def rhs(t, y, args):
        ps, pr = args
        vv = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * vv)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * vv)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * vv)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * vv)
        return jnp.stack([k1 * (1 - y[:, 0]) - k2 * y[:, 0],
                          -k3 * y[:, 1] + k4 * (1 - y[:, 1])], axis=-1)

    y0 = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (3, 1))
    ys_num = np.asarray(odeint_batched(rhs, y0, ts, (p8, proto),
                                       rtol=1e-6, atol=1e-8,
                                       buffer_size=4096, max_steps=100_000))
    ys_ana = np.asarray(hh_solve_analytic(p8, jnp.asarray(v), DT))
    e_rev = -88.4
    i_num = ys_num[..., 0] * ys_num[..., 1] * (np.asarray(v)[None] - e_rev)
    i_ana = ys_ana[..., 0] * ys_ana[..., 1] * (np.asarray(v)[None] - e_rev)
    sse_num = (i_num ** 2).sum(axis=1)
    sse_ana = (i_ana ** 2).sum(axis=1)
    assert np.abs(sse_num / sse_ana - 1.0).max() < 2e-3
    assert np.abs(i_num - i_ana).max() < 2e-2


def test_hh_analytic_wild_candidate_overflows_to_nonfinite_not_hang():
    """A CMA-ES candidate at the 10x bound can overflow the f32 rate
    p1*e^{p2 V}; the propagator must yield non-finite states (the
    objective's isfinite->inf sentinel), never raise or hang."""
    v = _staircase()
    p = np.array(_hh_p8(), np.float32)
    p[1] *= 30.0  # e^{3.5*60} overflows f32
    ys = np.asarray(hh_solve_analytic(jnp.asarray(p), jnp.asarray(v), DT))
    assert not np.isfinite(ys).all()


def test_hh_segments_structure():
    from ionflux.solver.analytic import hh_segments
    v = np.array([-80.0] * 4 + [-40.0] * 3 + [20.0] * 5, np.float32)
    seg = hh_segments(v)
    # runs: [-80 x4] | ramp | [-40 x2] | ramp | [20 x4] -> 5 segments
    assert seg.n_segments == 5
    assert list(seg.is_ramp) == [False, True, False, True, False]
    assert list(seg.first) == [0, 3, 4, 6, 7]
    assert list(seg.length) == [3, 1, 2, 1, 4]
    assert list(seg.g) == [0, 0, 0, 1, 2, 2, 3, 4, 4, 4, 4]
    assert list(seg.r) == [1, 2, 3, 1, 1, 2, 1, 1, 2, 3, 4]
    # a family whose sweeps disagree forces union boundaries
    v2 = np.stack([v, np.full_like(v, -80.0)])
    assert hh_segments(v2).n_segments == 5


def _f64_midpoint_ref(v, p, sub=4, y0=(0.0, 1.0)):
    """f64 composition with the SAME k-slice midpoint ramp treatment as
    the analytic paths — isolates f32 ROUNDING (not ramp discretisation,
    which both paths share and the scipy-oracle tests already bound)."""
    w = (np.arange(sub) + 0.5) / sub
    p = np.asarray(p, np.float64)
    y = np.asarray(y0, np.float64)
    out = [y]
    for i in range(v.size - 1):
        for j in range(sub):
            vm = v[i] + w[j] * (v[i + 1] - v[i])
            k1 = p[0] * np.exp(p[1] * vm)
            k2 = p[2] * np.exp(-p[3] * vm)
            k3 = p[4] * np.exp(p[5] * vm)
            k4 = p[6] * np.exp(-p[7] * vm)
            s = np.array([k1 + k2, k3 + k4])
            xinf = np.array([k1, k4]) / s
            y = xinf + (y - xinf) * np.exp(-s * DT / sub)
        out.append(y)
    return np.array(out)


def test_hh_analytic_seg_beats_interval_path_rounding():
    """The segment-exact path evaluates each knot's exponential ONCE from
    its segment-start state, so it avoids the interval-composed path's
    compounded f32 rounding drift over long constant segments (measured
    9.7e-4 after 56k intervals of a recorded Pr3 sweep, round 4)."""
    from ionflux.solver.analytic import hh_solve_analytic_seg
    v = _staircase(n_levels=4, knots_per=4000)  # long constant segments
    p = _hh_p8()
    ref = _f64_midpoint_ref(v.astype(np.float64), p)
    ys_seg = np.asarray(hh_solve_analytic_seg(
        jnp.asarray(np.array(p, np.float32)), jnp.asarray(v), DT))
    ys_iv = np.asarray(hh_solve_analytic(
        jnp.asarray(np.array(p, np.float32)), jnp.asarray(v), DT))
    err_seg = np.abs(ys_seg - ref).max()
    err_iv = np.abs(ys_iv - ref).max()
    assert err_seg < 2e-6, err_seg
    assert err_seg <= err_iv + 1e-7, (err_seg, err_iv)


def test_hh_analytic_seg_matches_interval_path_with_carry_and_pop():
    from ionflux.solver.analytic import hh_segments, hh_solve_analytic_seg
    v = _staircase(seed=9, n_levels=5, knots_per=60)
    rng = np.random.RandomState(5)
    p8 = np.array(_hh_p8())[None] * rng.uniform(0.8, 1.25, (3, 8))
    p8 = jnp.asarray(p8.astype(np.float32))
    y0 = jnp.asarray(rng.uniform(0.1, 0.9, (3, 2)).astype(np.float32))
    seg = hh_segments(v)
    a = np.asarray(hh_solve_analytic(p8, jnp.asarray(v), DT, y0=y0))
    b = np.asarray(hh_solve_analytic_seg(p8, jnp.asarray(v), DT, y0=y0,
                                         seg=seg))
    # short segments: both paths agree to f32 noise
    assert np.abs(a - b).max() < 3e-5, np.abs(a - b).max()


def test_hh_analytic_seg_shared_seg_across_traced_sweeps():
    """One static HHSegments drives a lax.scan over sweeps whose traced
    voltage LEVELS differ (the Pr3/Pr5 family pattern)."""
    from ionflux.solver.analytic import hh_segments, hh_solve_analytic_seg
    base = np.array([-80.0] * 40 + [-40.0] * 30 + [-80.0] * 30, np.float32)
    rows = np.stack([base, np.where(base == -40.0, 10.0, base),
                     np.where(base == -40.0, 40.0, base)])
    seg = hh_segments(rows)
    p8 = jnp.asarray(np.array(_hh_p8(), np.float32))

    def sweep(y, v_row):
        ys = hh_solve_analytic_seg(p8, v_row, DT, y0=y, seg=seg)
        return ys[-1], ys

    _, ys = jax.lax.scan(sweep, jnp.array([0.0, 1.0], jnp.float32),
                         jnp.asarray(rows))
    for k in range(3):
        ref = _scipy_hh(rows[k], _hh_p8()) if k == 0 else None
        one = np.asarray(hh_solve_analytic_seg(
            p8, jnp.asarray(rows[k]), DT,
            y0=None if k == 0 else np.asarray(prev_end), seg=seg))
        assert np.abs(np.asarray(ys[k]) - one).max() < 1e-6
        if ref is not None:
            assert np.abs(one - ref).max() < 5e-5
        prev_end = ys[k][-1]


def test_hh_analytic_seg_wild_candidate_nonfinite_not_hang():
    from ionflux.solver.analytic import hh_solve_analytic_seg
    v = _staircase(n_levels=3, knots_per=30)
    p8 = jnp.asarray(np.array([1e30, 5.0, 1e30, 5.0] * 2, np.float32))
    ys = np.asarray(hh_solve_analytic_seg(p8, jnp.asarray(v), DT))
    assert not np.all(np.isfinite(ys))
