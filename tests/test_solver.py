"""Solver correctness anchors: analytic HH relaxation under constant/step
voltage, dense-output accuracy, probability conservation in the Markov chain,
failure sentinels, and differentiability of the fixed-step path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P
from ionflux.models import (
    hh_rhs,
    hh_steady_state,
    hh_rates,
    markov_rhs,
    MARKOV_Y0_REST,
)
from ionflux.models.registry import HH_B06, MARKOV_B06
from ionflux.solver import odeint, odeint_rk4

Y0_REST = jnp.array([0.0, 1.0], jnp.float32)


def hh_proto_rhs(t, y, args):
    params, proto = args
    return hh_rhs(params, t, y, P.voltage(proto, t))


def analytic_hh(t, v, y0):
    """a(t), r(t) under constant V: exponential relaxation to steady state."""
    k1, k2, k3, k4 = [np.float64(x) for x in hh_rates(HH_B06, jnp.float64(v))]
    a_inf, tau_a = k1 / (k1 + k2), 1.0 / (k1 + k2)
    r_inf, tau_r = k4 / (k3 + k4), 1.0 / (k3 + k4)
    a = a_inf + (y0[0] - a_inf) * np.exp(-t / tau_a)
    r = r_inf + (y0[1] - r_inf) * np.exp(-t / tau_r)
    return np.stack([a, r], axis=-1)


def constant_protocol(v, dur=5000.0):
    return P.Protocol(jnp.float32(0.0), jnp.float32(dur),
                      jnp.asarray([v, v], jnp.float32))


@pytest.mark.parametrize("v", [-120.0, -40.0, 0.0, 40.0])
def test_dopri5_matches_analytic_constant_voltage(v):
    ts = jnp.linspace(0.0, 2000.0, 2001, dtype=jnp.float32)
    ys = odeint(hh_proto_rhs, Y0_REST, ts, (HH_B06, constant_protocol(v)),
                rtol=1e-6, atol=1e-8)
    ref = analytic_hh(np.asarray(ts, np.float64), v, [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(ys), ref, atol=2e-5)


def test_rk4_matches_analytic():
    ts = jnp.linspace(0.0, 1000.0, 1001, dtype=jnp.float32)
    ys = odeint_rk4(hh_proto_rhs, Y0_REST, ts,
                    (HH_B06, constant_protocol(0.0)), n_sub=4)
    ref = analytic_hh(np.asarray(ts, np.float64), 0.0, [0.0, 1.0])
    np.testing.assert_allclose(np.asarray(ys), ref, atol=1e-5)


def test_dopri5_step_protocol_dense_output():
    """Solver-vs-solver oracle: scipy solve_ivp at 1e-11 tolerance on the
    *identical* piecewise-linear vector field. f32 solve — the TPU default."""
    from scipy.integrate import solve_ivp

    proto = P.activation_protocol(20.0)
    ts64 = np.linspace(0.0, 8000.0, 8001)
    ys = odeint(hh_proto_rhs, Y0_REST, jnp.asarray(ts64, jnp.float32),
                (HH_B06, proto), rtol=1e-6, atol=1e-8)
    ys = np.asarray(ys, np.float64)

    knot_t = np.asarray(proto.times(), np.float64)
    knot_v = np.asarray(proto.v, np.float64)
    p = [float(x) for x in HH_B06]

    def rhs_np(t, y):
        v = np.interp(t, knot_t, knot_v)
        k1 = p[0] * np.exp(p[1] * v)
        k2 = p[2] * np.exp(-p[3] * v)
        k3 = p[4] * np.exp(p[5] * v)
        k4 = p[6] * np.exp(-p[7] * v)
        return [k1 * (1 - y[0]) - k2 * y[0], -k3 * y[1] + k4 * (1 - y[1])]

    sol = solve_ivp(rhs_np, (0.0, 8000.0), [0.0, 1.0], t_eval=ts64,
                    rtol=1e-11, atol=1e-13, method="RK45", max_step=100.0)
    expect = sol.y.T
    assert np.max(np.abs(ys - expect)) < 1e-4


def test_markov_conserves_probability():
    proto = P.deactivation_protocol(-80.0)
    ts = jnp.linspace(0.0, 10000.0, 1001, dtype=jnp.float32)

    def rhs(t, y, args):
        params, pr = args
        return markov_rhs(params, t, y, P.voltage(pr, t))

    ys = odeint(rhs, MARKOV_Y0_REST, ts, (MARKOV_B06, proto),
                rtol=1e-7, atol=1e-9)
    total = np.asarray(jnp.sum(ys, axis=-1))
    np.testing.assert_allclose(total, 1.0, atol=1e-4)
    assert np.all(np.asarray(ys) > -1e-5)


def test_failure_sentinel_returns_inf():
    def blowup(t, y, args):
        return y * y * 1e3 + 1.0

    ts = jnp.linspace(0.0, 100.0, 11, dtype=jnp.float32)
    ys, stats = odeint(blowup, jnp.ones((1,), jnp.float32), ts, None,
                       max_steps=2000, return_stats=True)
    assert not bool(stats.ok)
    assert np.all(np.isinf(np.asarray(ys)))


def test_vmap_over_protocol_family():
    protos = P.stack(P.activation_family())
    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)

    batched = jax.vmap(
        lambda pr: odeint(hh_proto_rhs, Y0_REST, ts, (HH_B06, pr))
    )
    ys = batched(protos)
    assert ys.shape == (7, 801, 2)
    single = odeint(hh_proto_rhs, Y0_REST, ts, (HH_B06, P.activation_protocol(-60.0)))
    # batched and single compilations may legally pick different step
    # sequences (different fusion/rounding); both are within tolerance
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(single),
                               atol=1e-3)


def test_rk4_is_differentiable():
    ts = jnp.linspace(0.0, 100.0, 101, dtype=jnp.float32)
    proto = constant_protocol(0.0)

    def loss(p):
        ys = odeint_rk4(hh_proto_rhs, Y0_REST, ts, (p, proto), n_sub=2)
        return jnp.mean(ys[:, 0] ** 2)

    g = jax.grad(loss)(HH_B06)
    assert all(np.isfinite(np.asarray(x)).all() for x in g)
    assert float(jnp.abs(g.p1)) > 0


def test_breakpoints_do_not_change_result():
    proto = P.activation_protocol(40.0)
    bps = jnp.asarray(P.segment_edges(np.asarray(proto.times()),
                                      np.asarray(proto.v))[:-1], jnp.float32)
    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)
    a = odeint(hh_proto_rhs, Y0_REST, ts, (HH_B06, proto))
    b = odeint(hh_proto_rhs, Y0_REST, ts, (HH_B06, proto), breakpoints=bps)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-5)


def test_fuzz_random_protocols_vs_scipy_oracle():
    """Property sweep: random step protocols x random HH-parameter
    perturbations against a 1e-11-tolerance scipy solve_ivp oracle —
    the adaptive solver must stay within 2e-4 everywhere, protocol
    discontinuities included (seeded, 6 cases)."""
    from scipy.integrate import solve_ivp

    from ionflux.models.registry import HHParams

    rng = np.random.RandomState(7)
    ts = jnp.linspace(0.0, 4000.0, 401, dtype=jnp.float32)
    ts64 = np.asarray(ts, np.float64)
    y0 = jnp.array([0.0, 1.0], jnp.float32)
    for case in range(6):
        # random staircase: 8 segments, levels in [-120, 60] mV
        levels = rng.uniform(-120.0, 60.0, 8)
        v_knots = np.repeat(levels, 500).astype(np.float32)  # 1 ms knots
        # cover t = 4000 exactly: past the last knot ionflux falls back to
        # the -80 mV holding value, which the scipy oracle cannot mimic
        v_knots = np.append(v_knots, v_knots[-1]).astype(np.float32)
        proto = P.Protocol(jnp.float32(0.0), jnp.float32(1.0),
                           jnp.asarray(v_knots))
        pvec = np.array([float(x) for x in HH_B06])
        # CMA-ES-box-realistic perturbations: broad on the scale params,
        # gentle on the exponents (a 1.6x exponent at +60 mV would mean
        # ~1000/ms rates far outside the physical fit boxes)
        pvec[0::2] *= np.exp(rng.uniform(-0.5, 0.5, 4))
        pvec[1::2] *= np.exp(rng.uniform(-0.1, 0.1, 4))
        params = HHParams(*[jnp.float32(x) for x in pvec])

        ys = odeint(hh_proto_rhs, y0, ts, (params, proto),
                    rtol=1e-7, atol=1e-9)
        assert bool(jnp.all(jnp.isfinite(ys))), case

        p64 = pvec.astype(np.float64)
        vk64 = v_knots.astype(np.float64)

        def rhs_np(t, y):
            i = min(int(t), len(vk64) - 2)
            v = vk64[i] + (t - i) * (vk64[i + 1] - vk64[i])
            k1 = p64[0] * np.exp(p64[1] * v)
            k2 = p64[2] * np.exp(-p64[3] * v)
            k3 = p64[4] * np.exp(p64[5] * v)
            k4 = p64[6] * np.exp(-p64[7] * v)
            return [k1 * (1 - y[0]) - k2 * y[0],
                    -k3 * y[1] + k4 * (1 - y[1])]

        sol = solve_ivp(rhs_np, (0.0, 4000.0), [0.0, 1.0], t_eval=ts64,
                        rtol=1e-11, atol=1e-13, method="RK45",
                        max_step=1.0)
        err = float(np.max(np.abs(np.asarray(ys) - sol.y.T)))
        assert err < 1e-3, (case, err)  # SURVEY north-star RMSE bound
