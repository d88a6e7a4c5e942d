"""Jittable cubic spline vs scipy FITPACK (the reference's tool)."""

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import CubicSpline, UnivariateSpline

from ionflux.ops.spline import cubic_spline_m, spline_derivative, tridiag_solve


def test_tridiag_solve_matches_dense():
    rng = np.random.default_rng(0)
    n = 40
    dl = rng.uniform(0.5, 1.0, n)
    d = rng.uniform(3.0, 4.0, n)
    du = rng.uniform(0.5, 1.0, n)
    b = rng.normal(size=n)
    A = np.diag(d) + np.diag(dl[1:], -1) + np.diag(du[:-1], 1)
    x_ref = np.linalg.solve(A, b)
    x = tridiag_solve(jnp.asarray(dl), jnp.asarray(d), jnp.asarray(du),
                      jnp.asarray(b))
    np.testing.assert_allclose(np.asarray(x), x_ref, rtol=1e-5)


def test_spline_derivative_matches_fitpack():
    h = 0.25
    t = np.arange(80) * h
    y = np.sin(0.7 * t) + 0.3 * np.cos(2.1 * t)

    ours = np.asarray(spline_derivative(jnp.asarray(y), h))

    spl = UnivariateSpline(t, y, k=3)
    spl.set_smoothing_factor(0.0)  # the reference's s=0 refit
    ref = spl.derivative()(t)
    # boundary conditions may differ at the outermost knots
    np.testing.assert_allclose(ours[2:-2], ref[2:-2], atol=2e-4)

    cs = CubicSpline(t, y, bc_type="not-a-knot")
    np.testing.assert_allclose(ours, cs(t, 1), atol=1e-6)


def test_second_derivatives_not_a_knot():
    h = 0.5
    t = np.arange(30) * h
    y = t ** 3 - 2 * t ** 2 + t  # cubic: spline must be exact
    m = np.asarray(cubic_spline_m(jnp.asarray(y), h))
    np.testing.assert_allclose(m, 6 * t - 4, atol=1e-3)


def test_ondevice_surface_matches_scipy_path():
    import jax
    import jax.numpy as jnp

    from ionflux import protocols as P
    from ionflux.data import synth_study_currents
    from ionflux.models.registry import HH_B06, SYNTHETIC
    from ionflux.surface import (
        SurfaceConfig,
        estimate_gate_surface,
        estimate_gate_surface_ondevice,
    )

    t1 = jnp.linspace(0.0, 8000.0, 80001, dtype=jnp.float32)
    t2 = jnp.linspace(0.0, 10000.0, 100001, dtype=jnp.float32)
    act, _ = synth_study_currents(HH_B06, t1, t2)
    mask1, _ = P.s_study_masks()
    proto = P.activation_protocol(-60.0)
    cfg = SurfaceConfig()
    v1, a1, d1 = estimate_gate_surface(proto, t1, act[0], HH_B06, SYNTHETIC,
                                       mask1, cfg)
    v2, a2, d2 = estimate_gate_surface_ondevice(
        proto, t1, jnp.asarray(act[0], jnp.float32), HH_B06, SYNTHETIC,
        mask1, cfg)
    assert len(v1) == len(v2)
    assert np.sqrt(np.mean((a1 - a2) ** 2)) < 1e-6
    # spline boundary conditions + f32 differ at the ~0.3% level
    assert np.sqrt(np.mean((d1 - d2) ** 2)) < 5e-6
