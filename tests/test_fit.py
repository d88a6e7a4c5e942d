"""Trainer, CMA-ES, checkpoint, and chained-solver tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.fit.cmaes import cmaes, fmin
from ionflux.fit.train import fit_chunk, fit_surface, init_opt_state, pretrain
from ionflux.models import hh_rhs, mlp_init, mlp_sizes, nn_surface
from ionflux.models.hh import a_gate_rhs
from ionflux.models.registry import HH_B06
from ionflux.solver import odeint, odeint_chained


def test_cmaes_converges_log_space():
    opt = np.array([3e-4, 5e-2, 1e-5, 7e-2])

    def batch(xs):
        return np.sum((np.log(xs) - np.log(opt)) ** 2, axis=1)

    res = cmaes(batch, opt * 3.0, 0.1 * opt * 3.0,
                bounds=(opt * 0.01, opt * 100.0), seed=1)
    np.testing.assert_allclose(res.x, opt, rtol=1e-4)


def test_cmaes_respects_bounds_and_inf():
    opt = np.array([1.0, 1.0])
    lo, hi = np.array([0.5, 0.5]), np.array([4.0, 4.0])

    calls = []

    def batch(xs):
        calls.append(xs.copy())
        out = np.sum((xs - opt) ** 2, axis=1)
        out[xs[:, 0] > 2.0] = np.inf  # simulated solver divergence
        return out

    res = cmaes(batch, np.array([1.5, 1.5]), 0.3, bounds=(lo, hi), seed=0,
                max_iterations=200)
    for xs in calls:
        assert np.all(xs >= lo - 1e-12) and np.all(xs <= hi + 1e-12)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=0.05)


def test_cmaes_onchip_converges_log_space():
    # the one-launch device loop must land where the host loop lands
    # (statistically — different RNGs), on the same d0-shaped log-space
    # objective with bounds
    from ionflux.fit.cmaes import cmaes_onchip

    opt = np.array([3e-4, 5e-2, 1e-5, 7e-2])

    def batch(xs):
        return jnp.sum((jnp.log(xs) - jnp.log(jnp.asarray(opt,
                        jnp.float32))) ** 2, axis=1)

    res = cmaes_onchip(batch, opt * 3.0, 0.1 * opt * 3.0,
                       bounds=(opt * 0.01, opt * 100.0), seed=1)
    np.testing.assert_allclose(res.x, opt, rtol=1e-3)
    assert res.iterations < 2000  # stopped on the unchanged rule
    assert res.evaluations == res.iterations * 8


def test_cmaes_onchip_inf_sentinels_and_bounds():
    # inf losses (diverged candidates) must be rejected by ranking, and the
    # rectangular boundaries must hold inside the jitted loop
    from ionflux.fit.cmaes import cmaes_onchip

    opt = jnp.array([1.0, 1.0], jnp.float32)
    lo, hi = np.array([0.5, 0.5]), np.array([4.0, 4.0])

    def batch(xs):
        out = jnp.sum((xs - opt) ** 2, axis=1)
        return jnp.where(xs[:, 0] > 2.0, jnp.inf, out)

    res = cmaes_onchip(batch, np.array([1.5, 1.5]), 0.3, bounds=(lo, hi),
                       seed=0, max_iterations=200)
    np.testing.assert_allclose(res.x, [1.0, 1.0], atol=0.05)
    assert np.all(res.x >= lo) and np.all(res.x <= hi)


def test_fmin_wrapper():
    x, fx = fmin(lambda z: float((z[0] - 2) ** 2 + (z[1] + 1) ** 2),
                 np.array([0.0, 0.0]), max_iter=300)
    np.testing.assert_allclose(x, [2.0, -1.0], atol=1e-2)


def test_fit_surface_reduces_loss_and_chunks_resume():
    key = jax.random.PRNGKey(0)
    net = mlp_init(key, mlp_sizes(1, 16), std=0.1)
    x = jax.random.normal(key, (256, 2)) * 0.3
    y = jnp.sin(x[:, 0]) * 1e-3

    res = fit_surface(net, x, y, iters=200, step_size=100)
    assert float(res.losses[-1]) < float(res.losses[0])

    # chunked == one-shot (same optimizer trajectory)
    st = init_opt_state(net, 1e-3, 100, 0.9)
    n1, st, l1 = fit_chunk(net, st, x, y, iters=100, step_size=100)
    n2, st, l2 = fit_chunk(n1, st, x, y, iters=100, step_size=100)
    np.testing.assert_allclose(np.concatenate([l1, l2]), res.losses,
                               rtol=1e-4)


def test_pretrain_matches_analytic_surface():
    key = jax.random.PRNGKey(0)
    net = mlp_init(key, mlp_sizes(2, 64), std=0.1)
    res = pretrain(net, HH_B06, kind="s", iters=600)
    v = jnp.linspace(-100.0, 40.0, 13)
    a = jnp.linspace(0.1, 0.9, 13)
    vv, aa = jnp.meshgrid(v, a)
    target = (HH_B06.p1 * jnp.exp(HH_B06.p2 * vv) * 0.9 * (1 - aa)
              - HH_B06.p3 * jnp.exp(-HH_B06.p4 * vv) * 1.1 * aa)
    pred = nn_surface(res.params, vv, aa)
    err = float(jnp.max(jnp.abs(pred - target)))
    assert err < 5e-3, err


def test_chained_equals_concat_solve():
    protos = P.stack([P.activation_protocol(0.0, dt_ms=1.0),
                      P.activation_protocol(40.0, dt_ms=1.0)])
    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)

    def rhs(t, y, a):
        params, pr = a
        return hh_rhs(params, t, y, P.voltage(pr, t))

    ys = odeint_chained(rhs, y0, ts, protos, HH_B06)
    assert ys.shape == (2, 801, 2)
    # second segment must start where the first ended
    one = odeint(rhs, y0, ts, (HH_B06, P.activation_protocol(0.0, dt_ms=1.0)))
    np.testing.assert_allclose(np.asarray(ys[0]), np.asarray(one), atol=1e-3)
    two = odeint(rhs, ys[0, -1], ts,
                 (HH_B06, P.activation_protocol(40.0, dt_ms=1.0)))
    np.testing.assert_allclose(np.asarray(ys[1]), np.asarray(two), atol=1e-3)


def test_checkpoint_roundtrip(tmp_path):
    from ionflux.utils.ckpt import load_checkpoint, save_checkpoint

    key = jax.random.PRNGKey(0)
    net = mlp_init(key, mlp_sizes(1, 8), std=0.1)
    st = init_opt_state(net)
    save_checkpoint(str(tmp_path), net, st, 400, [0.5, 0.2], suffix="-2",
                    is_best=True)
    net2, st2, epoch, loss = load_checkpoint(str(tmp_path), net, st,
                                             suffix="-2", best=True)
    assert epoch == 400 and loss == [0.5, 0.2]
    for (w1, b1), (w2, b2) in zip(net, net2):
        np.testing.assert_array_equal(np.asarray(w1), np.asarray(w2))


def test_cmaes_with_sharded_objective():
    """CMA-ES with the population distributed across the 8-device mesh —
    the TPU replacement for pints set_parallel(True)."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs the 8-device CPU mesh")
    from ionflux.fit.cmaes import shard_objective
    from ionflux.parallel import make_mesh

    mesh = make_mesh(8, ("pop",))
    opt = np.array([2e-4, 5e-2, 1e-5, 7e-2])

    def member(x):
        return jnp.sum((jnp.log(x) - jnp.log(jnp.asarray(opt, jnp.float32)))
                       ** 2)

    objective = shard_objective(mesh, member, popsize=8, n_params=4)
    res = cmaes(objective, opt * 2.0, 0.1 * opt * 2.0, popsize=8,
                bounds=(opt * 0.01, opt * 100.0), seed=0)
    np.testing.assert_allclose(res.x, opt, rtol=1e-3)


def test_shard_objective_batch_fn_matches_local():
    """The batch_fn (population-batched, odeint_batched-style) form of
    shard_objective must return exactly what the un-sharded batch evaluation
    returns — each device shard sees only its local lanes."""
    import jax as _jax

    if len(_jax.devices()) < 8:
        import pytest as _pytest

        _pytest.skip("needs the 8-device CPU mesh")
    from ionflux.fit.cmaes import shard_objective
    from ionflux.parallel import make_mesh

    mesh = make_mesh(8, ("pop",))

    def batch_fn(xs):  # [B, 4] -> [B]
        return jnp.sum(xs ** 2, axis=1) + 0.5 * xs[:, 0]

    objective = shard_objective(mesh, batch_fn=batch_fn, popsize=16,
                                n_params=4)
    xs = np.random.RandomState(0).randn(11, 4).astype(np.float32)
    got = objective(xs)
    want = np.asarray(batch_fn(jnp.asarray(xs)), np.float64)
    np.testing.assert_allclose(got, want, rtol=1e-6)
