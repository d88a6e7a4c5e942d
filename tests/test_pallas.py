"""Pallas fused-kernel tests (interpret mode — exact semantics on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P
from ionflux.models import hh_rhs, nnf_init, nnf_rhs
from ionflux.models.registry import HH_B06
from ionflux.solver import odeint


def test_fused_hh_rk4_matches_adaptive():
    from ionflux.ops.pallas_rk4 import fused_hh_rk4

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    pop = np.stack([np.array([float(x) for x in HH_B06]) * (1.0 + 0.05 * i)
                    for i in range(4)])
    ys = fused_hh_rk4(jnp.asarray(pop, jnp.float32), proto.v,
                      proto_dt=1.0, dt_out=10.0, n_out=801, n_sub=10,
                      interpret=True)
    assert ys.shape == (4, 801, 2)

    ts = jnp.linspace(0.0, 8000.0, 801, dtype=jnp.float32)
    y0 = jnp.array([0.0, 1.0], jnp.float32)

    def rhs(t, y, a):
        return hh_rhs(a[0], t, y, P.voltage(a[1], t))

    from ionflux.models.registry import HHParams

    for m in range(4):
        params = HHParams(*[jnp.float32(x) for x in pop[m]])
        ref = odeint(rhs, y0, ts, (params, proto), rtol=1e-7, atol=1e-9)
        err = float(jnp.max(jnp.abs(ys[m] - ref)))
        assert err < 2e-3, (m, err)


def test_fused_nnf_adaptive_solve_matches_xla():
    from ionflux.ops.pallas_solve import fused_nnf_solve

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    ys = fused_nnf_solve(params.net, HH_B06, protos.v, ts, proto_dt=1.0,
                         max_rec=4096, interpret=True)
    assert bool(jnp.all(jnp.isfinite(ys)))

    def rhs(t, y, a):
        return nnf_rhs(a[0], t, y, P.voltage(a[1], t))

    y0 = jnp.array([0.0, 1.0], jnp.float32)
    ref = jax.vmap(lambda pr: odeint(rhs, y0, ts, (params, pr),
                                     rtol=1e-5, atol=1e-7))(protos)
    # shared lockstep controller picks different steps; both within tolerance
    assert float(jnp.max(jnp.abs(ys - ref))) < 2e-2


def test_fused_nnf_fixed_trip_solve_matches_xla():
    """The branchless fixed-trip variant (masked-accept fori blocks with a
    coarse early-exit while): same adaptive semantics, Mosaic-pipelineable
    body (ROADMAP 'branchless fixed-trip design')."""
    from ionflux.ops.pallas_solve import fused_nnf_solve_ft

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    ys = fused_nnf_solve_ft(params.net, HH_B06, protos.v, ts, proto_dt=1.0,
                            trips=2048, interpret=True)
    assert bool(jnp.all(jnp.isfinite(ys)))

    def rhs(t, y, a):
        return nnf_rhs(a[0], t, y, P.voltage(a[1], t))

    y0 = jnp.array([0.0, 1.0], jnp.float32)
    ref = jax.vmap(lambda pr: odeint(rhs, y0, ts, (params, pr),
                                     rtol=1e-5, atol=1e-7))(protos)
    assert float(jnp.max(jnp.abs(ys - ref))) < 2e-2


def test_fused_nnf_fixed_trip_insufficient_trips_sentinel():
    """When the trip capacity is below the adaptive attempt count the solve
    must report failure as inf output, not silently truncate."""
    from ionflux.ops.pallas_solve import fused_nnf_solve_ft

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    ys = fused_nnf_solve_ft(params.net, HH_B06, protos.v, ts, proto_dt=1.0,
                            trips=256, interpret=True)
    assert not bool(jnp.isfinite(ys).all())


def test_fused_sweep_chained_scan_matches_single_launches():
    """Chained dispatch (bench round 5 / the score-K-checkpoints replay):
    K sweep launches inside one lax.scan must return exactly the
    single-launch results per step — the record streams are consumed
    inside the scan body, the shape that needed the kernel's scoped-VMEM
    cap raised on chip."""
    from ionflux.ops.pallas_solve import fused_nnf_solve_ft

    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    base = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    k = 2
    stacked = jax.tree.map(
        lambda x: jnp.stack([x * (1.0 + 1e-3 * (kk + 1))
                             for kk in range(k)]), list(base.net))

    def _ck(carry, net_k):
        ys = fused_nnf_solve_ft([(w, b) for w, b in net_k], HH_B06,
                                protos.v, ts, proto_dt=1.0, trips=2048,
                                t_end=8000.0, interpret=True)
        return carry, ys

    _, chained = jax.lax.scan(_ck, jnp.float32(0.0), stacked)
    assert bool(jnp.all(jnp.isfinite(chained)))
    for kk in range(k):
        net_k = jax.tree.map(lambda x: x[kk], stacked)
        single = fused_nnf_solve_ft([(w, b) for w, b in net_k], HH_B06,
                                    protos.v, ts, proto_dt=1.0, trips=2048,
                                    interpret=True)
        np.testing.assert_allclose(np.asarray(chained[kk]),
                                   np.asarray(single), atol=1e-6)


def test_fused_nnf_pop_solve_matches_batched_lockstep():
    """Per-lane-weights fixed-trip kernel (the CMA-ES/population workload:
    B member nets, one shared protocol) vs the XLA batched-lane solver."""
    from ionflux.models.registry import NETSCALE, VRANGE
    from ionflux.ops.pallas_solve import fused_nnf_pop_solve_ft
    from ionflux.solver import odeint_batched

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    pop_net = jax.vmap(
        lambda k: nnf_init(k, HH_B06, n_layers=1, n_nodes=16).net)(keys)
    nets = [(w, b) for w, b in pop_net]
    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    ys = fused_nnf_pop_solve_ft(nets, HH_B06, proto.v, ts, proto_dt=1.0,
                                trips=2048, interpret=True)
    assert bool(jnp.all(jnp.isfinite(ys)))

    def rhs(t, y, args):
        nets_, pr = args
        v = P.voltage(pr, t)
        h = jnp.stack([jnp.full((y.shape[0],), v / VRANGE), y[:, 0]],
                      axis=-1)
        for wi, (w, bb) in enumerate(nets_):
            h = jnp.einsum("bi,bio->bo", h, w) + bb
            if wi < len(nets_) - 1:
                h = jnp.where(h >= 0, h, 0.01 * h)
        dadt = h[:, 0] / NETSCALE
        k3 = HH_B06.p5 * jnp.exp(HH_B06.p6 * v)
        k4 = HH_B06.p7 * jnp.exp(-HH_B06.p8 * v)
        drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (4, 1))
    ref = odeint_batched(rhs, y0b, ts, (pop_net, proto),
                         rtol=1e-5, atol=1e-7)
    assert float(jnp.max(jnp.abs(ys - ref))) < 5e-3


def test_fused_fixed_trip_solve_nnd_family():
    """NN-d mode of the fixed-trip kernel: MLP as additive correction to
    the analytic a-gate (base_hh), matching the XLA NN-d solve."""
    from ionflux.eval import simulate_family
    from ionflux.models import nnd_init
    from ionflux.models.registry import SYNTHETIC

    params = nnd_init(jax.random.PRNGKey(3), HH_B06, n_layers=1, n_nodes=16,
                      std=0.05)
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 20.0)]
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    ip = simulate_family("nnd", params, protos, ts, SYNTHETIC,
                         backend="pallas", trips=2048, interpret=True)
    ix = simulate_family("nnd", params, protos, ts, SYNTHETIC)
    assert bool(jnp.all(jnp.isfinite(ip)))
    assert float(jnp.max(jnp.abs(ip - ix))) < 5e-3


def test_fused_nnf_popsweep_solve_matches_batched_lockstep():
    """Population x protocol-sweep kernel (P member nets x Q protocols,
    protocol rows riding the MXU M dimension) vs the XLA batched-lane
    solver on the flattened (member, protocol) cross product."""
    from ionflux.models.registry import NETSCALE, VRANGE
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft
    from ionflux.solver import odeint_batched

    p_mem, q = 3, 2
    keys = jax.random.split(jax.random.PRNGKey(1), p_mem)
    pop_net = jax.vmap(
        lambda k: nnf_init(k, HH_B06, n_layers=1, n_nodes=16).net)(keys)
    nets = [(w, b) for w, b in pop_net]
    levels = (-40.0, 20.0)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0) for v in levels])
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    ys = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts,
                                     proto_dt=1.0, trips=2048,
                                     interpret=True)
    assert ys.shape == (p_mem, q, 161, 2)
    assert bool(jnp.all(jnp.isfinite(ys)))

    def rhs(t, y, args):
        nets_, prs = args
        v = jax.vmap(lambda vv, tt0, dd: P.voltage(
            P.Protocol(t0=tt0, dt=dd, v=vv), t))(prs.v, prs.t0, prs.dt)
        h = jnp.stack([v / VRANGE, y[:, 0]], axis=-1)
        for wi, (w, bb) in enumerate(nets_):
            h = jnp.einsum("bi,bio->bo", h, w) + bb
            if wi < len(nets_) - 1:
                h = jnp.where(h >= 0, h, 0.01 * h)
        dadt = h[:, 0] / NETSCALE
        k3 = HH_B06.p5 * jnp.exp(HH_B06.p6 * v)
        k4 = HH_B06.p7 * jnp.exp(-HH_B06.p8 * v)
        drdt = -k3 * y[:, 1] + k4 * (1.0 - y[:, 1])
        return jnp.stack([dadt, drdt], axis=-1)

    flat_nets = [(jnp.repeat(w, q, axis=0), jnp.repeat(b, q, axis=0))
                 for w, b in nets]
    protos_flat = P.stack([P.activation_protocol(v, dt_ms=1.0)
                           for v in levels] * p_mem)
    y0b = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (p_mem * q, 1))
    ref = odeint_batched(rhs, y0b, ts, (flat_nets, protos_flat),
                         rtol=1e-5, atol=1e-7)
    ref = ref.reshape(p_mem, q, *ref.shape[1:])
    assert float(jnp.max(jnp.abs(ys - ref))) < 5e-3


def test_fused_nnd_popsweep_solve_family():
    """NN-d mode of the popsweep kernel: additive correction to the
    analytic a-gate, one member vs the XLA NN-d family solve."""
    from ionflux.eval import simulate_family
    from ionflux.models import nnd_init
    from ionflux.models.registry import SYNTHETIC
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft
    from ionflux.observe import gate_current

    params = nnd_init(jax.random.PRNGKey(3), HH_B06, n_layers=1, n_nodes=16,
                      std=0.05)
    levels = (-40.0, 20.0)
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in levels]
    stacked = P.stack(protos)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    nets1 = [(w[None], b[None]) for w, b in params.net]   # P=1 member
    ys = fused_nnf_popsweep_solve_ft(nets1, params.hh, stacked.v, ts,
                                     proto_dt=1.0, trips=2048,
                                     base_hh=params.hh, interpret=True)
    i_pal = jnp.stack([
        gate_current(ys[0, j], P.voltage(protos[j], ts), SYNTHETIC)
        for j in range(len(protos))])
    i_ref = simulate_family("nnd", params, protos, ts, SYNTHETIC)
    assert bool(jnp.all(jnp.isfinite(i_pal)))
    assert float(jnp.max(jnp.abs(i_pal - i_ref))) < 5e-3


def test_simulate_population_matches_family():
    """eval.simulate_population (popsweep kernel) == per-member
    simulate_family currents."""
    from ionflux.eval import simulate_family, simulate_population
    from ionflux.models.registry import SYNTHETIC

    p_mem = 2
    keys = jax.random.split(jax.random.PRNGKey(5), p_mem)
    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(keys)
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 20.0)]
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    i_pop = simulate_population("nnf", pop, protos, ts, SYNTHETIC,
                                trips=2048, interpret=True)
    assert i_pop.shape == (p_mem, len(protos), 161)
    for m in range(p_mem):
        member = jax.tree.map(lambda x: x[m], pop)
        i_ref = simulate_family("nnf", member, protos, ts, SYNTHETIC)
        assert float(jnp.max(jnp.abs(i_pop[m] - i_ref))) < 5e-3


def test_popsweep_fold_bias_q16_parity():
    """q > 8 launches fold the per-layer biases into the matmuls as
    augmented ones-column weight rows (the [P, 1, m] bias-broadcast
    sublane pattern hard-faults Mosaic past one 8-sublane tile —
    'limits[i] <= dim(i) (2 vs. 1)', round-4 bisect).  The folded path
    must match the unchanged q<=8 path to solver tolerance (exact-math
    identical; f32 accumulation-order deltas walk through the adaptive
    controller's accept decisions).  Chip-verified round 4: Q=8/16/32 ->
    731/1555/2391 solves/s, parity 2.1e-4."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    p_mem = 2
    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(5), p_mem))
    nets = [(w, b) for w, b in pop.net]
    protos = [P.activation_protocol(v, dt_ms=1.0)
              for v in np.linspace(-40.0, 50.0, 12)]
    ts = jnp.linspace(0.0, 8000.0, 81, jnp.float32)

    ys16 = fused_nnf_popsweep_solve_ft(nets, HH_B06, P.stack(protos).v,
                                       ts, proto_dt=1.0, trips=2048,
                                       interpret=True)
    ys_a = fused_nnf_popsweep_solve_ft(nets, HH_B06,
                                       P.stack(protos[:8]).v, ts,
                                       proto_dt=1.0, trips=2048,
                                       interpret=True)
    ys_b = fused_nnf_popsweep_solve_ft(nets, HH_B06,
                                       P.stack(protos[8:]).v, ts,
                                       proto_dt=1.0, trips=2048,
                                       interpret=True)
    ref = jnp.concatenate([ys_a, ys_b], axis=1)
    assert bool(jnp.all(jnp.isfinite(ys16)))
    assert float(jnp.max(jnp.abs(ys16 - ref))) < 5e-3


def test_popsweep_q_split_trip_body_parity():
    """q_split > 1 chunks the trip body's RK stage chain over Q (the
    two-pass working-set split for configs past the single-pass
    scoped-VMEM wall, ROADMAP round 5).  The stage math is independent
    per (member, protocol) lane and the shared-accept max reduces the
    concatenated chunks exactly as the single-pass body does, so
    q_split=2 must be BIT-exact vs q_split=1 (qc=1 chunks may differ at
    f32 rounding level if the backend reorders tiny-M dot reductions —
    held to solver tolerance)."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    p_mem = 3
    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16).net)(
        jax.random.split(jax.random.PRNGKey(1), p_mem))
    nets = [(w, b) for w, b in pop]
    levels = (-40.0, 20.0, 0.0, -20.0)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in levels])
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    kw = dict(proto_dt=1.0, trips=2048, interpret=True)
    ys1 = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts, **kw)
    ys2 = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts,
                                      q_split=2, **kw)
    ys4 = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts,
                                      q_split=4, **kw)
    assert bool(jnp.all(jnp.isfinite(ys1)))
    assert float(jnp.max(jnp.abs(ys2 - ys1))) == 0.0
    assert float(jnp.max(jnp.abs(ys4 - ys1))) < 5e-3


def test_popsweep_q_row_guard_and_split():
    """The kernel refuses protocol families past POPSWEEP_MAX_ROWS with a
    clear error (the old q<=8 ceiling — a Mosaic bias-broadcast fault —
    was bisected and fixed in round 4 via fold_bias), and
    eval.simulate_population splits bigger families into
    POPSWEEP_SPLIT_ROWS-row launches."""
    import pytest as _pytest

    from ionflux.eval import simulate_population
    from ionflux.models.registry import SYNTHETIC
    from ionflux.ops.pallas_solve import (POPSWEEP_MAX_ROWS,
                                          POPSWEEP_SPLIT_ROWS,
                                          fused_nnf_popsweep_solve_ft)

    p_mem = 2
    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(5), p_mem))
    n_q = POPSWEEP_SPLIT_ROWS + 4
    protos = [P.activation_protocol(v, dt_ms=1.0)
              for v in np.linspace(-40.0, 50.0, n_q)]
    ts = jnp.linspace(0.0, 8000.0, 81, jnp.float32)

    # the guard raises BEFORE any lowering (so it fires on any backend)
    big = P.stack([protos[0]] * (POPSWEEP_MAX_ROWS + 1))
    with _pytest.raises(ValueError, match="at most"):
        fused_nnf_popsweep_solve_ft([(w, b) for w, b in pop.net], HH_B06,
                                    big.v, ts, proto_dt=1.0, trips=256)

    # the split path: [P, n_q, T], groups bit-identical to direct launches
    i_pop = simulate_population("nnf", pop, protos, ts, SYNTHETIC,
                                trips=2048, interpret=True)
    assert i_pop.shape == (p_mem, n_q, 81)
    i_tail = simulate_population("nnf", pop,
                                 protos[POPSWEEP_SPLIT_ROWS:], ts,
                                 SYNTHETIC, trips=2048, interpret=True)
    assert bool(jnp.all(i_pop[:, POPSWEEP_SPLIT_ROWS:] == i_tail))
    assert bool(jnp.all(jnp.isfinite(i_pop)))


def test_popsweep_mxu_bf16_storage():
    """mxu_bf16 stores the member weights in bf16 (half the resident
    bytes).  On the CPU/interpret backend — where f32 dots are genuine
    f32 — the truncation shifts currents by O(2^-8) relative, so the two
    paths must differ but stay close; on the TPU backend they are
    bit-identical (DEFAULT matmul precision already truncates to bf16 —
    chip-verified in round 4, see the kernel docstring)."""
    from ionflux.eval import simulate_population
    from ionflux.models.registry import SYNTHETIC

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(0), 3))
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 40.0)]
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    i32 = simulate_population("nnf", pop, protos, ts, SYNTHETIC,
                              trips=2048, interpret=True)
    ib = simulate_population("nnf", pop, protos, ts, SYNTHETIC,
                             trips=2048, interpret=True, mxu_bf16=True)
    assert bool(jnp.all(jnp.isfinite(ib)))
    dev = float(jnp.max(jnp.abs(i32 - ib)))
    rng = float(jnp.max(jnp.abs(i32)))
    assert 0.0 < dev < 0.02 * rng


def test_popsweep_per_lane_death():
    """A divergent member must not poison the launch (batched.py per-lane
    death semantics): its rows evaluate to inf, survivors stay accurate."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(1), 3))
    nets = [(w.at[1].mul(1e6), b) for w, b in pop.net]   # member 1 blows up
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 81, jnp.float32)
    ys = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts,
                                     proto_dt=1.0, trips=2048,
                                     interpret=True)
    assert bool(jnp.all(jnp.isinf(ys[1])))
    clean = fused_nnf_popsweep_solve_ft(
        [(w, b) for w, b in pop.net], HH_B06, protos.v, ts, proto_dt=1.0,
        trips=2048, interpret=True)
    for m in (0, 2):
        assert bool(jnp.all(jnp.isfinite(ys[m])))
        assert float(jnp.max(jnp.abs(ys[m] - clean[m]))) < 1e-2


def test_popsweep_chained_matches_single_launch():
    """fused_nnf_popsweep_chained (local per-segment clocks, y0 carried
    across launches — the long-recording path) == one launch over the
    same span; segment boundaries need not align with sweep boundaries."""
    import numpy as np

    from ionflux.ops.pallas_solve import (fused_nnf_popsweep_chained,
                                          fused_nnf_popsweep_solve_ft)

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(1), 2))
    nets = [(w, b) for w, b in pop.net]
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    v = np.asarray(protos.v)
    seg = 4000    # splits mid-sweep: 999/5999/6999/7499 ms jumps
    pad = np.concatenate([v, v[:, -1:]], axis=1)
    seg_v = np.stack([pad[:, b * seg:b * seg + seg + 1] for b in range(2)])
    ts_loc = jnp.linspace(0.0, 4000.0, 81, jnp.float32)
    ys_c, y_fin = fused_nnf_popsweep_chained(
        nets, HH_B06, jnp.asarray(seg_v), proto_dt=1.0, t_end=4000.0,
        trips=2048, interpret=True, ts=ts_loc)
    assert ys_c.shape == (2, 2, 2, 81, 2)
    assert bool(jnp.all(jnp.isfinite(ys_c))) and y_fin.shape == (2, 2, 2)
    for b, t0 in enumerate((0.0, 4000.0)):
        ref = fused_nnf_popsweep_solve_ft(
            nets, HH_B06, protos.v, t0 + ts_loc, proto_dt=1.0,
            trips=2048, interpret=True)
        assert float(jnp.max(jnp.abs(ys_c[b] - ref))) < 1e-3


def test_popsweep_odd_q_padding():
    """Q not a power of two pads the protocol rows (Mosaic hard-faults on
    2Q sublane dims like 6) and slices back: Q=3 == the Q=2 rows plus the
    extra level, each matching the per-member family solve."""
    from ionflux.eval import simulate_family, simulate_population
    from ionflux.models.registry import SYNTHETIC

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(7), 2))
    levels = (-40.0, 0.0, 20.0)
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in levels]
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    i_pop = simulate_population("nnf", pop, protos, ts, SYNTHETIC,
                                trips=2048, interpret=True)
    assert i_pop.shape == (2, 3, 161)
    member = jax.tree.map(lambda x: x[0], pop)
    i_ref = simulate_family("nnf", member, protos, ts, SYNTHETIC)
    assert bool(jnp.all(jnp.isfinite(i_pop)))
    assert float(jnp.max(jnp.abs(i_pop[0] - i_ref))) < 5e-3


def test_popsweep_pace_cull_reaps_grinder():
    """A stiff-but-solvable member (da/dt = -K(a-0.5), K=1e3/ms: the
    controller happily accepts ~3e-3 ms steps forever) must not exhaust
    the shared trip budget for everyone: once the launch projects a
    shortfall, the pace cull kills it (score inf — the single path's
    max_steps verdict) and the healthy members complete accurately."""
    import numpy as np

    from ionflux.models.registry import NETSCALE
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(1), 3))
    # member 1 -> hidden0 = a (LeakyReLU passthrough for a>=0),
    # out = -K*NETSCALE*a + 0.5*K*NETSCALE => dadt = -K(a - 0.5)
    K = 1e3
    w0 = np.zeros((2, 16), np.float32); w0[1, 0] = 1.0
    w1 = np.zeros((16, 1), np.float32); w1[0, 0] = -K * NETSCALE
    nets = []
    for li, (w, b) in enumerate(pop.net):
        w = w.at[1].set(jnp.asarray(w0 if li == 0 else w1))
        b = b.at[1].set(0.0 if li == 0 else 0.5 * K * NETSCALE)
        nets.append((w, b))
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 81, jnp.float32)
    ys = fused_nnf_popsweep_solve_ft(nets, HH_B06, protos.v, ts,
                                     proto_dt=1.0, trips=2048,
                                     interpret=True)
    assert bool(jnp.all(jnp.isinf(ys[1])))          # grinder culled
    clean = fused_nnf_popsweep_solve_ft(
        [(w, b) for w, b in pop.net], HH_B06, protos.v, ts, proto_dt=1.0,
        trips=2048, interpret=True)
    for m in (0, 2):
        assert bool(jnp.all(jnp.isfinite(ys[m])))
        assert float(jnp.max(jnp.abs(ys[m] - clean[m]))) < 1e-2


def test_simulate_population_real_standin_segmentation():
    """The host-side segmentation/padding/chunk-assembly of
    eval.simulate_population_real on tiny stand-in recordings of UNEQUAL
    length (interpret mode): every 1 ms sample of each protocol's own
    length must match the XLA chained-free single solve, and the shorter
    protocol must be sliced back exactly."""
    from ionflux.eval import simulate_population_real
    from ionflux.models.registry import SYNTHETIC
    from ionflux.observe import gate_current

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(1), 2))
    pa = P.activation_protocol(20.0, dt_ms=1.0)
    pb = P.activation_protocol(-30.0, dt_ms=1.0)
    volts = {"a": (np.asarray(pa.v)[:6001], 1.0),
             "b": (np.asarray(pb.v)[:3501], 1.0)}
    cur = simulate_population_real(
        "nnf", pop, ["a", "b"], SYNTHETIC, trips=1024, seg_samples=2048,
        chunk=512, interpret=True, voltages=volts)
    assert cur["a"].shape == (2, 6001) and cur["b"].shape == (2, 3501)

    def rhs(t, y, a):
        return nnf_rhs(a[0], t, y, P.voltage(a[1], t))

    y0 = jnp.array([0.0, 1.0], jnp.float32)
    single = jax.tree.map(lambda x: x[0], pop)
    for n, proto, ln in (("a", pa, 6001), ("b", pb, 3501)):
        ts = jnp.arange(ln, dtype=jnp.float32)
        ys = odeint(rhs, y0, ts, (single, proto), rtol=1e-5, atol=1e-7)
        i_ref = np.asarray(gate_current(ys, P.voltage(proto, ts),
                                        SYNTHETIC))
        err = float(np.max(np.abs(cur[n][0] - i_ref)))
        assert err < 2e-2 * (i_ref.max() - i_ref.min()), (n, err)


def test_population_rollout_maes_matches_host_reduction():
    """The device-resident validation scoring (eval.population_rollout_maes
    — solve + |pred-truth| reduce in one dispatch per segment, [P, Q]
    fetch at the end) must reproduce the host reduction over
    simulate_population_real's full currents: same chained integration,
    unequal protocol lengths, a pr4-style scoring span, and the
    chunk-padding tail must not double-count across segment boundaries."""
    from ionflux.eval import population_rollout_maes, simulate_population_real
    from ionflux.models.registry import SYNTHETIC

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(1), 2))
    pa = P.activation_protocol(20.0, dt_ms=1.0)
    pb = P.activation_protocol(-30.0, dt_ms=1.0)
    volts = {"a": (np.asarray(pa.v)[:6001], 1.0),
             "b": (np.asarray(pb.v)[:3501], 1.0)}
    kw = dict(trips=1024, seg_samples=2048, chunk=512, interpret=True,
              voltages=volts)
    cur = simulate_population_real("nnf", pop, ["a", "b"], SYNTHETIC, **kw)
    rng = np.random.default_rng(0)
    truth = {n: cur[n][0] + 0.01 * rng.standard_normal(cur[n].shape[1])
             for n in ("a", "b")}
    spans = {"b": (500, 3000)}
    want = np.stack([
        np.stack([np.mean(np.abs(cur["a"][m] - truth["a"])),
                  np.mean(np.abs(cur["b"][m, 500:3000]
                                 - truth["b"][500:3000]))])
        for m in range(2)])
    got = population_rollout_maes("nnf", pop, ["a", "b"], SYNTHETIC,
                                  truth, spans=spans, **kw)
    assert got.shape == (2, 2)
    assert np.allclose(got, want, rtol=2e-4, atol=1e-6), (got, want)


def test_popsweep_return_records_n_valid_under_jit():
    """The bench roofline pulls the executed-trip count through
    jit(... return_records=True).n_valid (bench.measure_pallas_popsweep) —
    guard that plumbing in interpret mode before it runs on chip."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    pop_net = jax.vmap(
        lambda k: nnf_init(k, HH_B06, n_layers=1, n_nodes=16).net)(keys)
    protos = P.stack([P.activation_protocol(v, dt_ms=1.0)
                      for v in (-40.0, 20.0)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)

    def stats(ns):
        recs = fused_nnf_popsweep_solve_ft(
            [(w, b) for w, b in ns], HH_B06, protos.v, ts, proto_dt=1.0,
            trips=2048, t_end=8000.0, return_records=True,
            interpret=True)
        return recs.n_valid, recs.n_acc

    n_valid, n_acc = jax.jit(stats)(pop_net)
    n_valid, n_acc = int(n_valid), int(n_acc)
    # executed trips come in whole blocks and bound the accepted count
    assert n_valid % 32 == 0 and 0 < n_valid <= 2048
    assert 0 < n_acc <= n_valid


def test_fused_fixed_trip_per_lane_death_sweep():
    """Per-lane death in the protocol-sweep kernel (round 4, ADVICE r3 #2):
    one divergent protocol row must return inf for ITS row only, and the
    healthy rows must still match the all-healthy solve."""
    from ionflux.ops.pallas_solve import fused_nnf_solve_ft

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    good = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 20.0)]
    protos_ok = P.stack(good)
    # a NaN-knot protocol row: its RHS is non-finite at rest, so the lane
    # is dead from trip 0 (the alive0 path).  In-loop death via a pinned
    # step is covered by the pop-kernel test below — for a PROTOCOL-driven
    # failure it is unreachable by design: an adaptive controller crawls
    # up to a forcing wall with ever-passing micro-steps (the f32 clock
    # ulp keeps t this side of the wall) exactly like the single-lane
    # solver would, and the family fails on the trips budget instead.
    bad_v = jnp.full_like(good[0].v, jnp.nan)
    protos = P.stack(good + [P.Protocol(good[0].t0, good[0].dt, bad_v)])
    ts = jnp.linspace(0.0, 8000.0, 161, dtype=jnp.float32)
    ys = fused_nnf_solve_ft(params.net, HH_B06, protos.v, ts, proto_dt=1.0,
                            trips=2048, interpret=True)
    assert not bool(jnp.any(jnp.isfinite(ys[2])))         # dead lane: inf
    assert bool(jnp.all(jnp.isfinite(ys[:2])))            # others: finite
    ref = fused_nnf_solve_ft(params.net, HH_B06, protos_ok.v, ts,
                             proto_dt=1.0, trips=2048, interpret=True)
    assert float(jnp.max(jnp.abs(ys[:2] - ref))) < 2e-2


def test_fused_fixed_trip_per_lane_death_pop():
    """Per-lane death in the per-lane-weights population kernel: one
    divergent candidate net scores inf alone; the rest of the generation
    keeps its ranking information (batched.py per-lane semantics)."""
    from ionflux.ops.pallas_solve import fused_nnf_pop_solve_ft

    keys = jax.random.split(jax.random.PRNGKey(1), 4)
    pop_net = jax.vmap(
        lambda k: nnf_init(k, HH_B06, n_layers=1, n_nodes=16).net)(keys)
    nets_ok = [(w, b) for w, b in pop_net]
    # member 1's output layer scaled 1e6: da/dt ~ 1e4/ms blows the a-gate
    # up until the lane grinds at the minimum step and dies
    nets_bad = [
        (w.at[1].mul(1e6 if li == len(nets_ok) - 1 else 1.0), b)
        for li, (w, b) in enumerate(nets_ok)]
    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    ys = fused_nnf_pop_solve_ft(nets_bad, HH_B06, proto.v, ts, proto_dt=1.0,
                                trips=2048, interpret=True)
    assert not bool(jnp.any(jnp.isfinite(ys[1])))         # dead member: inf
    ok_rows = jnp.array([0, 2, 3])
    assert bool(jnp.all(jnp.isfinite(ys[ok_rows])))
    ref = fused_nnf_pop_solve_ft(nets_ok, HH_B06, proto.v, ts, proto_dt=1.0,
                                 trips=2048, interpret=True)
    assert float(jnp.max(jnp.abs(ys[ok_rows] - ref[ok_rows]))) < 5e-3


def test_fused_fixed_trip_sweep_over_128_guard_and_split():
    """B>128 protocol rows: the kernel refuses with a clear error and
    simulate_family auto-splits (mirrors the popsweep Q>8 guard)."""
    from ionflux.eval import simulate_family
    from ionflux.models.registry import SYNTHETIC
    from ionflux.ops.pallas_solve import fused_nnf_solve_ft

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    protos = [P.activation_protocol(-40.0 + 0.5 * i, dt_ms=1.0)
              for i in range(130)]
    ts = jnp.linspace(0.0, 8000.0, 41, dtype=jnp.float32)
    with pytest.raises(ValueError, match="128-lane tile"):
        fused_nnf_solve_ft(params.net, HH_B06, P.stack(protos).v, ts,
                           proto_dt=1.0, trips=2048, interpret=True)
    i_all = simulate_family("nnf", params, protos, ts, SYNTHETIC,
                            backend="pallas", trips=2048, interpret=True)
    assert i_all.shape == (130, 41)
    i_two = simulate_family("nnf", params, [protos[0], protos[-1]], ts,
                            SYNTHETIC, backend="pallas", trips=2048,
                            interpret=True)
    # cross-controller comparison (65- vs 2-lane launches step differently);
    # both within solve tolerance, same bound as the adaptive-vs-xla tests
    assert float(jnp.max(jnp.abs(i_all[jnp.array([0, 129])] - i_two))) < 2e-2


def test_fused_hh_pop_solve_adaptive():
    """The per-lane-params adaptive HH kernel (fused_hh_pop_solve_ft —
    the d0/r0 CMA-ES objective shape): parity vs the batched adaptive
    oracle; a stiff candidate (bounded gates cannot blow up, so wild
    CMA-ES params manifest as controller-pinning stiffness) is
    pace-culled ALONE with survivors unperturbed; a NaN y0 carry keeps
    its lane dead (chained-sweep deadness propagation).  Chip-measured
    round 4: 2,732 sweep-solves/s at B=128 on a Pr3 sweep (1.5x the
    64-lane lockstep synced, ~3x per-solve net of dispatch RTT)."""
    from ionflux.models.registry import HHParams
    from ionflux.ops.pallas_solve import fused_hh_pop_solve_ft
    from ionflux.solver.batched import odeint_batched

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    b = 4
    base = np.array([float(getattr(HH_B06, f"p{i}")) for i in range(1, 9)])
    pop = jnp.asarray(base[None] * np.exp(
        0.1 * np.random.RandomState(0).randn(b, 8)), jnp.float32)

    ys = fused_hh_pop_solve_ft(pop, proto.v, ts, proto_dt=1.0,
                               trips=2048, interpret=True)

    def rhs_pop(t, y, args):
        xs, pr = args
        v = P.voltage(pr, t)
        return jax.vmap(
            lambda p, yy: hh_rhs(HHParams(*p), t, yy, v))(xs, y)

    y0 = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    ref = odeint_batched(rhs_pop, y0, ts, (pop, proto), rtol=1e-6,
                         atol=1e-8, buffer_size=4096, max_steps=100_000)
    assert float(jnp.max(jnp.abs(ys - ref))) < 2e-3

    # stiff poison: p2 = 1.0 -> k1 ~ exp(20) at +20 mV pins the shared
    # controller's step; the pace-cull must reap lane 1 alone
    bad = pop.at[1, 1].set(1.0)
    ys2 = fused_hh_pop_solve_ft(bad, proto.v, ts, proto_dt=1.0,
                                trips=2048, interpret=True)
    fin = jnp.isfinite(ys2).all(axis=(1, 2))
    assert list(np.asarray(fin)) == [True, False, True, True]
    keep = jnp.asarray([0, 2, 3])
    assert float(jnp.max(jnp.abs(ys2[keep] - ref[keep]))) < 2e-3

    # NaN y0 carry marks its lane dead at init
    y0n = y0.at[2].set(jnp.nan)
    ys3 = fused_hh_pop_solve_ft(pop, proto.v, ts, proto_dt=1.0,
                                trips=2048, y0=y0n, interpret=True)
    fin3 = jnp.isfinite(ys3).all(axis=(1, 2))
    assert list(np.asarray(fin3)) == [True, True, False, True]


def test_fused_hh_pop_solve_fuzz_staircases():
    """Fuzz tier for the HH-population kernel: random 5-level staircases
    x 20%-lognormal parameter perturbations vs the batched adaptive
    oracle (the solver fuzz pattern of tests/test_solver.py applied to
    the kernel)."""
    from ionflux.models.registry import HHParams
    from ionflux.ops.pallas_solve import fused_hh_pop_solve_ft
    from ionflux.solver.batched import odeint_batched

    base = np.array([float(getattr(HH_B06, f"p{i}")) for i in range(1, 9)])
    for seed in range(3):
        rng = np.random.RandomState(seed)
        levels = rng.uniform(-100, 50, 5)
        knots = np.repeat(levels, 400)          # 2000 ms at dt=1
        proto = P.Protocol(jnp.float32(0.0), jnp.float32(1.0),
                           jnp.asarray(knots, jnp.float32))
        ts = jnp.linspace(0.0, 1990.0, 100, jnp.float32)
        pop = jnp.asarray(base[None] * np.exp(0.2 * rng.randn(4, 8)),
                          jnp.float32)
        ys = fused_hh_pop_solve_ft(pop, proto.v, ts, proto_dt=1.0,
                                   trips=1024, t_end=1990.0,
                                   interpret=True)

        def rhs_pop(t, y, args):
            xs, pr = args
            v = P.voltage(pr, t)
            return jax.vmap(
                lambda p, yy: hh_rhs(HHParams(*p), t, yy, v))(xs, y)

        y0 = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (4, 1))
        ref = odeint_batched(rhs_pop, y0, ts, (pop, proto), rtol=1e-6,
                             atol=1e-8, buffer_size=4096,
                             max_steps=100_000)
        assert float(jnp.max(jnp.abs(ys - ref))) < 1e-3, seed
