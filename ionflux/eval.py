"""Evaluation / replay harness (layer L6): simulate any model family on any
protocol, per-protocol MAE reports, parity helpers.

Model kinds mirror the reference classes: 'hh' (Lambda), 'markov'
(3-state Lambda/GroundTruth), 'nnf' (ODEFunc), 'nnd' (ODEFunc w/ _dadt),
'gta' (GroundTruth_a).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.models import (
    gt_a_rhs,
    hh_rhs,
    markov_rhs,
    nnd_rhs,
    nnf_rhs,
    MARKOV_Y0_REST,
)
from ionflux.models.registry import Constants
from ionflux.observe import gate_current, mae, markov_current
from ionflux.solver import odeint
from ionflux.solver.adams import odeint_adams
from ionflux.solver.vcabm import odeint_vcabm
from ionflux.solver.implicit import odeint_rosenbrock

_RHS = {
    "hh": hh_rhs,
    "markov": markov_rhs,
    "nnf": nnf_rhs,
    "nnd": nnd_rhs,
    "gta": gt_a_rhs,
}


def _make_rhs(core):
    def rhs(t, y, args):
        params, proto = args
        return core(params, t, y, P.voltage(proto, t))

    return rhs


# memoized ONCE per kind: odeint's jit cache is keyed on rhs identity, so a
# fresh closure per call would force a recompile per call
_MODEL_RHS = {kind: _make_rhs(core) for kind, core in _RHS.items()}


def _model_rhs(kind):
    return _MODEL_RHS[kind]


def default_y0(kind: str, dtype=jnp.float32) -> jnp.ndarray:
    """Rest state after holding at -80 mV (true_y0s[1] / gt_true_y0s[1],
    train-s1.py:115-118, train-d1.py:115-118)."""
    if kind == "markov":
        return jnp.asarray(MARKOV_Y0_REST, dtype)
    return jnp.asarray(np.array([0.0, 1.0]), dtype)


# process-wide default solver method; scripts/common.setup points it at the
# --method CLI flag (reference train-s1.py:21)
DEFAULT_METHOD = "dopri5"


def solve_states(kind: str, params, proto: P.Protocol, ts: jnp.ndarray,
                 y0=None, rtol=1e-6, atol=1e-8, method: str | None = None,
                 **kw):
    if method is None:
        method = DEFAULT_METHOD
    if y0 is None:
        y0 = default_y0(kind, ts.dtype)
    solver = {"adams": odeint_adams, "vcabm": odeint_vcabm,
              "rosenbrock": odeint_rosenbrock}.get(method, odeint)
    return solver(_model_rhs(kind), y0, ts, (params, proto),
                  rtol=rtol, atol=atol, **kw)


def simulate(kind: str, params, proto: P.Protocol, ts: jnp.ndarray,
             c: Constants, y0=None, rtol=1e-6, atol=1e-8,
             method: str | None = None, **kw) -> jnp.ndarray:
    """Observed current for any model family on a protocol
    (method: 'dopri5' | 'adams' (ABM4) | 'vcabm' (variable-order 1-12) |
    'rosenbrock' (implicit L-stable 2(3), stiff systems), reference
    --method flag)."""
    ys = solve_states(kind, params, proto, ts, y0, rtol, atol, method, **kw)
    v = P.voltage(proto, ts)
    if kind == "markov":
        return markov_current(ys, v, c)
    return gate_current(ys, v, c)


def simulate_family(kind: str, params, protos: list[P.Protocol],
                    ts: jnp.ndarray, c: Constants, vmapped: bool = False,
                    backend: str = "xla", **kw) -> jnp.ndarray:
    """Currents over a same-length protocol family -> [B, T].

    Sequential by default (one cheap compile, B executions); vmapped=True
    for throughput paths that amortize the larger XLA compile.

    backend="pallas" (NN-f/NN-d, TPU): the fused branchless fixed-trip
    kernel (ops/pallas_solve.fused_nnf_solve_ft) runs the whole adaptive
    solve on-core — ~7x the XLA lockstep on a 64-protocol sweep (bench
    pallas_sweep_solves_per_sec).  First compile of a new shape goes
    through the remote Mosaic service (minutes, cached after).
    Tolerance defaults match the XLA path (rtol 1e-6 / atol 1e-8).
    Failure semantics match too (round 4): the kernel has per-lane death —
    a divergent protocol lane freezes, leaves the shared controller, and
    returns inf for ITS row only.  A trips-budget shortfall (t_end not
    reached) still infs the whole LAUNCH — which is the whole family up
    to 128 protocols; larger families auto-split into <=128-lane launches
    with independent controllers, so a shortfall infs only its half.
    """
    if backend == "pallas":
        if kind not in ("nnf", "nnd"):
            raise ValueError("backend='pallas' supports the MLP families "
                             "(nnf/nnd) only")
        from ionflux.ops.pallas_solve import fused_nnf_solve_ft

        if len(protos) > 128:
            # the kernel targets one 128-lane tile; split like
            # simulate_population splits >8-protocol popsweep launches
            half = (len(protos) + 1) // 2
            return jnp.concatenate([
                simulate_family(kind, params, protos[:half], ts, c,
                                vmapped=vmapped, backend=backend, **kw),
                simulate_family(kind, params, protos[half:], ts, c,
                                vmapped=vmapped, backend=backend, **kw)],
                axis=0)
        b = P.stack(protos)
        ys = fused_nnf_solve_ft(
            params.net,
            params.rgate if kind == "nnf" else params.hh, b.v, ts,
            proto_t0=float(protos[0].t0), proto_dt=float(protos[0].dt),
            t_end=float(ts[-1]),
            rtol=kw.get("rtol", 1e-6), atol=kw.get("atol", 1e-8),
            trips=kw.get("trips", 4096),
            base_hh=params.hh if kind == "nnd" else None,
            interpret=kw.get("interpret", False))
        v = jax.vmap(lambda pr: P.voltage(pr, ts))(b)
        return gate_current(ys, v, c)
    if vmapped:
        b = P.stack(protos)
        return jax.vmap(lambda pr: simulate(kind, params, pr, ts, c, **kw))(b)
    return jnp.stack([simulate(kind, params, pr, ts, c, **kw) for pr in protos])


def _pop_shared(tree):
    """Gate params are shared across members; a vmapped init carries them
    with the population axis — collapse to member 0's scalars."""
    return jax.tree.map(
        lambda x: x[0] if getattr(x, "ndim", 0) > 0 else x, tree)


def _pop_split(kind: str, pop_params):
    """(nets, rgate_or_base, base_hh) from a population NNfParams/NNdParams
    — the common unpacking of every population entry point."""
    if kind not in ("nnf", "nnd"):
        raise ValueError("population paths support the MLP families "
                         "(nnf/nnd) only")
    hh = None if kind == "nnf" else _pop_shared(pop_params.hh)
    rg = _pop_shared(pop_params.rgate) if kind == "nnf" else hh
    return [(w, bb) for w, bb in pop_params.net], rg, hh


def simulate_population(kind: str, pop_params, protos: list[P.Protocol],
                        ts: jnp.ndarray, c: Constants,
                        **kw) -> jnp.ndarray:
    """Currents for a POPULATION of nets over a protocol family ->
    [P, Q, T]: the checkpoint-validation / seed-ensemble replay workload
    (reference analogue: train-r1.py:928-959 scores candidate nets by
    rollout).  Runs the fused popsweep Pallas kernel
    (ops/pallas_solve.fused_nnf_popsweep_solve_ft): P member nets x Q
    protocols in ONE launch, protocol rows riding the MXU M dimension —
    ~9x the per-member pop kernel on chip.

    pop_params: an NNfParams/NNdParams whose net leaves carry a leading
    population axis (e.g. from jax.vmap(nnf_init) or stacked checkpoints);
    rgate/hh scalars are shared across members.  NN-f/NN-d only.

    Protocol families larger than ops.pallas_solve.POPSWEEP_SPLIT_ROWS
    are split into sequential launches of that many rows (the measured
    per-launch sweet spot; the kernel itself accepts up to
    POPSWEEP_MAX_ROWS) and concatenated along Q.
    """
    from ionflux.ops.pallas_solve import POPSWEEP_SPLIT_ROWS as _SQ

    if len(protos) > _SQ:
        return jnp.concatenate(
            [simulate_population(kind, pop_params, protos[i:i + _SQ], ts,
                                 c, **kw)
             for i in range(0, len(protos), _SQ)], axis=1)
    b = P.stack(protos)
    nets, rg, hh = _pop_split(kind, pop_params)
    return _population_currents(nets, rg, hh, b, ts, c,
                                t0f=float(protos[0].t0),
                                dtf=float(protos[0].dt),
                                t_endf=float(ts[-1]), **kw)


def _population_currents(nets, rg, hh, b: P.Protocol, ts, c: Constants, *,
                         t0f: float, dtf: float, t_endf: float,
                         **kw) -> jnp.ndarray:
    """One popsweep launch: P member nets (shard or whole population) x
    the stacked protocols b -> currents [P, Q, T].  t0f/dtf are the
    protocol clock as python floats — computed by the CALLER from the
    concrete protocols, because under shard_map the closed-over b/ts are
    tracers and float() on them fails."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_solve_ft

    ys = fused_nnf_popsweep_solve_ft(
        nets, rg, b.v, ts,
        proto_t0=t0f, proto_dt=dtf,
        t_end=t_endf,
        rtol=kw.get("rtol", 1e-5), atol=kw.get("atol", 1e-7),
        trips=kw.get("trips", 4096),
        base_hh=hh,
        cull=kw.get("cull", True),
        mxu_bf16=kw.get("mxu_bf16", False),
        interpret=kw.get("interpret", False))                  # [P, Q, T, 2]
    v = jax.vmap(lambda pr: P.voltage(pr, ts))(b)              # [Q, T]
    return gate_current(ys, v[None], c)


def simulate_population_sharded(kind: str, pop_params,
                                protos: list[P.Protocol], ts: jnp.ndarray,
                                c: Constants, mesh=None, axis: str = "pop",
                                **kw) -> jnp.ndarray:
    """simulate_population with the member axis SHARDED across a device
    mesh: members are independent, so each device runs its OWN fused
    popsweep launch on its member shard and no collective enters the
    solve — ICI only carries the output gather (SURVEY.md §5.8; the
    scaling-book recipe: pick a mesh, annotate the population axis, let
    XLA place the rest).  The multi-chip form of the checkpoint-
    validation / ensemble-replay workload; P must divide evenly over the
    mesh axis.  On the virtual CPU mesh use interpret=True."""
    from ionflux.parallel.mesh import make_mesh, sharded_map

    if mesh is None:
        mesh = make_mesh(axes=(axis,))
    from ionflux.ops.pallas_solve import POPSWEEP_SPLIT_ROWS as _SQ

    if len(protos) > _SQ:
        # same rows-per-launch split as simulate_population
        return jnp.concatenate(
            [simulate_population_sharded(kind, pop_params,
                                         protos[i:i + _SQ],
                                         ts, c, mesh=mesh, axis=axis, **kw)
             for i in range(0, len(protos), _SQ)], axis=1)
    n_dev = mesh.shape[axis]
    p_mem = pop_params.net[0][0].shape[0]
    if p_mem % n_dev:
        raise ValueError(f"population {p_mem} does not divide over the "
                         f"{n_dev}-device '{axis}' mesh axis")
    b = P.stack(protos)
    nets, rg, hh = _pop_split(kind, pop_params)

    t0f, dtf = float(protos[0].t0), float(protos[0].dt)
    t_endf = float(ts[-1])

    def local(nets_shard):
        return _population_currents(nets_shard, rg, hh, b, ts, c,
                                    t0f=t0f, dtf=dtf, t_endf=t_endf, **kw)

    return jax.jit(sharded_map(mesh, axis, local))(nets)


def _segment_recordings(names: list[str], *, seg_samples: int, chunk: int,
                        voltages: dict | None = None):
    """Shared host-side segmentation of the named reconstructed recordings
    (the prep both simulate_population_real and population_rollout_maes
    run): equal-rate waveforms padded at their final holding value into
    knot segments [B, Q, seg+1] plus whole-chunk sample grids
    [B, Q, n_ch*chunk], so every downstream pass is one dispatch per
    segment.  Returns (lens, dt, seg, n_seg, n_ch, seg_v, vsegs)."""
    from ionflux import protorec

    vs, lens = [], []
    dt = None
    for n in names:
        v, dti = (voltages[n] if voltages is not None
                  else protorec.load_voltage(n))
        if dt is not None and dti != dt:
            raise ValueError(
                f"mixed sample rates: {n} has dt={dti} ms but earlier "
                f"protocols have dt={dt} ms — all Q rows share one clock")
        dt = dti
        vs.append(np.asarray(v, np.float32))
        lens.append(len(v))
    max_len = max(lens)
    seg = min(int(seg_samples), max_len)
    n_seg = -(-max_len // seg)
    padded = np.empty((len(names), n_seg * seg + 1), np.float32)
    for i, v in enumerate(vs):
        padded[i, :lens[i]] = v
        padded[i, lens[i]:] = v[-1]
    seg_v = np.stack([padded[:, b * seg:b * seg + seg + 1]
                      for b in range(n_seg)])            # [B, Q, seg+1]
    # per-segment sample voltages, edge-padded to whole chunks so the
    # jitted currents/reduce pass is ONE dispatch per segment (a python
    # chunk loop costs ~250 tunnel round-trips)
    n_ch = -(-seg // chunk)
    vsegs = np.empty((n_seg, len(names), n_ch * chunk), np.float32)
    for b in range(n_seg):
        end = min(b * seg + n_ch * chunk, padded.shape[1])
        vsegs[b, :, :end - b * seg] = padded[:, b * seg:end]
        vsegs[b, :, end - b * seg:] = padded[:, -1:]
    return lens, dt, seg, n_seg, n_ch, seg_v, vsegs


def simulate_population_real(kind: str, pop_params, names: list[str],
                             c: Constants, *, trips: int = 6144,
                             seg_samples: int = 103_224,
                             rtol: float = 1e-5, atol: float = 1e-7,
                             cull: bool = True,
                             interpret: bool = False,
                             chunk: int = 4096,
                             voltages: dict | None = None) -> dict:
    """Currents for a POPULATION of nets on the named reconstructed REAL
    protocols -> {name: [P, N] at every 0.1 ms sample}: the popsweep
    kernel chained over ~10 s segments with local f32 clocks (the Pallas
    counterpart of solve_states_long; a global f32 clock infs out on the
    58-93 s recordings).  All P members x all Q protocols advance in the
    SAME launches — protocols shorter than the longest integrate on at
    their final holding value (near-equilibrium, so they add no controller
    work) and are sliced back to their own length.

    The checkpoint-validation workload (studies.table_rollout_maes over
    stacked candidate nets; reference analogue train-r1.py:928-959).
    NN-f/NN-d only.  voltages overrides the recorded waveforms with
    {name: (v_samples, dt_ms)} — tiny stand-ins make the segmentation /
    padding / chunk-assembly logic testable in interpret mode where the
    464k-929k-sample recordings are not."""
    from ionflux.ops.pallas_solve import fused_nnf_popsweep_chained

    nets, rg, hh = _pop_split(kind, pop_params)
    lens, dt, seg, n_seg, n_ch, seg_v, vsegs = _segment_recordings(
        names, seg_samples=seg_samples, chunk=chunk, voltages=voltages)

    p_mem = nets[0][0].shape[0]
    out = {n: np.empty((p_mem, ln), np.float32)
           for n, ln in zip(names, lens)}
    fin = {}

    def consume(b, recs):
        # deadness propagates through the chain (final_state carries NaN),
        # so the LAST segment's mask is the cumulative survival flag
        fin["mask"] = recs.mask[:, :len(names)]
        ii = _popsweep_segment_currents(
            recs.rec_sc, recs.rec_y, recs.rec_k, recs.n_acc, recs.n_valid,
            recs.mask, jnp.asarray(vsegs[b]), jnp.float32(dt), c,
            recs.p, recs.q, len(names), n_ch, chunk)
        ii = np.asarray(ii)                              # [P, Q, n_ch*chunk]
        g0 = b * seg
        for qi, n in enumerate(names):
            lo, hi = g0, min(g0 + seg, lens[qi])
            if lo < hi:
                out[n][:, lo:hi] = ii[:, qi, :hi - lo]

    fused_nnf_popsweep_chained(
        nets, rg,
        jnp.asarray(seg_v), proto_dt=float(dt), t_end=seg * float(dt),
        rtol=rtol, atol=atol, trips=trips, base_hh=hh, cull=cull,
        interpret=interpret, consume=consume)
    # a (member, protocol) lane that died at ANY point scores inf over its
    # whole trace (the "non-finite rollouts score inf" selection rule)
    m = np.asarray(fin["mask"])
    for qi, n in enumerate(names):
        out[n][~m[:, qi]] = np.inf
    return out


@partial(jax.jit, static_argnames=("p", "q", "q_req", "n_ch", "chunk"))
def _popsweep_segment_currents(rec_sc, rec_y, rec_k, n_acc, n_valid, mask,
                               vseg, dt, c, p, q, q_req, n_ch, chunk):
    """One segment's currents [P, Q_req, n_ch*chunk] from the popsweep
    record stream: lax.map over T-chunks keeps the [C, 7, 2Q, 128] record
    gather bounded while staying a single dispatch."""
    from ionflux.ops.pallas_solve import _dense_eval_popsweep_ft

    def one(ci):
        ts_c = (ci * chunk + jnp.arange(chunk, dtype=jnp.float32)) * dt
        ys = _dense_eval_popsweep_ft(rec_sc, rec_y, rec_k, n_acc, n_valid,
                                     ts_c, p, q)[:, :q_req]
        vv = jax.lax.dynamic_slice(vseg, (0, ci * chunk), (q_req, chunk))
        return gate_current(ys, vv[None], c)             # [P, Qr, chunk]

    ii = jax.lax.map(one, jnp.arange(n_ch))              # [n_ch, P, Qr, C]
    ii = jnp.transpose(ii, (1, 2, 0, 3)).reshape(
        ii.shape[1], q_req, n_ch * chunk)
    return jnp.where(mask[:, :q_req, None], ii, jnp.inf)


@partial(jax.jit, static_argnames=("rg", "hh", "trips", "rtol", "atol",
                                   "dt", "t_end", "q_req", "n_ch", "chunk",
                                   "cull", "interpret"))
def _popsweep_segment_reduce(nets, vknots, y0, vseg, tseg, wseg,
                             acc, c, *, rg, hh, trips, rtol, atol, dt,
                             t_end, q_req, n_ch, chunk, cull, interpret):
    """ONE chained-validation segment as ONE dispatch: popsweep solve +
    dense-eval + |pred - truth| reduction + final-state carry, all device
    side.  Only the [P, Q] partial-sum accumulator (and the carry y0)
    live between launches, so the host loop never blocks — JAX's async
    dispatch pipelines the whole segment chain exactly like the on-chip
    CMA-ES lookahead (fit/cmaes.cmaes_onchip), and one tiny fetch at the
    end replaces the ~130 MB-per-segment current download that made the
    round-4 validation chain ~9.8 s wall for ~0.45 s of kernel compute."""
    from ionflux.ops.pallas_solve import (fused_nnf_popsweep_solve_ft,
                                          _dense_eval_popsweep_ft)

    recs = fused_nnf_popsweep_solve_ft(
        nets, rg, vknots, jnp.asarray([t_end], jnp.float32),
        proto_dt=dt, t_end=t_end, rtol=rtol, atol=atol, trips=trips,
        base_hh=hh, y0=y0, return_records=True, cull=cull,
        interpret=interpret)

    def one(ci):
        ts_c = (ci * chunk + jnp.arange(chunk, dtype=jnp.float32)) * dt
        ys = _dense_eval_popsweep_ft(recs.rec_sc, recs.rec_y, recs.rec_k,
                                     recs.n_acc, recs.n_valid, ts_c,
                                     recs.p, recs.q)[:, :q_req]
        vv = jax.lax.dynamic_slice(vseg, (0, ci * chunk), (q_req, chunk))
        ii = gate_current(ys, vv[None], c)               # [P, Qr, chunk]
        tt = jax.lax.dynamic_slice(tseg, (0, ci * chunk), (q_req, chunk))
        ww = jax.lax.dynamic_slice(wseg, (0, ci * chunk), (q_req, chunk))
        # where (not *): a padded/out-of-span sample of a diverging lane
        # would otherwise contribute inf*0 = NaN
        err = jnp.where(ww > 0.5, jnp.abs(ii - tt[None]), 0.0)
        return jnp.sum(err, axis=-1)                     # [P, Qr]

    sums = jnp.sum(jax.lax.map(one, jnp.arange(n_ch)), axis=0)
    return acc + sums, recs.final_state(t_end), recs.mask[:, :q_req]


def population_rollout_maes(kind: str, pop_params, names: list[str],
                            c: Constants, truth: dict, *,
                            spans: dict | None = None,
                            trips: int = 6144,
                            seg_samples: int = 103_224,
                            rtol: float = 1e-5, atol: float = 1e-7,
                            cull: bool = True, interpret: bool = False,
                            chunk: int = 4096,
                            voltages: dict | None = None) -> np.ndarray:
    """Rollout MAEs [P, len(names)] of a POPULATION of nets against
    per-protocol target traces, with the reduction ON DEVICE (the
    checkpoint-validation scoring workload; reference analogue
    train-r1.py:928-959 scores candidates by rollout MAE).  Identical
    chained-popsweep integration to simulate_population_real, but instead
    of downloading the full [P, Q, ~1M-sample] current matrix per batch
    (~1.3 GB at P=64 — the round-4 wall), each segment's
    |pred - truth| partial sums accumulate in a [P, Q] device carry and
    the host fetches two tiny arrays at the end.  The segment launches
    pipeline through JAX async dispatch (the same lookahead principle as
    fit/cmaes.cmaes_onchip — the host never blocks mid-chain).

    truth[name]: the target trace, >= that protocol's sample count.
    spans[name]: optional (lo, hi) sample interval to score (table-1's
    Pr4 scores sweeps 1-3 only); default the protocol's full length.
    A lane that died at ANY point in the chain scores inf on every
    protocol (NaN-carry deadness propagation, batched.py semantics);
    NaN sums (a lane diverging without death) surface as non-finite for
    the caller's rescore path."""
    from ionflux.models.registry import HHParams

    nets, rg, hh = _pop_split(kind, pop_params)
    # the kernel bakes the gate params in as compile-time constants —
    # pass them static (hashable pure-float NamedTuples), not traced
    rg = HHParams(*(float(x) for x in rg))
    hh = None if hh is None else HHParams(*(float(x) for x in hh))
    lens, dt, seg, n_seg, n_ch, seg_v, vsegs = _segment_recordings(
        names, seg_samples=seg_samples, chunk=chunk, voltages=voltages)
    q_req = len(names)
    p_mem = nets[0][0].shape[0]

    # per-segment truth traces + scoring weights on the same padded
    # whole-chunk grid as vsegs
    tsegs = np.zeros((n_seg, q_req, n_ch * chunk), np.float32)
    wsegs = np.zeros((n_seg, q_req, n_ch * chunk), np.float32)
    counts = np.empty(q_req, np.float64)
    for qi, n in enumerate(names):
        tr = np.asarray(truth[n], np.float32)
        if tr.shape[0] < lens[qi]:
            raise ValueError(f"truth[{n!r}] has {tr.shape[0]} samples, "
                             f"protocol has {lens[qi]}")
        lo, hi = (spans or {}).get(n, (0, lens[qi]))
        lo, hi = max(int(lo), 0), min(int(hi), lens[qi])
        counts[qi] = max(hi - lo, 1)
        for b in range(n_seg):
            g0 = b * seg
            e = min(g0 + n_ch * chunk, lens[qi])
            if g0 < e:
                tsegs[b, qi, :e - g0] = tr[g0:e]
            # score ONLY this segment's own [g0, g0+seg) samples: the
            # chunk-padding tail past seg re-appears in the NEXT
            # segment's grid (and this launch's dense eval clamps at
            # t_end there) — weighting it would double-count
            slo, shi = max(lo - g0, 0), min(hi - g0, seg)
            if slo < shi:
                wsegs[b, qi, slo:shi] = 1.0

    # explicit rest-state y0 (not None) so segment 0 traces the same
    # program as the rest — one compile for the whole chain
    y0 = jnp.concatenate([jnp.zeros((p_mem, q_req, 1), jnp.float32),
                          jnp.ones((p_mem, q_req, 1), jnp.float32)],
                         axis=-1)
    acc = jnp.zeros((p_mem, q_req), jnp.float32)
    mask = None
    for b in range(n_seg):
        acc, y0, mask = _popsweep_segment_reduce(
            nets, jnp.asarray(seg_v[b]), y0,
            jnp.asarray(vsegs[b]), jnp.asarray(tsegs[b]),
            jnp.asarray(wsegs[b]), acc, c,
            rg=rg, hh=hh,
            trips=int(trips), rtol=float(rtol), atol=float(atol),
            dt=float(dt), t_end=seg * float(dt), q_req=q_req, n_ch=n_ch,
            chunk=int(chunk), cull=cull, interpret=interpret)
    # the LAST segment's mask is the cumulative survival flag (deadness
    # propagates through the NaN y0 carry) — one fetch ends the chain
    sums = np.asarray(acc, np.float64)
    alive = np.asarray(mask)
    return np.where(alive, sums / counts[None, :], np.inf)


def report_mae(name: str, pred: jnp.ndarray, truth: jnp.ndarray,
               fmt: str = "{name} | Total Loss {loss:.6f}") -> float:
    """Print the reference's per-protocol loss line (train-s1.py:330 etc.)."""
    loss = float(mae(pred, truth))
    print(fmt.format(name=name, loss=loss))
    return loss


def pad_protocol(proto: P.Protocol, n_knots: int) -> P.Protocol:
    """Extend a protocol to n_knots by repeating its final value.  Padded
    region is beyond every query time, so results are unchanged — this
    canonicalizes shapes so ALL protocols share ONE compiled solve."""
    cur = proto.v.shape[-1]
    if cur >= n_knots:
        return proto
    pad = jnp.full((n_knots - cur,), proto.v[-1], proto.v.dtype)
    return P.Protocol(proto.t0, proto.dt, jnp.concatenate([proto.v, pad]))


def simulate_cases(kind: str, params, cases, c: Constants, **kw):
    """Simulate many (proto, ts) cases through a single compiled solve.

    cases: list of (proto, ts). Pads protocols to the max knot count and
    output grids to the max length (repeating t_end — dense output at a
    repeated time is free), then slices each result back. Avoids one XLA
    compile per distinct protocol/grid shape (expensive over the remote
    TPU compile service).
    """
    n_knots = max(case[0].v.shape[-1] for case in cases)
    n_ts = max(case[1].shape[-1] for case in cases)
    out = []
    for proto, ts in cases:
        t_len = ts.shape[-1]
        ts_pad = jnp.concatenate(
            [ts, jnp.full((n_ts - t_len,), ts[-1], ts.dtype)])
        i = simulate(kind, params, pad_protocol(proto, n_knots), ts_pad, c, **kw)
        out.append(i[:t_len])
    return out


def solve_states_long(kind: str, params, name: str, y0=None,
                      rtol=1e-6, atol=1e-8, max_steps: int = 200_000,
                      buffer_size: int = 16384, dtype=jnp.float32):
    """States on a long multi-sweep real protocol (protorec.SWEEPS) via the
    segment-chained solver: one f32-exact local clock per sweep, state
    carried across sweeps (solver/chained.py; the reference's grid_points
    replacement).  A single global f32 time axis stalls at these lengths
    (ulp(150 s) ~ 0.016 ms); this is the supported path for the real
    Pr3/Pr4/Pr5 recordings.  Returns ys [N, S] at every 0.1 ms sample."""
    from ionflux import protorec
    from ionflux.solver.chained import odeint_chained

    n_sweeps, period = protorec.SWEEPS[name]
    v, dt = protorec.load_voltage(name)
    assert len(v) == n_sweeps * period
    # overlap one sample so each segment integrates through the 0.1 ms ramp
    # into the next sweep's first sample
    vs = np.empty((n_sweeps, period + 1), v.dtype)
    vs[:, :period] = v.reshape(n_sweeps, period)
    vs[:-1, period] = vs[1:, 0]
    vs[-1, period] = vs[-1, period - 1]
    protos = P.stack([
        P.Protocol(jnp.asarray(0.0, dtype), jnp.asarray(dt, dtype),
                   jnp.asarray(row, dtype)) for row in vs])
    ts = jnp.arange(period + 1, dtype=dtype) * jnp.asarray(dt, dtype)
    if y0 is None:
        y0 = default_y0(kind, dtype)

    ys = odeint_chained(_model_rhs(kind), y0, ts, protos, params,
                        rtol=rtol, atol=atol, max_steps=max_steps,
                        buffer_size=buffer_size)       # [B, T+1, S]
    return ys[:, :-1, :].reshape(n_sweeps * period, -1)  # drop overlap


def simulate_long(kind: str, params, name: str, c: Constants, y0=None,
                  dtype=jnp.float32, **kw) -> np.ndarray:
    """Current on a long multi-sweep real protocol (see solve_states_long),
    flattened to the recording's length."""
    from ionflux import protorec

    ys = solve_states_long(kind, params, name, y0, dtype=dtype, **kw)
    v, _dt = protorec.load_voltage(name)
    vq = jnp.asarray(v.reshape(-1), dtype)
    if kind == "markov":
        return markov_current(ys, vq, c)
    return gate_current(ys, vq, c)


def solve_states_real(kind: str, params, name: str, y0=None,
                      dtype=jnp.float32, **kw):
    """States on any reconstructed real protocol: multi-sweep recordings go
    through the segment-chained solver, single-segment ones (sinewave, APs)
    through the plain adaptive solver on their full 0.1 ms grid."""
    from ionflux import protorec

    if name in protorec.SWEEPS:
        return solve_states_long(kind, params, name, y0, dtype=dtype, **kw)
    v, dt = protorec.load_voltage(name)
    proto = protorec.protocol(name, dtype=dtype)
    ts = jnp.asarray(np.arange(len(v)) * dt, dtype)
    kw.setdefault("max_steps", 400_000)
    kw.setdefault("buffer_size", 32768)
    return solve_states(kind, params, proto, ts, y0=y0, **kw)
