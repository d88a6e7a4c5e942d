"""CMA-ES whole-trace fitting (layer L5, the reference's PINTS path).

Reference usage (train-d0.py:507-540): ``pints.OptimisationController`` with
``pints.CMAES``, log-transform, rectangular bounds [0.1 p0, 10 p0],
sigma0 = 0.1 p0, stop after 100 unchanged iterations at threshold 1e-3, and
``set_parallel(True)`` multiprocessing for population evaluation.

TPU-native replacement: the ask/tell covariance machinery (standard Hansen
CMA-ES) runs host-side in numpy — O(n^2) with n=4-9 parameters, negligible —
while the population objective is ONE vmapped jitted batch of whole-trace ODE
solves on device.  Non-finite/diverged solves return inf and are rejected by
ranking, replacing the reference's SIGALRM timeout sentinel
(train-d0.py:427-438).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np


@dataclass
class CMAESResult:
    x: np.ndarray              # best parameters (original space)
    fx: float                  # best objective value
    iterations: int
    evaluations: int
    history: list = field(default_factory=list)  # (iter, best_fx)
    # True when the fit stopped on max_iterations rather than convergence
    # (the unchanged-iterations rule) — a silently truncated fit is the one
    # outcome a caller must be able to see (ADVICE r4)
    hit_max_iterations: bool = False


def _default_popsize(n: int) -> int:
    return 4 + int(3 * np.log(n))


def cmaes(
    objective_batch: Callable[[np.ndarray], np.ndarray],
    x0: np.ndarray,
    sigma0: np.ndarray | float,
    bounds: tuple[np.ndarray, np.ndarray] | None = None,
    popsize: int | None = None,
    max_iterations: int | None = None,
    max_unchanged_iterations: int = 100,
    unchanged_threshold: float = 1e-3,
    log_transform: bool = True,
    seed: int = 0,
    verbose: bool = False,
) -> CMAESResult:
    """Minimize objective_batch([pop, n] params in ORIGINAL space) -> [pop].

    Mirrors the reference's controller semantics: sigma0/bounds given in
    original space; optimization runs in log space when log_transform
    (pints.LogTransformation, train-d0.py:511).
    """
    x0 = np.asarray(x0, np.float64)
    n = x0.size
    lam = popsize or _default_popsize(n)
    mu = lam // 2
    w = np.log(lam / 2 + 0.5) - np.log(np.arange(1, mu + 1))
    w /= w.sum()
    mueff = 1.0 / np.sum(w ** 2)

    # strategy constants (Hansen 2016 tutorial defaults)
    cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
    cs = (mueff + 2) / (n + mueff + 5)
    c1 = 2 / ((n + 1.3) ** 2 + mueff)
    cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff))
    damps = 1 + 2 * max(0.0, np.sqrt((mueff - 1) / (n + 1)) - 1) + cs
    chi_n = np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n ** 2))

    sigma0 = np.asarray(sigma0, np.float64) * np.ones(n)
    if log_transform:
        to_t = np.log
        from_t = np.exp
        # sigma in log space: the original-space spread through the local
        # log-derivative at x0
        sigma = float(np.mean(sigma0 / x0))
    else:
        # per-dimension coordinate scaling so one scalar sigma serves
        # parameters of wildly different magnitudes
        scale = np.where(sigma0 > 0, sigma0, 1.0)
        to_t = lambda z: np.asarray(z, np.float64) / scale  # noqa: E731
        from_t = lambda z: z * scale  # noqa: E731
        sigma = 1.0

    m = to_t(x0)

    if bounds is not None:
        lo, hi = (to_t(np.asarray(b, np.float64)) for b in bounds)
    else:
        lo = hi = None

    cov = np.eye(n)
    p_c = np.zeros(n)
    p_s = np.zeros(n)
    rng = np.random.default_rng(seed)

    best_x, best_f = x0.copy(), np.inf
    unchanged = 0
    evals = 0
    history = []
    it = 0
    while True:
        it += 1
        d2, b_mat = np.linalg.eigh(cov)
        d = np.sqrt(np.maximum(d2, 1e-20))
        inv_sqrt_c = b_mat @ np.diag(1.0 / d) @ b_mat.T

        z = rng.standard_normal((lam, n))
        y = z @ np.diag(d) @ b_mat.T
        xs_t = m + sigma * y
        if lo is not None:
            xs_t = np.clip(xs_t, lo, hi)  # rectangular boundaries
            y = (xs_t - m) / sigma
        xs = from_t(xs_t)

        fs = np.asarray(objective_batch(xs), np.float64).reshape(lam)
        fs = np.where(np.isfinite(fs), fs, np.inf)
        evals += lam

        order = np.argsort(fs)
        if fs[order[0]] < best_f - 0:
            improved = best_f - fs[order[0]] > unchanged_threshold
            if fs[order[0]] < best_f:
                best_f = float(fs[order[0]])
                best_x = xs[order[0]].copy()
            unchanged = 0 if improved else unchanged + 1
        else:
            unchanged += 1
        history.append((it, best_f))
        if verbose and it % 20 == 0:
            print(f"cmaes iter {it} best {best_f:.6g} sigma {sigma:.3g}")

        y_w = w @ y[order[:mu]]
        m = m + sigma * y_w

        p_s = (1 - cs) * p_s + np.sqrt(cs * (2 - cs) * mueff) * (inv_sqrt_c @ y_w)
        h_sig = (np.linalg.norm(p_s)
                 / np.sqrt(1 - (1 - cs) ** (2 * it)) / chi_n) < 1.4 + 2 / (n + 1)
        p_c = (1 - cc) * p_c + h_sig * np.sqrt(cc * (2 - cc) * mueff) * y_w

        arts = y[order[:mu]]
        cov = ((1 - c1 - cmu) * cov
               + c1 * (np.outer(p_c, p_c) + (not h_sig) * cc * (2 - cc) * cov)
               + cmu * arts.T @ np.diag(w) @ arts)
        sigma *= np.exp((cs / damps) * (np.linalg.norm(p_s) / chi_n - 1))
        sigma = float(np.clip(sigma, 1e-12, 1e6))

        if max_iterations is not None and it >= max_iterations:
            break
        if unchanged >= max_unchanged_iterations:
            break
    return CMAESResult(x=best_x, fx=best_f, iterations=it,
                       evaluations=evals, history=history,
                       hit_max_iterations=(max_iterations is not None
                                           and it >= max_iterations
                                           and unchanged
                                           < max_unchanged_iterations))


def cmaes_onchip(
    objective_fn: Callable,
    x0: np.ndarray,
    sigma0: np.ndarray | float,
    bounds: tuple[np.ndarray, np.ndarray] | None = None,
    popsize: int | None = None,
    max_iterations: int | None = None,
    max_unchanged_iterations: int = 100,
    unchanged_threshold: float = 1e-3,
    log_transform: bool = True,
    seed: int = 0,
    sync_every: int = 8,
) -> CMAESResult:
    """Device-resident CMA-ES: the fit runs as jitted ``lax.scan`` chunks of
    ``sync_every`` generations, dispatched with one chunk of lookahead so the
    host stopping-rule fetch overlaps the next chunk's device execution.

    Why this shape (all chip-measured, round 4, d0 analytic objective at
    pop 8): the host-side :func:`cmaes` above syncs the loss vector back
    every generation — ~24 ms of remote-tunnel RTT on top of the 65 ms
    device objective (~94 ms/gen all-in).  A single giant
    ``lax.while_loop`` launch eliminates the RTT but XLA compiles the
    objective's ``associative_scan`` ~3.5x SLOWER inside a while body
    (226 ms/gen marginal) — while bodies lose the buffer
    aliasing/pipelining the standalone jit gets.  The same step body inside
    ``lax.scan`` chunks runs at the pure-device floor (63 ms/gen
    marginal), and lookahead dispatch hides the per-chunk fetch.  Measured
    end-to-end on the warm chip (scripts/measure_onchip_cmaes.py,
    out/d0-onchip/fit-paths-tpu.jsonl): the full d0 fit runs at 72 ms/gen
    vs the host loop's 92 — 1.27x; the ~9 ms/gen above the floor is the
    frozen lookahead tail plus the per-chunk stop-scalar fetches.

    Stopping semantics: each in-chunk step freezes the carry once the
    max-iterations or unchanged-iterations rule fires, so the REPORTED
    iteration count is exact; up to ``2 * sync_every`` generations of
    frozen device work run past the stopping point (harmless, unobserved).

    ``objective_fn`` must be jittable: (xs [lam, n] f32, ORIGINAL space) ->
    [lam] f32 losses (inf for diverged candidates — e.g. the isfinite
    sentinel of scripts/train_d0.py make_objective_analytic).  All strategy
    constants, the update order, and the unchanged-iterations stopping rule
    mirror :func:`cmaes` line for line (Hansen 2016 tutorial defaults; the
    reference's controller semantics, train-d0.py:507-540) — the only
    deltas are f32 arithmetic and JAX's threefry RNG in place of numpy's
    PCG64, so runs agree statistically, not bit-for-bit.
    """
    import jax
    import jax.numpy as jnp
    from jax import lax

    x0 = np.asarray(x0, np.float64)
    n = x0.size
    lam = popsize or _default_popsize(n)
    mu = lam // 2
    w_np = np.log(lam / 2 + 0.5) - np.log(np.arange(1, mu + 1))
    w_np /= w_np.sum()
    mueff = float(1.0 / np.sum(w_np ** 2))

    cc = (4 + mueff / n) / (n + 4 + 2 * mueff / n)
    cs = (mueff + 2) / (n + mueff + 5)
    c1 = 2 / ((n + 1.3) ** 2 + mueff)
    cmu = min(1 - c1, 2 * (mueff - 2 + 1 / mueff) / ((n + 2) ** 2 + mueff))
    damps = float(1 + 2 * max(0.0, np.sqrt((mueff - 1) / (n + 1)) - 1) + cs)
    chi_n = float(np.sqrt(n) * (1 - 1 / (4 * n) + 1 / (21 * n ** 2)))

    sigma0 = np.asarray(sigma0, np.float64) * np.ones(n)
    if log_transform:
        if np.any(x0 <= 0):
            raise ValueError("log_transform requires positive x0")
        m0 = np.log(x0)
        sig_init = float(np.mean(sigma0 / x0))
        scale = None
    else:
        scale = np.where(sigma0 > 0, sigma0, 1.0)
        m0 = x0 / scale
        sig_init = 1.0

    if bounds is not None:
        lo_np, hi_np = (np.asarray(b, np.float64) for b in bounds)
        lo_t = np.log(lo_np) if log_transform else lo_np / scale
        hi_t = np.log(hi_np) if log_transform else hi_np / scale
    else:
        lo_t = hi_t = None

    f32 = jnp.float32
    w = jnp.asarray(w_np, f32)
    scale_j = None if scale is None else jnp.asarray(scale, f32)

    def from_t(xs_t):
        return jnp.exp(xs_t) if log_transform else xs_t * scale_j

    def step(carry):
        (key, m, sigma, cov, p_c, p_s, best_x, best_f, unchanged, it) = carry
        it = it + 1
        d2, b_mat = jnp.linalg.eigh(cov)
        d = jnp.sqrt(jnp.maximum(d2, 1e-20))
        inv_sqrt_c = (b_mat * (1.0 / d)[None, :]) @ b_mat.T

        key, k_z = jax.random.split(key)
        z = jax.random.normal(k_z, (lam, n), f32)
        y = (z * d[None, :]) @ b_mat.T
        xs_t = m[None, :] + sigma * y
        if lo_t is not None:
            xs_t = jnp.clip(xs_t, jnp.asarray(lo_t, f32),
                            jnp.asarray(hi_t, f32))
            y = (xs_t - m[None, :]) / sigma
        xs = from_t(xs_t)

        fs = objective_fn(xs).reshape(lam)
        fs = jnp.where(jnp.isfinite(fs), fs, jnp.inf)

        order = jnp.argsort(fs)
        f_min = fs[order[0]]
        improved = (best_f - f_min) > unchanged_threshold
        best_x = jnp.where(f_min < best_f, xs[order[0]], best_x)
        best_f = jnp.minimum(best_f, f_min)
        unchanged = jnp.where(improved, 0, unchanged + 1)

        y_mu = y[order[:mu]]
        y_w = w @ y_mu
        m = m + sigma * y_w

        # python-float constants only: a stray numpy f64 scalar would
        # promote the f32 carry under jax_enable_x64
        p_s = ((1 - cs) * p_s
               + float(np.sqrt(cs * (2 - cs) * mueff))
               * (inv_sqrt_c @ y_w))
        norm_ps = jnp.linalg.norm(p_s)
        denom = jnp.sqrt(1 - jnp.power(f32(1 - cs), 2 * it.astype(f32)))
        h_sig = ((norm_ps / denom / chi_n) < (1.4 + 2 / (n + 1))).astype(f32)
        p_c = ((1 - cc) * p_c
               + h_sig * float(np.sqrt(cc * (2 - cc) * mueff)) * y_w)

        cov = ((1 - c1 - cmu) * cov
               + c1 * (jnp.outer(p_c, p_c)
                       + (1 - h_sig) * cc * (2 - cc) * cov)
               + cmu * (y_mu.T * w[None, :]) @ y_mu)
        sigma = sigma * jnp.exp((cs / damps) * (norm_ps / chi_n - 1))
        sigma = jnp.clip(sigma, 1e-12, 1e6)
        return (key, m, sigma, cov, p_c, p_s, best_x, best_f, unchanged, it)

    @jax.jit
    def chunk(carry, limits):
        # limits ride as runtime scalars (not baked constants) so a warm-up
        # call at tiny max_iterations compiles the SAME program as the real
        # fit — the first full fit in a fresh process would otherwise pay
        # the chunk compile again (measured: that amortization read as
        # 154 ms/gen on a 470-gen fit before this split)
        max_it, max_unch = limits

        def frozen_step(c, _):
            # freeze once a stopping rule fires so extra in-flight chunks
            # are no-ops and the reported iteration count is exact
            unchanged, it = c[-2], c[-1]
            done = jnp.logical_or(it >= max_it, unchanged >= max_unch)
            new = step(c)
            c = jax.tree.map(lambda a, b: jnp.where(done, a, b), c, new)
            return c, None

        return lax.scan(frozen_step, carry, None, length=sync_every)[0]

    # None matches the host default (unbounded, the reference's
    # opt.set_max_iterations(None)): the stopping rule is then the
    # unchanged-iterations test alone; the internal bound only sizes the
    # dispatch loop (ADVICE r4: a silently truncated on-chip-only default
    # diverged from the host semantics)
    max_it_eff = 1_000_000 if max_iterations is None else max_iterations
    limits = (jnp.asarray(max_it_eff, jnp.int32),
              jnp.asarray(max_unchanged_iterations, jnp.int32))

    carry = (jax.random.PRNGKey(seed),
             jnp.asarray(m0, f32),
             f32(sig_init),
             jnp.eye(n, dtype=f32),
             jnp.zeros(n, f32),
             jnp.zeros(n, f32),
             jnp.asarray(x0, f32),
             f32(jnp.inf),
             jnp.asarray(0, jnp.int32),
             jnp.asarray(0, jnp.int32))

    # one-chunk-lookahead dispatch: fetch chunk i's stop scalars while
    # chunk i+1 executes; the final fetched carry is the result (any
    # further in-flight chunk is frozen).  The per-chunk fetch already
    # syncs two scalars; best_f rides along for free, giving a
    # chunk-granular convergence history (ADVICE r4: the --onchip path
    # returned an empty history).
    prev = None
    history = []
    max_chunks = -(-max_it_eff // sync_every) + 2
    for _ in range(max_chunks):
        nxt = chunk(carry, limits)
        if prev is not None:
            unchanged, it = int(prev[-2]), int(prev[-1])
            history.append((it, float(prev[7])))
            if it >= max_it_eff or unchanged >= max_unchanged_iterations:
                carry = prev
                break
        prev, carry = carry, nxt
    # without a break the chunk bound guarantees carry is frozen at the
    # stopping point already (max_chunks covers max_iterations + lookahead)

    best_x, best_f = carry[6], carry[7]
    it, unchanged = int(carry[9]), int(carry[8])
    if not history or history[-1][0] != it:
        history.append((it, float(best_f)))
    hit_max = (max_iterations is not None and it >= max_iterations
               and unchanged < max_unchanged_iterations)
    if hit_max:
        print(f"cmaes_onchip: stopped at max_iterations={max_iterations} "
              f"before convergence (unchanged={unchanged}/"
              f"{max_unchanged_iterations})")
    return CMAESResult(x=np.asarray(best_x, np.float64),
                       fx=float(best_f), iterations=it,
                       evaluations=it * lam, history=history,
                       hit_max_iterations=hit_max)


def shard_objective(mesh, per_member_fn: Callable | None = None,
                    popsize: int = 0, n_params: int = 0,
                    batch_fn: Callable | None = None):
    """Distribute a population objective across a device mesh.

    Members are sharded along the mesh's first axis (the TPU-native
    replacement for the reference's pints ``set_parallel(True)``
    multiprocessing, train-d0.py:538); each device evaluates its shard and
    results gather back.  popsize must divide evenly by the axis size (pad
    at call sites).

    Two evaluation forms:
    - per_member_fn: (params [n_params]) -> scalar loss, jittable; vmapped
      then GSPMD-sharded.
    - batch_fn: (params [B, n_params]) -> [B] losses — a population-batched
      objective such as the d0-style lockstep ``odeint_batched`` trace SSE
      (scripts/train_d0.py make_objective); run via shard_map so each device
      shard drives the batched-lane solver on its local lanes.  This is the
      path the framework ships for distributed CMA-ES.
    """
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as Ps

    axis = mesh.axis_names[0]
    if (per_member_fn is None) == (batch_fn is None):
        raise ValueError("pass exactly one of per_member_fn / batch_fn")
    if popsize % mesh.devices.shape[0]:
        raise ValueError(
            f"popsize {popsize} must divide by the '{axis}' axis size "
            f"{mesh.devices.shape[0]}")
    if batch_fn is not None:
        fn = jax.jit(jax.shard_map(
            batch_fn, mesh=mesh, in_specs=(Ps(axis, None),),
            out_specs=Ps(axis), check_vma=False))
    else:
        fn = jax.jit(
            jax.vmap(per_member_fn),
            in_shardings=NamedSharding(mesh, Ps(axis, None)),
            out_shardings=NamedSharding(mesh, Ps(axis)),
        )

    multiproc = jax.process_count() > 1

    def objective(xs: np.ndarray) -> np.ndarray:
        n = xs.shape[0]
        pad = (-n) % popsize
        if pad:
            xs = np.concatenate([xs, np.repeat(xs[-1:], pad, axis=0)])
        import jax.numpy as jnp

        if multiproc:
            # SPMD driver: every process proposed the same population, so
            # each materialises only its addressable member shards, and the
            # loss vector all-gathers back (over DCN on a real pod) so
            # every process's CMA-ES update sees identical ranks
            from ionflux.parallel.multihost import (gather_global,
                                                    scatter_global)
            xs_g = scatter_global(mesh, np.asarray(xs, np.float32))
            with mesh:
                out = fn(xs_g)
            return gather_global(mesh, out).astype(np.float64)[:n]
        with mesh:
            out = fn(jnp.asarray(xs, jnp.float32))
        return np.asarray(out, np.float64)[:n]

    return objective


def fmin(f: Callable[[np.ndarray], float], x0, sigma0=None, max_iter=None,
         **kw):
    """pints.fmin-style convenience wrapper around a scalar objective
    (used by the reference for hard tri-exp sub-fits, train-r1.py:555)."""
    x0 = np.asarray(x0, np.float64)
    sigma0 = sigma0 if sigma0 is not None else np.abs(x0) * 0.1 + 1e-3

    def batch(xs):
        return np.array([f(x) for x in xs])

    res = cmaes(batch, x0, sigma0, max_iterations=max_iter,
                log_transform=False, **kw)
    return res.x, res.fx
