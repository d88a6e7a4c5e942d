"""Variable-coefficient, variable-order Adams-Bashforth-Moulton (VCABM).

The reference's ``--method adams`` maps to torchdiffeq's VCABM (orders
1-12, adaptive step AND order); ``solver/adams.py`` covers the fixed-order
ABM4 fast path, this module the full variable-order capability.

TPU-native formulation (no incremental psi/beta recurrences, no
data-dependent shapes): the method is expressed directly in Newton
divided-difference form with EXACT Gauss-Legendre quadrature of the
interpolating polynomial —

  predictor  p    = y_n + sum_{j<k}   I_j  * dd_j      (explicit, order k)
  corrector  y_c  = y_n + sum_{j<=k}  I2_j * dd2_j     (implicit, order k+1)

where dd_j are the divided differences f[t_n, .., t_{n-j}] over the 13-deep
history ring (dd2 over the set extended with (t_{n+1}, f(t_{n+1}, p))), and
I_j = integral over [t_n, t_{n+1}] of the Newton basis prod_{i<j}(t - t_i),
evaluated exactly with 7-point Gauss-Legendre (exact to degree 13).  All
tables are fixed-shape [13] / [13, S] with order/history masks, so the whole
integrator is one ``lax.while_loop`` of straight-line code.

Error estimate: the Milne-style highest included term E_k = ||I2_k dd2_k||
(the difference between the order-k and order-(k+1) correctors); order
adaptation compares E_{k-1}, E_k, E_{k+1} after each accepted step.  The
method self-starts at k=1 (Euler predictor / trapezoid corrector) — no RK
starter needed — and order climbs one per accepted step on smooth segments.

Dense output is the corrector polynomial itself: each accepted step stores
(t_n, y_n, node times, masked dd2), and phase 2 integrates that polynomial
from t_n to each requested output time with the same quadrature — so the
interpolant carries the full method order (plain cubic Hermite would lose
accuracy on the large steps a 12th-order method takes).
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ionflux.solver.dopri5 import SolveStats, _initial_step

H = 13          # history depth: supports corrector orders up to 13 (k<=12)
K_MAX = 12      # max predictor order

# 7-point Gauss-Legendre on [-1, 1] — exact for degree <= 13
_GL_X = np.array([
    0.0,
    -0.4058451513773972, 0.4058451513773972,
    -0.7415311855993945, 0.7415311855993945,
    -0.9491079123427585, 0.9491079123427585,
])
_GL_W = np.array([
    0.4179591836734694,
    0.3818300505051189, 0.3818300505051189,
    0.2797053914892766, 0.2797053914892766,
    0.1294849661688697, 0.1294849661688697,
])


def _divided_diffs(tvec, fvec, n_valid, dtype):
    """Top-row Newton divided differences over (tvec, fvec) [H], [H, S].

    Returns dd [H, S] with dd[j] = f[t_0, ..., t_j] for j < n_valid and 0
    beyond (so masked sums are safe).  Entries of tvec past n_valid may hold
    arbitrary (even duplicate) padding — their denominators are masked.
    """
    h = tvec.shape[0]
    pos = jnp.arange(h)
    big = jnp.asarray(1.0, dtype)
    t_pad = jnp.concatenate([tvec, jnp.zeros((h,), dtype)])

    def step(j, carry):
        col, dd = carry
        t_sh = jax.lax.dynamic_slice_in_dim(t_pad, j, h)     # tvec[i+j]
        # each update consumes ADJACENT entries of the current column:
        # col_j[i] = (col_{j-1}[i] - col_{j-1}[i+1]) / (t_i - t_{i+j})
        c_sh = jnp.concatenate(
            [col[1:], jnp.zeros((1,) + col.shape[1:], dtype)])
        valid = (pos + j) < n_valid
        den = jnp.where(valid, tvec - t_sh, big)
        col = jnp.where(valid[:, None], (col - c_sh) / den[:, None], 0.0)
        dd = dd.at[j].set(col[0])
        return col, dd

    dd0 = jnp.zeros((h,) + fvec.shape[1:], dtype).at[0].set(fvec[0])
    col0 = jnp.where((pos < n_valid)[:, None], fvec, 0.0)
    _, dd = jax.lax.fori_loop(1, h, step, (col0, dd0))
    return dd


def _newton_integrals(t_from, t_to, tvec, dtype):
    """I_j = integral_{t_from}^{t_to} prod_{i<j} (t - tvec[i]) dt, j=0..H-1,
    by 7-point Gauss-Legendre (exact: integrand degree <= 12)."""
    glx = jnp.asarray(_GL_X, dtype)
    glw = jnp.asarray(_GL_W, dtype)
    half = (t_to - t_from) * 0.5
    tau = t_from + half * (glx + 1.0)                     # [7]
    diff = tau[:, None] - tvec[None, :]                   # [7, H]
    basis = jnp.cumprod(
        jnp.concatenate([jnp.ones((7, 1), dtype), diff[:, :H - 1]], axis=1),
        axis=1)                                           # [7, H]: prod_{i<j}
    return half * jnp.einsum("q,qj->j", glw, basis)       # [H]


@partial(jax.jit, static_argnums=(0,),
         static_argnames=("max_steps", "buffer_size", "return_stats"))
def odeint_vcabm(
    fn: Callable,
    y0: jnp.ndarray,
    ts: jnp.ndarray,
    args=None,
    *,
    rtol: float = 1e-6,
    atol: float = 1e-8,
    max_steps: int = 100_000,
    buffer_size: int = 8192,
    return_stats: bool = False,
):
    """Integrate dy/dt = fn(t, y, args); returns y at ``ts`` like odeint."""
    rhs = lambda t, y: fn(t, y, args)  # noqa: E731
    dtype = y0.dtype
    ts = ts.astype(dtype)
    t0, t_end = ts[0], ts[-1]
    s = y0.shape[0]
    rtol = jnp.asarray(rtol, dtype)
    atol = jnp.asarray(atol, dtype)
    big = jnp.asarray(jnp.finfo(dtype).max, dtype)
    nbuf = buffer_size
    h_min = jnp.maximum(t_end - t0, 1.0) * jnp.asarray(1e-12, dtype)
    jr = jnp.arange(H)

    # dense-output buffers: start time/state + the corrector polynomial
    buf_t = jnp.full((nbuf + 1,), big, dtype)
    buf_h = jnp.ones((nbuf + 1,), dtype)
    buf_y = jnp.zeros((nbuf + 1, s), dtype)
    buf_nodes = jnp.zeros((nbuf + 1, H), dtype)
    buf_dd = jnp.zeros((nbuf + 1, H, s), dtype)

    f0 = rhs(t0, y0)
    h0 = jnp.clip(_initial_step(rhs, t0, y0, f0, rtol, atol),
                  h_min * 1e3, (t_end - t0) / 16.0)

    ts_h0 = jnp.full((H,), t0, dtype) - jr.astype(dtype)  # distinct padding
    ts_h0 = ts_h0.at[0].set(t0)
    fs_h0 = jnp.zeros((H, s), dtype).at[0].set(f0)

    def body(state):
        (t, y, h, k, ts_h, fs_h, n_hist, n_acc, n_step, alive, bufs) = state
        h = jnp.minimum(h, t_end - t)
        t1 = t + h
        one = jnp.asarray(1.0, dtype)
        zero = jnp.asarray(0.0, dtype)

        # all abscissae in units of h relative to t: intermediates stay O(1)
        # for the well-spaced histories error control produces (raw divided
        # differences overflow f32 like 1/h^j at small absolute steps)
        th_rel = (ts_h - t) / h                            # [H], <= 0

        # after rejections shrink h, stale history sits at huge relative
        # distance and the Newton basis products overflow f32 — cap the
        # usable history (and hence order) to entries within 40 h, which
        # gracefully degrades toward the k=1 self-start
        within = jnp.abs(th_rel) <= 40.0
        n_eff = jnp.sum(jnp.cumprod(within.astype(jnp.int32))
                        ).astype(jnp.int32)
        n_use = jnp.maximum(jnp.minimum(n_hist, n_eff), 1)
        k = jnp.clip(k, 1, n_use).astype(jnp.int32)

        # predictor: order k over the history set
        ddp = _divided_diffs(th_rel, fs_h, n_use, dtype)
        ip = _newton_integrals(zero, one, th_rel, dtype)
        pmask = (jr < k).astype(dtype)
        y_p = y + h * jnp.einsum("j,js->s", ip * pmask, ddp)
        f_p = rhs(t1, y_p)

        # corrector: order k+1 over the set extended with (t1, f_p)
        ts2 = jnp.concatenate([one[None], th_rel[:H - 1]])
        fs2 = jnp.concatenate([f_p[None], fs_h[:H - 1]])
        n2 = jnp.minimum(n_use, H - 1) + 1
        dd2 = _divided_diffs(ts2, fs2, n2, dtype)
        i2 = _newton_integrals(zero, one, ts2, dtype)
        cmask = (jr <= k).astype(dtype)
        y_c = y + h * jnp.einsum("j,js->s", i2 * cmask, dd2)

        # Milne-style error terms E_j = ||h I2_j dd2_j / scale||
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_c))
        terms = h * i2[:, None] * dd2                      # [H, S]
        e = jnp.sqrt(jnp.mean((terms / scale[None]) ** 2, axis=-1))  # [H]
        err = e[k]
        finite = jnp.all(jnp.isfinite(y_c)) & jnp.isfinite(err)
        accept = (err <= 1.0) & finite

        # order adaptation (Shampine-style comparison of adjacent orders)
        e_km1 = jnp.where(k > 1, e[jnp.maximum(k - 1, 0)], jnp.inf)
        can_raise = (k < K_MAX) & (n2 > k + 1)  # needs dd2[k+1] valid
        e_kp1 = jnp.where(can_raise, e[jnp.minimum(k + 1, H - 1)], jnp.inf)
        k_up = accept & (e_kp1 < err) & (err <= e_km1)
        k_down = e_km1 < jnp.minimum(err, e_kp1)
        k_acc = jnp.clip(k + k_up.astype(jnp.int32)
                         - k_down.astype(jnp.int32), 1, K_MAX)
        # self-start ramp: grow order while history allows
        k_acc = jnp.where(n_use <= k, jnp.minimum(k + 1, K_MAX), k_acc)
        k_new = jnp.where(accept, k_acc, jnp.maximum(k - 1, 1))

        # step-size controller on the order-(k+1) error
        expo = 1.0 / (k.astype(dtype) + 1.0)
        factor = jnp.where(
            err > 0, 0.9 * err ** (-expo), jnp.asarray(5.0, dtype))
        factor = jnp.clip(factor, 0.2, 5.0)
        h_new = jnp.where(accept, h * factor,
                          h * jnp.minimum(factor, 0.5))
        h_new = jnp.where(finite, h_new, h * 0.1)
        h_new = jnp.maximum(h_new, h_min)

        # history push (PECE: final eval at the corrected state)
        f_c = rhs(t1, y_c)
        ts_h_new = jnp.concatenate([t1[None], ts_h[:H - 1]])
        fs_h_new = jnp.concatenate([f_c[None], fs_h[:H - 1]])

        # dense-output record: scaled corrector polynomial + its h
        idx = jnp.where(accept, n_acc, nbuf)
        bt, bh, by, bn, bd = bufs
        bufs = (bt.at[idx].set(t), bh.at[idx].set(h), by.at[idx].set(y),
                bn.at[idx].set(ts2),
                bd.at[idx].set(dd2 * cmask[:, None]))

        t_out = jnp.where(accept, t1, t)
        y_out = jnp.where(accept, y_c, y)
        ts_h = jnp.where(accept, ts_h_new, ts_h)
        fs_h = jnp.where(accept, fs_h_new, fs_h)
        n_hist2 = jnp.where(accept, jnp.minimum(n_hist + 1, H), n_hist)
        n_acc2 = n_acc + accept.astype(jnp.int32)
        n_step2 = n_step + 1

        dead = ((n_step2 >= max_steps) | (n_acc2 >= nbuf - 1)
                | (h_new <= h_min * 2) | ~jnp.isfinite(y_out).all())
        alive2 = alive & ~dead & (t_out < t_end - 1e-9 * jnp.abs(t_end))
        return (t_out, y_out, h_new, k_new, ts_h, fs_h, n_hist2, n_acc2,
                n_step2, alive2, bufs)

    def cond(state):
        return state[9]

    init = (t0, y0, h0, jnp.int32(1), ts_h0, fs_h0, jnp.int32(1),
            jnp.int32(0), jnp.int32(0), jnp.bool_(True),
            (buf_t, buf_h, buf_y, buf_nodes, buf_dd))
    (t, y, h, k, ts_h, fs_h, n_hist, n_acc, n_step, _alive,
     (bt, bhh, by, bn, bd)) = jax.lax.while_loop(cond, body, init)

    ok = (t >= t_end - 1e-6) & jnp.all(jnp.isfinite(y)) & (n_acc > 0)

    # phase 2: evaluate the stored corrector polynomials at the output grid
    idx = jnp.clip(jnp.searchsorted(bt, ts, side="right") - 1, 0,
                   jnp.maximum(n_acc - 1, 0))
    t_from = bt[idx]                                       # [T]
    h_rec = bhh[idx]                                       # [T]
    glx = jnp.asarray(_GL_X, dtype)
    glw = jnp.asarray(_GL_W, dtype)
    # scaled target: integrate the stored unit-scaled polynomial on
    # [0, (t_out - t_from)/h_rec], then multiply by h_rec; accepted records
    # tile [t0, t_end] contiguously so frac <= 1 up to float error — clamp
    # like dopri5's dense output
    frac = jnp.clip((ts - t_from) / h_rec, 0.0, 1.0)       # [T]
    half = frac * 0.5
    tau = half[:, None] * (glx + 1.0)[None, :]             # [T, 7]
    diff = tau[:, :, None] - bn[idx][:, None, :]           # [T, 7, H]
    ones = jnp.ones(diff.shape[:2] + (1,), dtype)
    basis = jnp.cumprod(
        jnp.concatenate([ones, diff[:, :, :H - 1]], axis=-1), axis=-1)
    integ = half[:, None] * jnp.einsum("q,tqj->tj", glw, basis)    # [T, H]
    ys = by[idx] + h_rec[:, None] * jnp.einsum("tj,tjs->ts", integ,
                                               bd[idx])
    ys = ys.at[0].set(y0)
    ys = jnp.where(ok, ys, jnp.full_like(ys, jnp.inf))
    if return_stats:
        return ys, SolveStats(ok=ok, n_accepted=n_acc, n_steps=n_step)
    return ys
