"""Derivative-surface training (layer L5): optax Adam + StepLR-equivalent.

Reference training loop (train-s1.py:890-912, train-r1.py:917-960):
  - loss: sum-of-squares on the (V/vrange, a) -> da/dt surface
    (torch MSELoss(reduction='sum'))
  - Adam(lr=1e-3) + StepLR(gamma=0.9, step_size=100 synthetic / 400 real)
  - pretrain stage: 1000 Adam iters towards a (shifted) analytic HH surface
    on a 50x50 (s-studies, train-s1.py:836-870) or 100x100 grid (r-studies,
    train-r1.py:840-877)
  - NN-d trains the MLP on the residual: pred = net(x)/netscale + hh_dadt
    (train-s2.py:854-857)

TPU-first: the whole iteration loop is one ``lax.scan`` inside jit — one
compile, then the MXU chews the [N, 200] x [200, 200] matmuls; no per-iter
Python dispatch (the reference pays ~10^4 Python/torch dispatches per run).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from ionflux.models.hh import a_gate_rhs
from ionflux.models.nn import mlp_apply
from ionflux.models.registry import HHParams, NETSCALE, VRANGE


class TrainResult(NamedTuple):
    params: list  # trained MLP params
    losses: jnp.ndarray  # per-iteration loss trace


def _make_optimizer(lr: float, step_size: int | None, gamma: float):
    if step_size is None:
        return optax.adam(lr)
    schedule = optax.exponential_decay(
        init_value=lr, transition_steps=step_size, decay_rate=gamma,
        staircase=True,
    )
    return optax.adam(schedule)


def surface_loss(net, x: jnp.ndarray, y: jnp.ndarray,
                 residual: jnp.ndarray | None = None,
                 anchors=None) -> jnp.ndarray:
    """Sum-of-squares loss on the derivative surface.

    x: [N, 2] = (V/vrange, a); y: [N] target da/dt; residual: [N] added to
    the MLP prediction (the NN-d analytic part, train-s2.py:854-857).

    anchors: optional (x_a, y_a, weight) boundary-anchor regulariser — the
    training surface leaves a >= 1 (and a <= 0) unconstrained, and nets whose
    extrapolation there runs away destabilise whole-trace solves for most
    init seeds (the reference's torch init happened to land on a stable
    draw).  Anchoring the raw MLP output towards y_a on an out-of-hull grid
    removes the seed lottery; off by default for reference parity.
    """
    pred = mlp_apply(net, x)[..., 0] / NETSCALE
    if residual is not None:
        pred = pred + residual
    loss = jnp.sum((pred - y) ** 2)
    if anchors is not None:
        x_a, y_a, w = anchors
        pred_a = mlp_apply(net, x_a)[..., 0] / NETSCALE
        loss = loss + w * jnp.sum((pred_a - y_a) ** 2)
    return loss


@partial(jax.jit, static_argnames=("iters", "lr", "step_size", "gamma"))
def _fit_chunk(net, opt_state, x, y, residual, anchors, *, iters, lr,
               step_size, gamma):
    """`iters` Adam steps as one scanned jit, resuming from opt_state."""
    opt = _make_optimizer(lr, step_size, gamma)

    def step(carry, _):
        params, state = carry
        loss, grads = jax.value_and_grad(surface_loss)(params, x, y,
                                                       residual, anchors)
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)
        return (params, state), loss

    (net, opt_state), losses = jax.lax.scan(
        step, (net, opt_state), None, length=iters)
    return net, opt_state, losses


def init_opt_state(net, lr: float = 1e-3, step_size: int | None = 100,
                   gamma: float = 0.9):
    return _make_optimizer(lr, step_size, gamma).init(net)


def fit_chunk(net, opt_state, x, y, residual=None, anchors=None, *,
              iters: int, lr: float = 1e-3, step_size: int | None = 100,
              gamma: float = 0.9):
    """Resumable training chunk — the building block for the reference's
    validate-every-400-iters loop (train-r1.py:920-959)."""
    return _fit_chunk(net, opt_state, x, y, residual, anchors, iters=iters,
                      lr=lr, step_size=step_size, gamma=gamma)


def fit_surface(
    net,
    x: jnp.ndarray,
    y: jnp.ndarray,
    residual: jnp.ndarray | None = None,
    anchors=None,
    *,
    iters: int = 4000,
    lr: float = 1e-3,
    step_size: int | None = 100,
    gamma: float = 0.9,
) -> TrainResult:
    """Full-batch Adam on the surface regression, as one scanned jit."""
    opt_state = init_opt_state(net, lr, step_size, gamma)
    net, _, losses = _fit_chunk(net, opt_state, x, y, residual, anchors,
                                iters=iters, lr=lr, step_size=step_size,
                                gamma=gamma)
    return TrainResult(params=net, losses=losses)


# ---------------------------------------------------------------------------
# Pretrain target surfaces
# ---------------------------------------------------------------------------


def pretrain_grid_s(p: HHParams, n: int = 50):
    """The s/d-study pretrain grid: V in [-140, 80], a in [0, 1], target =
    shifted analytic HH surface (k1*0.9, k2*1.1) (train-s1.py:840-847)."""
    v = jnp.linspace(-140.0, 80.0, n, dtype=jnp.float32)
    a = jnp.linspace(0.0, 1.0, n, dtype=jnp.float32)
    vv, aa = jnp.meshgrid(v, a, indexing="ij")
    k1 = p.p1 * jnp.exp(p.p2 * vv) * 0.9
    k2 = p.p3 * jnp.exp(-p.p4 * vv) * 1.1
    yy = k1 * (1.0 - aa) - k2 * aa
    x = jnp.stack([vv.reshape(-1) / VRANGE, aa.reshape(-1)], axis=-1)
    return x, yy.reshape(-1)


def pretrain_grid_r(p: HHParams, n: int = 100):
    """The r-study pretrain grid: V in [-140, 80], a in [-0.5, 1.5], exact
    analytic surface from the initial-guess p1-p4 (train-r1.py:844-855)."""
    v = jnp.linspace(-140.0, 80.0, n, dtype=jnp.float32)
    a = jnp.linspace(-0.5, 1.5, n, dtype=jnp.float32)
    vv, aa = jnp.meshgrid(v, a, indexing="ij")
    yy = a_gate_rhs(p, aa, vv)
    x = jnp.stack([vv.reshape(-1) / VRANGE, aa.reshape(-1)], axis=-1)
    return x, yy.reshape(-1)


def pretrain(net, p: HHParams, kind: str = "s", iters: int = 1000,
             lr: float = 1e-3) -> TrainResult:
    """1000-iter Adam pretrain towards the analytic surface
    (train-s1.py:852-858)."""
    if kind == "s":
        x, y = pretrain_grid_s(p)
    elif kind == "r":
        x, y = pretrain_grid_r(p)
    else:
        raise ValueError(kind)
    return fit_surface(net, x, y, iters=iters, lr=lr, step_size=None)


def boundary_anchors(base: HHParams | None, weight: float = 1.0,
                     n_v: int = 45, n_a: int = 12):
    """Out-of-hull anchor grid for the boundary-anchor regulariser.

    The training surface only covers a in (0, 1); anchor the raw MLP output
    on V in [-140, 80] x a in [-0.5, 0] u [1, 1.5] towards the analytic
    surface (NN-f: base HH rates; NN-d and r-study residual nets: 0, i.e.
    the model falls back to its analytic part there).  Mirrors the tiny-init
    intent of train-s2.py:203 but holds for any init seed.
    """
    v = jnp.linspace(-140.0, 80.0, n_v, dtype=jnp.float32)
    # keep a margin from the training hull (a in (0,1)) so the anchor tames
    # extrapolation without biasing the fit at the data boundary
    a = jnp.concatenate([
        jnp.linspace(-0.5, -0.08, n_a // 2, dtype=jnp.float32),
        jnp.linspace(1.08, 1.5, n_a - n_a // 2, dtype=jnp.float32),
    ])
    vv, aa = jnp.meshgrid(v, a, indexing="ij")
    x = jnp.stack([vv.reshape(-1) / VRANGE, aa.reshape(-1)], axis=-1)
    if base is None:
        y = jnp.zeros(x.shape[0], jnp.float32)
    else:
        y = a_gate_rhs(base, x[:, 1], x[:, 0] * VRANGE)
    return x, y, jnp.asarray(weight, jnp.float32)
