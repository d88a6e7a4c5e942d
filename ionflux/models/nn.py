"""Neural-ODE gate models: NN-f (full) and NN-d (discrepancy).

- NN-f replaces da/dt entirely with an MLP: dadt = net([V/vrange, a]) / netscale
  (reference class ``ODEFunc``, train-s1.py:181-247).
- NN-d adds the MLP as a correction to the analytic HH rate:
  dadt = hh_dadt(a, V) + net([V/vrange, a]) / netscale
  (reference ``ODEFunc`` with ``_dadt``, train-s2.py:180-259).

The MLP is a plain pytree (list of (W, b)) with LeakyReLU activations —
default architecture 2 -> 200 x 6 hidden -> 1 (train-s1.py:186-200), and a
configurable (n_layers, n_nodes) variant for the architecture sweep
(train-r1-tune.py / table-s1.py:142-156, architectures/sNN.py).

Weight init: N(0, std^2), bias 0 (train-s1.py:202-205); std = 0.1 for NN-f,
1e-3 for NN-d (train-s2.py:203).

TPU notes: ``mlp_apply`` broadcasts over arbitrary leading batch dims, so a
vmapped/batched solve turns the per-RHS-eval MLP into [B, 200] x [200, 200]
matmuls that tile onto the MXU. Weights total ~0.8 MB (f32) — small enough to
stay VMEM-resident inside a fused Pallas solve kernel.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from ionflux.models.hh import a_gate_rhs, r_gate_rhs
from ionflux.models.registry import HHParams, NETSCALE, VRANGE

LEAKY_SLOPE = 0.01  # torch nn.LeakyReLU default negative_slope


def mlp_sizes(n_layers: int = 5, n_nodes: int = 200) -> list[int]:
    """Layer sizes for the sweep convention: Linear(2,n) + n_layers x
    Linear(n,n) + Linear(n,1) (table-s1.py:142-156)."""
    return [2] + [n_nodes] * (n_layers + 1) + [1]


def mlp_init(key: jax.Array, sizes: Sequence[int], std: float = 0.1):
    """List of (W [in,out], b [out]) with N(0, std^2) weights, zero bias."""
    params = []
    for d_in, d_out in zip(sizes[:-1], sizes[1:]):
        key, sub = jax.random.split(key)
        w = std * jax.random.normal(sub, (d_in, d_out), dtype=jnp.float32)
        b = jnp.zeros((d_out,), dtype=jnp.float32)
        params.append((w, b))
    return params


def mlp_apply(params, x: jnp.ndarray) -> jnp.ndarray:
    """LeakyReLU MLP. x: [..., d_in] -> [..., d_out]."""
    for w, b in params[:-1]:
        x = x @ w + b
        x = jnp.where(x >= 0, x, LEAKY_SLOPE * x)
    w, b = params[-1]
    return x @ w + b


class NNfParams(NamedTuple):
    """NN-f: learned a-gate MLP + fixed analytic r-gate (p5-p8)."""

    net: list
    rgate: HHParams  # only p5-p8 are used


class NNdParams(NamedTuple):
    """NN-d: analytic HH a-gate (p1-p4) + MLP correction + r-gate (p5-p8)."""

    net: list
    hh: HHParams


def nnf_init(key: jax.Array, rgate: HHParams, n_layers: int = 5,
             n_nodes: int = 200, std: float = 0.1) -> NNfParams:
    return NNfParams(net=mlp_init(key, mlp_sizes(n_layers, n_nodes), std), rgate=rgate)


def nnd_init(key: jax.Array, hh: HHParams, n_layers: int = 5,
             n_nodes: int = 200, std: float = 1e-3) -> NNdParams:
    return NNdParams(net=mlp_init(key, mlp_sizes(n_layers, n_nodes), std), hh=hh)


def nn_surface(net, v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """da/dt predicted by the MLP on raw (V, a): net([V/100, a]) / 1000
    (train-s1.py:245). Broadcasts over leading dims of v/a."""
    x = jnp.stack([v / VRANGE, a], axis=-1)
    return mlp_apply(net, x)[..., 0] / NETSCALE


def nnd_surface(p: NNdParams, v: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    """NN-d total da/dt surface: analytic HH + MLP correction
    (train-s2.py:254-257)."""
    return a_gate_rhs(p.hh, a, v) + nn_surface(p.net, v, a)


def nnf_rhs(p: NNfParams, t, y: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """NN-f d[a, r]/dt (train-s1.py:231-247). y: [..., 2], v: [...]."""
    a = y[..., 0]
    r = y[..., 1]
    dadt = nn_surface(p.net, v, a)
    drdt = r_gate_rhs(p.rgate, r, v)
    return jnp.stack([dadt, drdt], axis=-1)


def nnd_rhs(p: NNdParams, t, y: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """NN-d d[a, r]/dt (train-s2.py:244-259). y: [..., 2], v: [...]."""
    a = y[..., 0]
    r = y[..., 1]
    dadt = nnd_surface(p, v, a)
    drdt = r_gate_rhs(p.hh, r, v)
    return jnp.stack([dadt, drdt], axis=-1)
