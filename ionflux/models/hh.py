"""Candidate Hodgkin-Huxley IKr model (2 states: a activation, r recovery).

Reference definition: class ``Lambda`` (train-s1.py:134-177) and the
parametrised d0 candidate ``ODEFunc`` (train-d0.py:321-374).

All functions are pure and broadcast over arbitrary leading batch dims:
``y`` has shape [..., 2], ``v`` shape [...].
"""

from __future__ import annotations

import jax.numpy as jnp

from ionflux.models.registry import HHParams


def hh_rates(p: HHParams, v: jnp.ndarray):
    """Voltage-dependent rates k1..k4 (train-s1.py:169-172)."""
    k1 = p.p1 * jnp.exp(p.p2 * v)
    k2 = p.p3 * jnp.exp(-p.p4 * v)
    k3 = p.p5 * jnp.exp(p.p6 * v)
    k4 = p.p7 * jnp.exp(-p.p8 * v)
    return k1, k2, k3, k4


def hh_rhs(p: HHParams, t, y: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """d[a, r]/dt (train-s1.py:174-175). y: [..., 2], v: [...]."""
    a = y[..., 0]
    r = y[..., 1]
    k1, k2, k3, k4 = hh_rates(p, v)
    dadt = k1 * (1.0 - a) - k2 * a
    drdt = -k3 * r + k4 * (1.0 - r)
    return jnp.stack([dadt, drdt], axis=-1)


def a_gate_rhs(p: HHParams, a: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """da/dt alone — the analytic surface targeted by NN pretraining
    (train-s1.py:845-847) and the NN-d base rate (train-s2.py:234-237)."""
    k1 = p.p1 * jnp.exp(p.p2 * v)
    k2 = p.p3 * jnp.exp(-p.p4 * v)
    return k1 * (1.0 - a) - k2 * a


def r_gate_rhs(p: HHParams, r: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """dr/dt alone — the always-known recovery gate (train-s1.py:240-243)."""
    k3 = p.p5 * jnp.exp(p.p6 * v)
    k4 = p.p7 * jnp.exp(-p.p8 * v)
    return -k3 * r + k4 * (1.0 - r)


def hh_steady_state(p: HHParams, v: jnp.ndarray) -> jnp.ndarray:
    """Analytic steady state [a_inf, r_inf] at constant voltage —
    correctness anchor for solver tests (no reference counterpart)."""
    k1, k2, k3, k4 = hh_rates(p, v)
    return jnp.stack([k1 / (k1 + k2), k4 / (k3 + k4)], axis=-1)


def hh_time_constants(p: HHParams, v: jnp.ndarray) -> jnp.ndarray:
    """Analytic relaxation time constants [tau_a, tau_r] at constant V."""
    k1, k2, k3, k4 = hh_rates(p, v)
    return jnp.stack([1.0 / (k1 + k2), 1.0 / (k3 + k4)], axis=-1)
