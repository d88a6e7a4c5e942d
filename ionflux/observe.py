"""Current observation and measurement-noise injection.

I(t) = g * a(t) * r(t) * (V(t) - E)   for 2-state gate models
       (train-s1.py:571; constants in registry.Constants)
I(t) = o(t) * (V(t) - E)              for the 6-state Markov ground truth
       (train-d1.py:546: observed via the open state)

Noise: additive N(0, sigma^2), sigma = 0.1 nA (train-s1.py:40, 572) — here
with explicit PRNG keys instead of global numpy state.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ionflux.models.registry import Constants

NOISE_SIGMA = 0.1


def gate_current(y: jnp.ndarray, v: jnp.ndarray, c: Constants) -> jnp.ndarray:
    """I = g * a * r * (V - E). y: [..., 2] -> [...]."""
    return c.g * y[..., 0] * y[..., 1] * (v - c.e)


def markov_current(y: jnp.ndarray, v: jnp.ndarray, c: Constants) -> jnp.ndarray:
    """I = g * o * (V - E) for the 6-state Markov model (o is state -1)."""
    return c.g * y[..., -1] * (v - c.e)


def add_noise(key: jax.Array, i: jnp.ndarray, sigma: float = NOISE_SIGMA) -> jnp.ndarray:
    return i + sigma * jax.random.normal(key, i.shape, dtype=i.dtype)


def mae(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Mean absolute error — the reference's canonical metric
    (table-1.py:549-551; RMSE variant commented out there)."""
    return jnp.mean(jnp.abs(a - b))


def rmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.sqrt(jnp.mean((a - b) ** 2))
