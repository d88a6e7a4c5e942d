"""Second-order scalar-ODE reduction of the 3-state Markov a-gate.

State (a, u=da/dt) with du/dt = -K1*a - K2*u + K3, where K1..K3 derive from
the Markov rates a1, b1, a2, b2.  Used only for the phase-portrait figures.

Reference definition: class ``GroundTruth_a`` (figure-1.py:72-118).
"""

from __future__ import annotations

import jax.numpy as jnp

from ionflux.models.registry import MarkovParams


def gt_a_coeffs(p: MarkovParams, v: jnp.ndarray):
    """K1, K2, K3 of the reduced 2nd-order a-gate ODE (figure-1.py:100-110)."""
    a1 = p.p1 * jnp.exp(p.p2 * v)
    b1 = p.p3 * jnp.exp(-p.p4 * v)
    a2 = p.p9 * jnp.exp(p.p10 * v)
    b2 = p.p11 * jnp.exp(-p.p12 * v)
    k1 = a1 * a2 + a1 * b2 + b1 * b2
    k2 = a1 + b1 + a2 + b2
    k3 = a1 * a2
    return k1, k2, k3


def gt_a_rhs(p: MarkovParams, t, y: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """d[a, u]/dt with u = da/dt (figure-1.py:112-118). y: [..., 2]."""
    a = y[..., 0]
    u = y[..., 1]
    k1, k2, k3 = gt_a_coeffs(p, v)
    return jnp.stack([u, -k1 * a - k2 * u + k3], axis=-1)
