"""3-state Markov ground-truth model (6 ODE variables c1, c2, i, ic1, ic2, o).

Reference definition: class ``Lambda`` in train-d0.py:72-125 /
train-d1.py:134-187.  The observable current uses the open state:
I = o * (V - E)  (train-d1.py:546).
"""

from __future__ import annotations

import jax.numpy as jnp

from ionflux.models.registry import MarkovParams

# Initial conditions (train-d1.py:117-118): holding at -80 mV puts the channel
# in c2; holding at +40 mV in the inactivated state i. Host-side numpy so
# module import never touches a backend.
import numpy as _np

MARKOV_Y0_REST = _np.array([0.0, 1.0, 0.0, 0.0, 0.0, 0.0], dtype=_np.float32)
MARKOV_Y0_INACT = _np.array([0.0, 0.0, 1.0, 0.0, 0.0, 0.0], dtype=_np.float32)


def markov_rates(p: MarkovParams, v: jnp.ndarray):
    """a1,b1,bh,ah,a2,b2 (train-d1.py:173-178)."""
    a1 = p.p1 * jnp.exp(p.p2 * v)
    b1 = p.p3 * jnp.exp(-p.p4 * v)
    bh = p.p5 * jnp.exp(p.p6 * v)
    ah = p.p7 * jnp.exp(-p.p8 * v)
    a2 = p.p9 * jnp.exp(p.p10 * v)
    b2 = p.p11 * jnp.exp(-p.p12 * v)
    return a1, b1, bh, ah, a2, b2


def markov_rhs(p: MarkovParams, t, y: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """d[c1,c2,i,ic1,ic2,o]/dt (train-d1.py:180-187). y: [..., 6]."""
    c1 = y[..., 0]
    c2 = y[..., 1]
    i = y[..., 2]
    ic1 = y[..., 3]
    ic2 = y[..., 4]
    o = y[..., 5]
    a1, b1, bh, ah, a2, b2 = markov_rates(p, v)
    dc1 = a1 * c2 + ah * ic1 + b2 * o - (b1 + bh + a2) * c1
    dc2 = b1 * c1 + ah * ic2 - (a1 + bh) * c2
    di = a2 * ic1 + bh * o - (b2 + ah) * i
    dic1 = a1 * ic2 + bh * c1 + b2 * i - (b1 + ah + a2) * ic1
    dic2 = b1 * ic1 + bh * c2 - (ah + a1) * ic2
    do = a2 * c1 + ah * i - (b2 + bh) * o
    return jnp.stack([dc1, dc2, di, dic1, dic2, do], axis=-1)
