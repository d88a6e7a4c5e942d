"""Synthetic study data generation (reference train-s1.py:556-595,
train-d1.py:531-570) with exact noise parity.

The reference seeds ``np.random.seed(0)`` and draws one
``normal(0, 0.1, t.shape)`` per training protocol in a fixed order
(7 activation sweeps then 9 deactivation sweeps).  ``noise_sequence``
reproduces those draws bit-exactly via the legacy RandomState so cached
reference surfaces (s1/v.pt ...) can be matched numerically.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.models import hh_rhs, markov_rhs, MARKOV_Y0_REST
from ionflux.models.registry import Constants, MarkovParams, SYNTHETIC
from ionflux.observe import NOISE_SIGMA, gate_current, markov_current
from ionflux.solver import odeint

Y0_REST = np.array([0.0, 1.0], np.float32)


def _rhs_hh(t, y, args):
    return hh_rhs(args[0], t, y, P.voltage(args[1], t))


def _rhs_markov(t, y, args):
    return markov_rhs(args[0], t, y, P.voltage(args[1], t))


def simulate_current(params, proto: P.Protocol, ts: jnp.ndarray,
                     c: Constants = SYNTHETIC, rtol=1e-6, atol=1e-8):
    """Ground-truth current for an HH (2-state) or Markov (6-state) model."""
    v = P.voltage(proto, ts)
    if isinstance(params, MarkovParams):
        y0 = jnp.asarray(MARKOV_Y0_REST, ts.dtype)
        ys = odeint(_rhs_markov, y0, ts, (params, proto), rtol=rtol, atol=atol)
        return markov_current(ys, v, c)
    y0 = jnp.asarray(Y0_REST, ts.dtype)
    ys = odeint(_rhs_hh, y0, ts, (params, proto), rtol=rtol, atol=atol)
    return gate_current(ys, v, c)


def simulate_family(params, protos: list[P.Protocol], ts: jnp.ndarray,
                    c: Constants = SYNTHETIC, vmapped: bool = False):
    """Ground-truth currents for a same-length protocol family [B, T].

    Default is a sequential loop sharing ONE compiled solve — for offline
    data generation a vmap(while_loop) pays a disproportionate XLA compile
    cost; pass vmapped=True for hot paths that amortize it.
    """
    if vmapped:
        b = P.stack(protos)
        return jax.vmap(lambda pr: simulate_current(params, pr, ts, c))(b)
    return jnp.stack([simulate_current(params, pr, ts, c) for pr in protos])


def noise_sequence(shapes, sigma: float = NOISE_SIGMA, seed: int = 0):
    """The reference's exact noise draws: np.random.seed(seed) then one
    normal(0, sigma, shape) per protocol in order (train-s1.py:37, 572)."""
    rs = np.random.RandomState(seed)
    return [rs.normal(0.0, sigma, s) for s in shapes]


def synth_study_currents(gt_params, act_ts, deact_ts,
                         c: Constants = SYNTHETIC, seed: int = 0):
    """Noisy training currents for the 7+9 step-protocol sweeps, matching
    the reference's generation order and RNG stream.

    Returns (act_currents [7, T1], deact_currents [9, T2]) as numpy f64.
    """
    act = np.asarray(
        simulate_family(gt_params, P.activation_family(), act_ts, c), np.float64)
    deact = np.asarray(
        simulate_family(gt_params, P.deactivation_family(), deact_ts, c), np.float64)
    noises = noise_sequence([act_ts.shape] * act.shape[0]
                            + [deact_ts.shape] * deact.shape[0], seed=seed)
    for k in range(act.shape[0]):
        act[k] += noises[k]
    for k in range(deact.shape[0]):
        deact[k] += noises[act.shape[0] + k]
    return act, deact
