#!/usr/bin/env python
"""End-to-end neural-ODE training: fit NN-f directly to current traces by
backpropagating THROUGH the ODE solve.

The reference wires ``odeint_adjoint`` behind --adjoint (train-s1.py:29-32)
but its training never differentiates through a solve (SURVEY.md §3.2 note)
— it regresses on estimated derivative surfaces instead.  This script
exercises the capability properly: whole-trace MSE against (noisy) observed
currents, gradients via the continuous adjoint (--adjoint) or
backprop-through-RK4 (default), Adam updates.

Useful when derivative estimation is impractical (very noisy data, no
constant-voltage segments).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Direct neural-ODE training through the solver.")
parser.add_argument("--protocol", type=str, default="ap2hz")
args = parser.parse_args()
OUT = setup(args, "neural-ode")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.data import simulate_current  # noqa: E402
from ionflux.models import nnf_init, nnf_rhs  # noqa: E402
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import HH_B06, SYNTHETIC  # noqa: E402
from ionflux.observe import add_noise, gate_current, mae  # noqa: E402
from ionflux.fit import pretrain  # noqa: E402
from ionflux.solver import odeint_adjoint, odeint_rk4  # noqa: E402
from ionflux.utils.ckpt import save_pytree  # noqa: E402

REFDIR = "/root/reference"

proto = (P.load_csv(f"{REFDIR}/test-protocols/ap2hz.csv")
         if args.protocol == "ap2hz"
         else P.activation_protocol(20.0, dt_ms=1.0))
T_END = float(proto.duration)
ts = jnp.linspace(0.0, min(T_END, 3000.0), 301, dtype=jnp.float32)
y0 = jnp.array([0.0, 1.0], jnp.float32)

# synthetic observations from the HH ground truth
truth = simulate_current(HH_B06, proto, ts, SYNTHETIC)
data = add_noise(jax.random.PRNGKey(0), truth)
v_t = P.voltage(proto, ts)


def rhs(t, y, params):
    return nnf_rhs(params, t, y, P.voltage(proto, t))


def loss_fn(params):
    if args.adjoint:
        ys = odeint_adjoint(rhs, y0, ts, params, 1e-4, 1e-6)
    else:
        ys = odeint_rk4(rhs, y0, ts, params, n_sub=8)
    i_sim = gate_current(ys, v_t, SYNTHETIC)
    return jnp.mean((i_sim - data) ** 2)


params = nnf_init(jax.random.PRNGKey(0), HH_B06)
net = pretrain(params.net, HH_B06, kind="s", iters=500).params
params = NNfParams(net=net, rgate=params.rgate)

opt = optax.adam(3e-4)
opt_state = opt.init(params.net)


@jax.jit
def step(net, opt_state):
    l, g = jax.value_and_grad(
        lambda n: loss_fn(NNfParams(net=n, rgate=params.rgate)))(net)
    updates, opt_state = opt.update(g, opt_state, net)
    return optax.apply_updates(net, updates), opt_state, l


iters = args.iters or 200
net = params.net
for it in range(iters):
    net, opt_state, l = step(net, opt_state)
    if it % max(1, iters // 10) == 0:
        print(f"iter {it:4d} | trace MSE {float(l):.6f}")

params = NNfParams(net=net, rgate=params.rgate)
if args.adjoint:
    ys = odeint_adjoint(rhs, y0, ts, params, 1e-4, 1e-6)
else:
    ys = odeint_rk4(rhs, y0, ts, params, n_sub=8)
final_mae = float(mae(gate_current(ys, v_t, SYNTHETIC), truth))
print(f"final | trace MSE {float(l):.6f} | MAE vs clean truth "
      f"{final_mae:.4f} (noise floor ~0.08)")
save_pytree(os.path.join(OUT, "model.npz"), params)
