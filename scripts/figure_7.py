#!/usr/bin/env python
"""Figure 7: (V, a)-plane coverage of the r1-bad model (paper Fig. 9) — the
unidentifiability picture.  Panel A: the a-gate trajectories the Pr3+Pr4
training protocols explore; panel B: adds Pr5 (yellow), whose -70..-40 mV
test segments (red) probe the region the training data never visited.
Reference figure-7.py:377-464 on the reconstructed real protocols.

Note: with the archived r1-bad weights the a-trajectory leaves [0, 1]
(a reaches 2.3 in the unseen -60..-40 mV tests) and differs from the stored
figure-7/a1-pr4.pt by up to 0.28 even at f64/rtol=1e-8 — our solve is
tolerance-converged (f32 1e-6 == f64 1e-8 to 5 decimals), so this is the
pathological net's genuine sensitivity outside its training hull, which is
exactly the failure the figure illustrates."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import setup, study_parser  # noqa: E402

parser = study_parser("Figure 7: r1-bad coverage analysis.")
parser.add_argument("--oracle", action="store_true",
                    help="use the reference's archived r1-bad weights")
args = parser.parse_args()
OUT = setup(args, "figure-7")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import matplotlib  # noqa: E402

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protorec  # noqa: E402
from ionflux.eval import solve_states_long  # noqa: E402
from ionflux.models.nn import NNfParams  # noqa: E402
from ionflux.models.registry import HH_R1BAD_INIT  # noqa: E402
from ionflux.rstudies import R1BAD, init_params  # noqa: E402
from ionflux.utils.ckpt import load_pytree  # noqa: E402
from ionflux.utils.ptload import load_mlp_state_dict  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFDIR = "/root/reference"

if args.oracle or not os.path.exists(
        os.path.join(REPO, "out", "r1-bad", "model.npz")):
    params = NNfParams(
        net=[(jnp.asarray(w), jnp.asarray(b)) for w, b in
             load_mlp_state_dict(f"{REFDIR}/r1-bad/model-state-dict.pt")],
        rgate=HH_R1BAD_INIT)
else:
    # final model, as the reference's analysis uses (not the validation best)
    params = load_pytree(os.path.join(REPO, "out", "r1-bad", "model.npz"),
                         init_params(R1BAD))


def a_traj(name):
    cache = os.path.join(OUT, f"a1-{name}{'-o' if args.oracle else ''}.npz")
    if args.cached and os.path.exists(cache):
        return np.load(cache)["a"]
    a = np.asarray(solve_states_long("nnf", params, f"{name}-cell5",
                                     jnp.array([0.0, 1.0], jnp.float32)))[:, 0]
    np.savez(cache, a=a)
    return a


def plot_cov(ax, name, alpha, v_shift=0.0, red_tests=()):
    v, _ = protorec.load_voltage(f"{name}-cell5")
    a = a_traj(name)
    bounds = np.concatenate([np.flatnonzero(np.diff(v) != 0) + 1, [len(v)]])
    i = 0
    first = True
    for f in bounds:
        seg_v = v[i]
        red = (f - i > 10000) and any(abs(seg_v - tv) < 0.5
                                      for tv in red_tests)
        color = "C3" if red else ("#deb466" if name == "pr5"
                                  else "#878ad4")
        ax.plot(v[i:f] + v_shift, a[i:f], alpha=0.95 * alpha, color=color,
                label="__nolegend__" if not first else name.capitalize())
        ax.scatter(v[i] + v_shift, a[i], alpha=alpha, color=color,
                   marker=".")
        ax.scatter(v[f - 1] + v_shift, a[f - 1], alpha=alpha, color=color,
                   marker=".")
        first = False
        i = f


fig, axes = plt.subplots(1, 2, sharey=True, figsize=(9, 3.5))
for name in ("pr3", "pr4"):
    plot_cov(axes[0], name, 1.0, v_shift=-0.6)
    plot_cov(axes[1], name, 0.3, v_shift=-0.6)
plot_cov(axes[1], "pr5", 1.0, v_shift=+0.6,
         red_tests=(-70.0, -60.0, -50.0, -40.0))

# steady-state envelope annotation (figure-7.py:440-448)
y1 = [0.005, 0.354, 0.549, 0.822, 0.995, 0.995]
x1 = [-120, -100, -90, -80, -60, 20]
y2 = [0.005, 0.005, 0.005, 0.005, 0.01, 0.075, 0.243, 0.651, 0.995]
x2 = [-120, -100, -90, -80, -60, -40, -20, 0, 20]
axes[0].plot(x1, y1, "--", c="#7f7f7f", alpha=0.5)
axes[0].plot(x2, y2, "--", c="#7f7f7f", alpha=0.5)
axes[1].plot(x1, y1, "--", c="#7f7f7f", alpha=0.25)
axes[1].plot(x2, y2, "--", c="#7f7f7f", alpha=0.25)

axes[0].set_ylabel(r"$a$")
for k, ax in enumerate(axes):
    ax.set_xlabel(r"$V$ (mV)")
    ax.set_ylim(0, 1)
    ax.text(-0.1 if k == 0 else -0.025, 1.05, f"({chr(65 + k)})", size=12,
            weight="bold", va="bottom", ha="right", transform=ax.transAxes)

plt.tight_layout()
plt.savefig(os.path.join(OUT, "fig7.png"), pad_inches=0.02, dpi=200,
            bbox_inches="tight")
print(f"wrote {OUT}/fig7.png")
