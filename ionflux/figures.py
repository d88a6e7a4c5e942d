"""Figure/table replay helpers (layer L6; reference figure-*.py, table-*.py).

The reference's 13 figure scripts and 3 table scripts share a pattern
(figure-2.py:383-411): simulate ground truth + candidate + NN models per
protocol, cache the traces, then lay out multi-panel comparisons with zoom
insets.  This module provides those shared pieces; scripts/figure_*.py are
thin drivers.

Data caveat: where the reference drives simulations with the *recorded*
Beattie cell-5 protocol voltages (absent from the mount, SURVEY.md §1.1),
the replays run on the nominal step templates and are labelled "nominal
protocols".
"""

from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

from ionflux import protocols as P  # noqa: E402
from ionflux.eval import simulate  # noqa: E402
from ionflux.models.registry import Constants  # noqa: E402
from ionflux.observe import mae  # noqa: E402


def load_d_models(out_root: str):
    """The d-study model trio for figures/tables: fitted candidate (Mo) +
    trained NN-f (d1) and NN-d (d2) from out/ (figure-2.py:368-372)."""
    from ionflux.models.registry import HH_D0_FIT
    from ionflux.studies import D1, D2, load_study_params

    models = {"Original": ("hh", HH_D0_FIT, "C2--")}
    for spec, label, style in [(D1, "NN-f", "C0--"), (D2, "NN-d", "C1--")]:
        d = os.path.join(out_root, spec.name)
        if os.path.exists(os.path.join(d, "model.npz")):
            models[label] = (spec.model_kind, load_study_params(spec, d),
                             style)
        else:
            print(f"{label}: {d}/model.npz missing — run "
                  f"scripts/train_{spec.name}.py first")
    return models


def load_d_models_reference(refdir: str = "/root/reference"):
    """The same trio built from the REFERENCE's archived checkpoints
    (table-1.py:110-396): d0-fitted candidate + d1/d2 stored weights.
    Used for oracle parity tables against table-1/table-1.txt."""
    import jax.numpy as jnp_

    from ionflux.models.nn import NNdParams, NNfParams
    from ionflux.models.registry import HH_D0_FIT, HH_D0_INIT, HH_D2_BASE
    from ionflux.utils import load_mlp_state_dict

    def net(study):
        return [(jnp_.asarray(w), jnp_.asarray(b)) for w, b in
                load_mlp_state_dict(f"{refdir}/{study}/model-state-dict.pt")]

    return {
        "Original": ("hh", HH_D0_FIT, "C2--"),
        "NN-f": ("nnf", NNfParams(net=net("d1"), rgate=HH_D0_INIT), "C0--"),
        "NN-d": ("nnd", NNdParams(net=net("d2"), hh=HH_D2_BASE), "C1--"),
    }


def cached_sim(cache_dir: str, name: str, cached: bool, kind: str, params,
               proto: P.Protocol, ts, c: Constants, **kw) -> np.ndarray:
    """Simulate-with-npz-cache (the reference's --cached .pt caches,
    figure-2.py:402-411)."""
    os.makedirs(cache_dir, exist_ok=True)
    path = os.path.join(cache_dir, f"{name}.npz")
    if cached and os.path.exists(path):
        return np.load(path)["y"]
    y = np.asarray(simulate(kind, params, proto, jnp.asarray(ts, jnp.float32),
                            c, **kw), np.float64)
    np.savez(path, y=y)
    return y


def sweep_panel(ax, t, traces: dict, title: str = "", xlabel: str = "t (ms)",
                ylabel: str = "I (nA)", data_label: str | None = None):
    """One comparison panel: data in grey, models as dashed lines
    (reference plotting convention, train-s1.py:461-462)."""
    for label, (y, style) in traces.items():
        if label == data_label:
            ax.plot(t, y, c="#7f7f7f", lw=0.8, label=label)
        else:
            ax.plot(t, y, style, lw=1.0, label=label)
    if title:
        ax.set_title(title, fontsize=9)
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)


def zoom_inset(ax, t, traces: dict, xlim, ylim, loc=(0.55, 0.5, 0.42, 0.45)):
    """Zoom inset panel (the reference's GridSpec+PathPatch insets,
    figure-2.py:536-560)."""
    axin = ax.inset_axes(loc)
    for label, (y, style) in traces.items():
        c = "#7f7f7f" if style is None else None
        axin.plot(t, y, style or "-", c=c, lw=0.8)
    axin.set_xlim(*xlim)
    axin.set_ylim(*ylim)
    axin.tick_params(labelsize=6)
    ax.indicate_inset_zoom(axin, edgecolor="black", alpha=0.4)
    return axin


def mae_row(truth: np.ndarray, preds: dict) -> dict:
    """Per-model MAE vs a data trace (table-1.py:549-551: MAE, not RMSE)."""
    return {k: float(mae(jnp.asarray(v), jnp.asarray(truth)))
            for k, v in preds.items()}


def latex_table(path: str, header: list[str], rows: dict, caption: str = ""):
    """Write the reference's LaTeX-tabular text output
    (table-1.py:575-599)."""
    with open(path, "w") as fh:
        if caption:
            fh.write(f"% {caption}\n")
        fh.write("\\begin{tabular}{" + "l" + "c" * len(header) + "}\n")
        fh.write("\\hline\n")
        fh.write(" & " + " & ".join(header) + " \\\\\n\\hline\n")
        for name, vals in rows.items():
            cells = " & ".join(
                f"{v:.3f}" if isinstance(v, float) else str(v) for v in vals)
            fh.write(f"{name} & {cells} \\\\\n")
        fh.write("\\hline\n\\end{tabular}\n")
    with open(path) as fh:
        print(fh.read())


def surface_scatter_3d(path: str, v, a, dadt, net=None, nnd_base=None):
    """The reference's (V, a, da/dt) debug scatter with optional learned-
    surface overlay (train-s1.py:810-822 --debug; rates3d-*.png at :931-941).
    """
    import numpy as _np

    from mpl_toolkits import mplot3d  # noqa: F401

    fig = plt.figure(figsize=(6, 5))
    ax = plt.axes(projection="3d")
    ax.scatter(_np.asarray(v), _np.asarray(a), _np.asarray(dadt), s=1,
               alpha=0.4)
    if net is not None:
        from ionflux.models.hh import a_gate_rhs
        from ionflux.models.nn import nn_surface

        vv, aa = _np.meshgrid(_np.linspace(-130, 70, 50),
                              _np.linspace(0, 1, 50))
        zz = nn_surface(net, jnp.asarray(vv, jnp.float32),
                        jnp.asarray(aa, jnp.float32))
        if nnd_base is not None:
            zz = zz + a_gate_rhs(nnd_base, jnp.asarray(aa, jnp.float32),
                                 jnp.asarray(vv, jnp.float32))
        ax.plot_surface(vv, aa, _np.asarray(zz), color="C1", alpha=0.5)
    ax.set_xlabel("V (mV)")
    ax.set_ylabel("a")
    ax.set_zlabel("da/dt")
    fig.tight_layout()
    fig.savefig(path, dpi=170)
    plt.close(fig)
