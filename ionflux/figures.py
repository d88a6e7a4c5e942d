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


# ---------------------------------------------------------------------------
# Reference-grade composition (figure-2.py:556-821, figure-3.py:584-900):
# voltage/current panels with sweep overlays + zoom panels with PathPatch
# shading and arrow scale-bars.
# ---------------------------------------------------------------------------

#: Set2 palette facecolors for zoom shading (figure-2.py:546-549), computed
#: without a seaborn import (sns.color_palette("Set2") values).
SET2 = [(0.4, 0.7607843137254902, 0.6470588235294118),
        (0.9882352941176471, 0.5529411764705883, 0.3843137254901961),
        (0.5529411764705883, 0.6274509803921569, 0.796078431372549),
        (0.9058823529411765, 0.5411764705882353, 0.7647058823529411),
        (0.6509803921568628, 0.8470588235294118, 0.32941176470588235),
        (1.0, 0.8509803921568627, 0.1843137254901961)]

MODEL_STYLES = {  # label -> (fmt, color); figure-2.py:593-596
    "Original": ("--", "C0"),
    "NN-f": ("--", "C1"),
    "NN-d": ("-.", "C2"),
}
MODEL_LEGEND = {
    "Original": "Original",
    "NN-f": r"$a$-gate as NN (NN-f)",
    "NN-d": "NN as discrepancy term (NN-d)",
}
MODEL_STYLES["NN-f (r1-bad ref)"] = ("--", "C1")
MODEL_STYLES["NN-f (r1-bad ours)"] = ("-.", "C3")
MODEL_LEGEND["NN-f (r1-bad ref)"] = "NN-f r1-bad (reference)"
MODEL_LEGEND["NN-f (r1-bad ours)"] = "NN-f r1-bad (retrained)"



def _sns_theme(plt):
    try:
        import seaborn as sns

        sns.set_theme()
    except Exception:
        plt.style.use("seaborn-v0_8-darkgrid")


def plot_sweep_panels(axv, axc, t, v, data, preds, ds=20):
    """Voltage + current panels with all sweeps overlaid
    (figure-2.py:587-599).  v/data/preds rows: [n_sweeps, T]."""
    for i in range(v.shape[0]):
        axv.plot(t, v[i], c="#7f7f7f", ds="steps")
        axc.plot(t[::ds], data[i][::ds], c="#7f7f7f",
                 label="__nolegend__" if i else "Data")
        for label, y in preds.items():
            fmt, color = MODEL_STYLES.get(label, ("--", "C3"))
            axc.plot(t[::ds], y[i][::ds], fmt, c=color, lw=1.0,
                     label="__nolegend__" if i else MODEL_LEGEND.get(label,
                                                                     label))
    axv.set_xlim([t[0], t[-1]])
    axc.set_xlim([t[0], t[-1]])
    axv.set_xticklabels([])


def zoom_panel(axz, axc, t, v_data, preds, window, ylim, facecolor, ds=1):
    """One zoom panel + shading patch on the parent current panel
    (figure-2.py:602-694): no ticks, arrow scale-bars labelled with the
    window duration and current range."""
    import matplotlib.pyplot as plt  # noqa: F401
    from matplotlib.path import Path as MplPath
    from matplotlib.patches import PathPatch

    t0, t1 = window
    y0, y1 = ylim
    i0, i1 = int(np.searchsorted(t, t0)), int(np.searchsorted(t, t1))
    tt = t[i0:i1:ds]
    for i in range(v_data.shape[0]):
        axz.plot(tt, v_data[i][i0:i1:ds], c="#7f7f7f")
        for label, y in preds.items():
            fmt, color = MODEL_STYLES.get(label, ("--", "C3"))
            axz.plot(tt, y[i][i0:i1:ds], fmt, c=color, lw=1.0)
    axz.set_xlim([tt[0], tt[-1]])
    axz.set_ylim([y0, y1])
    axz.set_xticks([])
    axz.set_yticks([])
    axz.set_xticklabels([])
    axz.set_yticklabels([])

    codes = [MplPath.MOVETO] + [MplPath.LINETO] * 3 + [MplPath.CLOSEPOLY]
    verts = np.array([(tt[0], y0), (tt[0], y1), (tt[-1], y1), (tt[-1], y0),
                      (0, 0)], float)
    axc.add_patch(PathPatch(MplPath(verts, codes), facecolor=facecolor,
                            edgecolor=facecolor, alpha=0.25))
    axz.add_patch(PathPatch(MplPath(verts, codes), facecolor=facecolor,
                            edgecolor=None, alpha=0.25))
    for (x, y, dx, dy) in [(1, -0.05, -1, 0), (0, -0.05, 1, 0)]:
        axz.arrow(x, y, dx, dy, length_includes_head=True, head_width=0.03,
                  head_length=0.05, clip_on=False, fc="k", ec="k",
                  transform=axz.transAxes)
    axz.text(0.5, -0.15, "%s ms" % np.around(t1 - t0, decimals=0),
             transform=axz.transAxes, ha="center", va="center")
    for (x, y, dx, dy) in [(-0.05, 1, 0, -1), (-0.05, 0, 0, 1)]:
        axz.arrow(x, y, dx, dy, length_includes_head=True, head_width=0.03,
                  head_length=0.05, clip_on=False, fc="k", ec="k",
                  transform=axz.transAxes)
    axz.text(-0.15, 0.5, "%s nA" % np.around(y1 - y0, decimals=0),
             rotation=90, transform=axz.transAxes, ha="center", va="center")


def fit_composition_cols(path, columns, ds=20, figsize=(11, 5)):
    """The figure-2 layout: N protocol columns, each voltage panel over
    current panel, plus a bottom zoom row (figure-2.py:556-585).

    columns: list of dicts with keys t [T], v/data [n_sweeps, T],
    preds {label: [n_sweeps, T]}, zooms [(t0, t1, y0, y1, facecolor)].
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _sns_theme(plt)
    n = len(columns)
    fig = plt.figure(figsize=figsize)
    grid = plt.GridSpec(4 + 1 + 12 + 5 + 9, 2 * n, hspace=0.0, wspace=0.0)
    for i, col in enumerate(columns):
        c0, c1 = 2 * i, 2 * (i + 1)
        axv = fig.add_subplot(grid[:4, c0:c1])
        axc = fig.add_subplot(grid[5:17, c0:c1])
        plot_sweep_panels(axv, axc, col["t"], col["v"], col["data"],
                          col["preds"], ds)
        axc.set_xlabel("Time (ms)", fontsize=12)
        if i == 0:
            axv.set_ylabel("Voltage\n(mV)", fontsize=12)
            axc.set_ylabel("Current\n(nA)", fontsize=12)
            axc.legend(loc="lower left", bbox_to_anchor=(-0.02, 1.55),
                       ncol=4, columnspacing=1.2, handletextpad=0.4,
                       bbox_transform=axc.transAxes)
        for iz, (t0, t1, y0, y1, fc) in enumerate(col["zooms"]):
            axz = fig.add_subplot(grid[-9:, c0 + iz])
            if i == 0 and iz == 0:
                axz.set_ylabel("Zoom in", fontsize=12)
            zoom_panel(axz, axc, col["t"], col["data"], col["preds"],
                       (t0, t1), (y0, y1), fc)
    fig.savefig(path, pad_inches=0.3, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def fit_composition_permodel_zoom(path, t, v, data, preds, zoom, zoom_ylim,
                                  facecolor, ylim=None, ds=20,
                                  figsize=(11, 5)):
    """The figure-4-s layout (reference figure-4-s.py:472-615): ONE protocol
    column — voltage panel over current panel over a row of per-model zoom
    panels, all sharing the same zoom window, each overlaying the data with
    a single model's prediction.  Arrow scale-bars on the first zoom only.

    v/data/preds rows: [n_sweeps, T]; zoom=(t0, t1); zoom_ylim=(y0, y1).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _sns_theme(plt)
    plt.rcParams["axes.facecolor"] = "#E4EDE4"  # figure-4-s.py:14
    fig = plt.figure(figsize=figsize)
    # grid constants from figure-4-s.py:475-488
    grid = plt.GridSpec(4 + 1 + 7 + 5 + 14, 3, hspace=0.0, wspace=0.0)
    axv = fig.add_subplot(grid[:4, :3])
    axc = fig.add_subplot(grid[5:12, :3])
    plot_sweep_panels(axv, axc, t, v, data, preds, ds)
    axv.set_ylabel("Voltage\n(mV)", fontsize=12)
    axc.set_ylabel("Current\n(nA)", fontsize=12)
    axc.set_xlabel("Time (ms)", fontsize=12)
    if ylim is not None:
        axc.set_ylim(list(ylim))

    t0, t1 = zoom
    y0, y1 = zoom_ylim
    i0, i1 = int(np.searchsorted(t, t0)), int(np.searchsorted(t, t1))
    tt = t[i0:i1:ds]
    from matplotlib.path import Path as MplPath
    from matplotlib.patches import PathPatch

    codes = [MplPath.MOVETO] + [MplPath.LINETO] * 3 + [MplPath.CLOSEPOLY]
    verts = np.array([(tt[0], y0), (tt[0], y1), (tt[-1], y1), (tt[-1], y0),
                      (0, 0)], float)
    axc.add_patch(PathPatch(MplPath(verts, codes), facecolor=facecolor,
                            edgecolor=facecolor, alpha=0.25))
    for im, (label, y) in enumerate(preds.items()):
        axz = fig.add_subplot(grid[-14:, im:im + 1])
        fmt, color = MODEL_STYLES.get(label, ("--", "C3"))
        for i in range(data.shape[0]):
            axz.plot(tt, data[i][i0:i1:ds], c="#7f7f7f")
            axz.plot(tt, y[i][i0:i1:ds], fmt, c=color, lw=1.0)
        axz.set_xlim([tt[0], tt[-1]])
        axz.set_ylim([y0, y1])
        axz.set_xticks([])
        axz.set_yticks([])
        axz.set_xticklabels([])
        axz.set_yticklabels([])
        axz.add_patch(PathPatch(MplPath(verts, codes), facecolor=facecolor,
                                edgecolor=None, alpha=0.25))
        if im == 0:
            axz.set_ylabel("Zoom in", fontsize=12)
            for (x, yy, dx, dy) in [(1, -0.05, -1, 0), (0, -0.05, 1, 0)]:
                axz.arrow(x, yy, dx, dy, length_includes_head=True,
                          head_width=0.03, head_length=0.05, clip_on=False,
                          fc="k", ec="k", transform=axz.transAxes)
            axz.text(0.5, -0.15, "%s ms" % np.around(t1 - t0, decimals=0),
                     transform=axz.transAxes, ha="center", va="center")
            for (x, yy, dx, dy) in [(-0.05, 1, 0, -1), (-0.05, 0, 0, 1)]:
                axz.arrow(x, yy, dx, dy, length_includes_head=True,
                          head_width=0.03, head_length=0.05, clip_on=False,
                          fc="k", ec="k", transform=axz.transAxes)
            axz.text(-0.15, 0.5, "%s nA" % np.around(y1 - y0, decimals=1),
                     rotation=90, transform=axz.transAxes, ha="center",
                     va="center")
    axc.legend(loc="lower left", bbox_to_anchor=(0.0, 1.7), ncol=4,
               columnspacing=4, bbox_transform=axc.transAxes)
    fig.align_ylabels([axv, axc])
    fig.savefig(path, pad_inches=0.02, dpi=300, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def fit_composition_rows(path, top_columns, rows, ds=20, figsize=(11, 13.5)):
    """The figure-3 layout: a top row of sweep columns plus stacked
    full-width single-trace rows, each with its own zoom row
    (figure-3.py:584-900)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    _sns_theme(plt)
    a1, a2, az = 4, 12, 9
    block = a1 + 1 + a2 + 2           # V + gap + I
    zblock = az + 4                   # zoom row + gap
    n_top = len(top_columns)
    total_rows = block + (block + zblock) * len(rows) + 4
    ncols = 12  # fine column grid so 1-3 zooms/row divide evenly
    fig = plt.figure(figsize=figsize)
    grid = plt.GridSpec(total_rows, ncols, hspace=0.0, wspace=0.0)

    r = 0
    for i, col in enumerate(top_columns):
        w = ncols // n_top
        c0, c1 = w * i, w * (i + 1) - (1 if n_top > 1 and i < n_top - 1
                                       else 0)
        axv = fig.add_subplot(grid[r:r + a1, c0:c1])
        axc = fig.add_subplot(grid[r + a1 + 1:r + a1 + 1 + a2, c0:c1])
        plot_sweep_panels(axv, axc, col["t"], col["v"], col["data"],
                          col["preds"], ds)
        if i == 0:
            axv.set_ylabel("Voltage\n(mV)", fontsize=12)
            axc.set_ylabel("Current\n(nA)", fontsize=12)
            axc.legend(loc="lower left", bbox_to_anchor=(-0.02, 1.55),
                       ncol=4, columnspacing=1.2, handletextpad=0.4,
                       bbox_transform=axc.transAxes)
        axc.set_xlabel("Time (ms)", fontsize=12)
        for iz, (t0, t1, y0, y1, fc) in enumerate(col["zooms"]):
            pass  # top columns carry no zoom row in figure-3
    r += block + 2
    for row in rows:
        axv = fig.add_subplot(grid[r:r + a1, :])
        axc = fig.add_subplot(grid[r + a1 + 1:r + a1 + 1 + a2, :])
        plot_sweep_panels(axv, axc, row["t"], row["v"], row["data"],
                          row["preds"], ds)
        axv.set_ylabel("Voltage\n(mV)", fontsize=12)
        axc.set_ylabel("Current\n(nA)", fontsize=12)
        axc.set_xlabel("Time (ms)", fontsize=12)
        r += block + 2
        n_z = len(row["zooms"])
        for iz, (t0, t1, y0, y1, fc) in enumerate(row["zooms"]):
            w = ncols // max(n_z, 1)
            axz = fig.add_subplot(grid[r:r + az, w * iz:w * (iz + 1) - 1])
            if iz == 0:
                axz.set_ylabel("Zoom in", fontsize=12)
            zoom_panel(axz, axc, row["t"], row["data"], row["preds"],
                       (t0, t1), (y0, y1), fc, ds=1)
        r += zblock - 2
    fig.savefig(path, pad_inches=0.3, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def phase_portrait_figure(path, cases, cache_dir, cached=False, ds=10,
                          view=(30, -125), v_hi=60.0):
    """The figure-1 family: two 3-D (V, a, da/dt) panels — (A) the d0-fitted
    candidate's trajectories on its own surface, (B) the ground truth's
    (a, da/dt) leaving it (figure-1.py:210-320; -s1/-s2 variants swap the
    protocols).  cases: [(protocol_name, color, label)]."""
    import jax.numpy as jnp_
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from ionflux import protorec
    from ionflux.eval import solve_states_real
    from ionflux.models.hh import a_gate_rhs
    from ionflux.models.registry import HH_D0_FIT, MARKOV_B06

    def trajectories(kind, name, y0):
        cache = os.path.join(cache_dir, f"{name}-{kind}.npz")
        if cached and os.path.exists(cache):
            d = np.load(cache)
            return d["a"], d["z"]
        ys = np.asarray(solve_states_real(
            kind, HH_D0_FIT if kind == "hh" else MARKOV_B06, name,
            y0=jnp_.asarray(y0, jnp_.float32)))
        a = ys[:, 0]
        if kind == "hh":
            z = np.asarray(a_gate_rhs(HH_D0_FIT, ys[:, 0],
                                      protorec.load_voltage(name)[0]))
        else:  # gta carries u = da/dt as its second state
            z = ys[:, 1]
        np.savez(cache, a=a, z=z)
        return a, z

    def plot_segments(ax, v, a, z, color, label):
        bounds = np.flatnonzero(np.diff(v) != 0) + 1
        # continuous waveforms (sinewave window, APs) have a boundary at
        # every sample; segment only at genuine steps (plateaus >= 5 ms)
        if len(bounds) > 200:
            keep = np.diff(np.concatenate([[0], bounds])) > 50
            bounds = bounds[keep]
        bounds = np.concatenate([bounds, [len(v)]])
        i = 0
        for f in bounds:
            sl = slice(i, f, ds)
            ax.plot(v[sl], a[sl], z[sl], alpha=0.8, color=color,
                    label="__nolegend__" if i else label)
            ax.scatter(v[i], a[i], z[i], alpha=0.8, color=color, marker=".")
            ax.scatter(v[f - 1], a[f - 1], z[f - 1], alpha=0.8, color=color,
                       marker=".")
            i = f

    fig = plt.figure(figsize=(8.5, 3.75))
    axes = [fig.add_subplot(1, 2, k + 1, projection="3d") for k in range(2)]
    vv, aa = np.meshgrid(np.linspace(-120.0, v_hi, 50),
                         np.linspace(0.0, 1.0, 50), indexing="ij")
    surf = np.asarray(a_gate_rhs(HH_D0_FIT, jnp_.asarray(aa),
                                 jnp_.asarray(vv)))
    for ax, kind, y0 in [(axes[0], "hh", [0.0, 1.0]),
                         (axes[1], "gta", [0.0, 0.0])]:
        for name, color, label in cases:
            v, _ = protorec.load_voltage(name)
            a, z = trajectories(kind, name, y0)
            plot_segments(ax, v, a, z, color, label)
        ax.plot_surface(vv, aa, surf, color="C0", alpha=0.5)
        ax.view_init(*view)
        ax.set_xlabel(r"$V$ (mV)")
        ax.set_ylabel(r"$a$")
        ax.zaxis.set_rotate_label(False)
        ax.set_zlabel(r"$\frac{da}{dt}$", rotation=0, fontsize=13)
    axes[1].legend(ncol=2)
    for k, ax in enumerate(axes):
        ax.text2D(-0.05, 0.925, f"({chr(65 + k)})", size=12, weight="bold",
                  va="bottom", ha="right", transform=ax.transAxes)
    fig.savefig(path, pad_inches=0.02, dpi=200, bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def load_r_models(out_root: str, oracle: bool = False,
                  refdir: str = "/root/reference"):
    """The r-study model trio for figures/tables: cell-5 HH fit (Mo) plus
    r1 NN-f / r2 NN-d — our retrained best checkpoints, or the reference's
    archived ones (table-2.py:313-319) with oracle=True.  Returns
    [(label, kind, params, constants)] with the per-model (g, E) of
    table-2.py:32-37."""
    import jax.numpy as jnp_

    from ionflux.models.nn import NNdParams, NNfParams
    from ionflux.models.registry import (CELL5_R1, CELL5_R2, CELL5_RAW,
                                         HH_CELL5_FIT, HH_CELL5_INIT)
    from ionflux.rstudies import R1, R2, init_params
    from ionflux.utils.ckpt import load_pytree
    from ionflux.utils.ptload import load_mlp_state_dict, pt_load

    if oracle:
        ck = pt_load(f"{refdir}/r1/best-model-checkpoint-2.pt")
        sd = ck["state_dict"]
        idxs = sorted({int(k.split(".")[1]) for k in sd
                       if k.startswith("net.")})
        r1 = NNfParams(
            net=[(jnp_.asarray(np.ascontiguousarray(sd[f"net.{i}.weight"].T)),
                  jnp_.asarray(sd[f"net.{i}.bias"])) for i in idxs],
            rgate=HH_CELL5_INIT)
        r2 = NNdParams(
            net=[(jnp_.asarray(w), jnp_.asarray(b)) for w, b in
                 load_mlp_state_dict(f"{refdir}/r2/model-state-dict-2.pt")],
            hh=HH_CELL5_FIT)
    else:
        out = []
        for spec in (R1, R2):
            path = os.path.join(out_root, spec.name, "best-model.npz")
            if not os.path.exists(path):
                path = os.path.join(out_root, spec.name, "model.npz")
            out.append(load_pytree(path, init_params(spec)))
        r1, r2 = out
    return [("Original", "hh", HH_CELL5_FIT, CELL5_RAW),
            ("NN-f", "nnf", r1, CELL5_R1),
            ("NN-d", "nnd", r2, CELL5_R2)]


def dense_measurement(idx, vals, n, max_gap: int = 30):
    """Recovered measurements live on the retained-sample lattice (every 7th
    sample inside capacitance-masked runs); expand to a dense trace for
    plotting by interpolating inside runs and NaN-ing the genuine mask gaps
    (> max_gap samples), so matplotlib breaks the line there."""
    idx = np.asarray(idx, np.int64)
    d = np.interp(np.arange(n), idx, np.asarray(vals, np.float64))
    for a, b in zip(idx[:-1], idx[1:]):
        if b - a > max_gap:
            d[a + 1:b] = np.nan
    d[:idx[0]] = np.nan
    d[idx[-1] + 1:] = np.nan
    return d


def load_s_models(out_root: str | None = None,
                  refdir: str = "/root/reference"):
    """The s-study trio for the supplement figures (figure-2-s.py:292-307):
    Original = the candidate HH (which IS the ground truth in the
    no-discrepancy studies) + s1 NN-f / s2 NN-d — archived weights when
    out_root is None, else the retrained models from out/."""
    import jax.numpy as jnp_

    from ionflux.models.registry import HH_B06

    if out_root is None:
        from ionflux.models.nn import NNdParams, NNfParams
        from ionflux.utils import load_mlp_state_dict

        def net(study):
            return [(jnp_.asarray(w), jnp_.asarray(b)) for w, b in
                    load_mlp_state_dict(
                        f"{refdir}/{study}/model-state-dict.pt")]

        return {
            "Original": ("hh", HH_B06, "C2--"),
            "NN-f": ("nnf", NNfParams(net=net("s1"), rgate=HH_B06), "C0--"),
            "NN-d": ("nnd", NNdParams(net=net("s2"), hh=HH_B06), "C1--"),
        }
    from ionflux.studies import S1, S2, load_study_params

    models = {"Original": ("hh", HH_B06, "C2--")}
    for spec, label in [(S1, "NN-f"), (S2, "NN-d")]:
        d = os.path.join(out_root, spec.name)
        if os.path.exists(os.path.join(d, "model.npz")):
            models[label] = (spec.model_kind, load_study_params(spec, d),
                             "C0--")
    return models
