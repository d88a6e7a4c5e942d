"""Raw-recording pipeline: measured (t, I, V) time series -> training surface.

This is the data-present path of the r-studies (reference train-r1.py:80-130
loading + :387-811 estimation), usable as soon as the cell-5 CSVs are fetched
(scripts/fetch_data.py) and tested here with synthetic stand-in recordings.

Two derivative-estimation variants, as in the reference:
  spline  (default): per-segment Hanning smooth of I + cubic spline -> dI/dt,
          then algebraic inversion to (a, da/dt) (train-r1.py:680-793)
  smoothi (--smoothi): invert to a first, then per-segment tri-/bi-exponential
          or quartic-spline fits of a(t) giving (a, da/dt, d2a/dt2)
          (train-r1.py:422-673)
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np
from scipy.interpolate import UnivariateSpline

from ionflux import protocols as P
from ionflux.models.registry import Constants, HHParams
from ionflux.ops.expfit import (X02_TRI, X0_BI, X0_TRI, eval_exp, fit_exp,
                                fit_exp_ls, is_within)
from ionflux.ops.smoothing import smooth_same_np
from ionflux.surface import invert_observation, solve_r_gate, spline_didt, SurfaceConfig

# Pr5's flat holding tails are bi-exp segments; the -90 mV segment needs
# CMA-ES (train-r1.py:633, 554/640)
PR5_BI_TIMES = (2000, 12000, 22000, 33000, 43000, 53000, 64000, 74000, 84000)
PR5_CMA_VOLTAGES = (-90.0,)


def load_recording(path: str):
    """A cell-5 CSV: columns time, current, voltage (train-r1.py:80-94)."""
    raw = np.loadtxt(path, delimiter=",", skiprows=1)
    return raw[:, 0], raw[:, 1], raw[:, 2]


@dataclass(frozen=True)
class RealSurfaceConfig:
    skip: int = 10            # train-r1.py:391
    sparse: int = 7           # train-r1.py:392
    cap_points: int = 70      # 7 ms at 0.1 ms (train-r1.py:99-101)
    extra_points: int = 20    # train-r1.py:118
    std_cutoff: float = 0.01  # exp-vs-spline switch (train-r1.py:460)
    smooth_window: int = 51   # a-smoothing for spline segments (:497)
    spline_k: int = 4         # "want smooth 2nd derivative" (:498)
    spline_s: float = 0.2     # (:499)
    sine_window: int = 21     # sinewave-window smoothing (:566)
    sine_spline_k: int = 5    # sinewave-window spline order (:567)
    # tri-exp initial guess: the reference uses x0 for Pr3 segments and x02
    # for Pr4/sinewave/Pr5 (train-r1.py:490 vs :545/634); None -> X02_TRI
    tri_x0: tuple | None = None
    # exp-fit optimiser: "fmin" = reference-faithful single Nelder-Mead
    # (+CMA fallback, train-r1.py:490/555); "ls" = the grid-seeded
    # varpro + LM pipeline (ops/expfit.fit_exp_ls) — strictly stronger,
    # recovers basins the single fmin stalls on
    fit_method: str = "fmin"


def _recording_protocol(t: np.ndarray, v: np.ndarray) -> P.Protocol:
    # recordings are nominally uniform; tolerate f32-rounded time columns
    dt = (t[-1] - t[0]) / (len(t) - 1)
    return P.Protocol(jnp.float32(t[0]), jnp.float32(dt),
                      jnp.asarray(v, jnp.float32))


def _known_r(t, v, rgate: HHParams):
    proto = _recording_protocol(t, v)
    ts = jnp.asarray(t, jnp.float32)
    r = np.asarray(solve_r_gate(proto, ts, rgate), np.float64)
    k3 = np.float64(rgate.p5) * np.exp(np.float64(rgate.p6) * v)
    k4 = np.float64(rgate.p7) * np.exp(-np.float64(rgate.p8) * v)
    drdt = -k3 * r + k4 * (1.0 - r)
    return r, drdt


def real_surface_spline(t, i, v, rgate: HHParams, c: Constants,
                        cfg: RealSurfaceConfig = RealSurfaceConfig(),
                        extra_changes: np.ndarray | None = None):
    """Spline path -> subsampled (t, v, a, dadt) (train-r1.py:680-801)."""
    t = np.asarray(t, np.float64)
    i = np.asarray(i, np.float64)
    v = np.asarray(v, np.float64)
    r, drdt = _known_r(t, v, rgate)
    edges = P.segment_edges(t, v)
    i_smooth, didt = spline_didt(
        t, i, edges, SurfaceConfig(smooth_window=61, spline_k=3, spline_s=0.0))
    a, dadt = invert_observation(i_smooth, r, v, didt, drdt, c)
    mask = P.training_mask(v, cfg.cap_points, cfg.extra_points, extra_changes)
    sl = slice(cfg.skip, None, cfg.sparse)
    return t[mask][sl], v[mask][sl], a[mask][sl], dadt[mask][sl]


def real_surface_smoothi(t, i, v, rgate: HHParams, c: Constants,
                         cfg: RealSurfaceConfig = RealSurfaceConfig(),
                         extra_changes: np.ndarray | None = None,
                         bi_exp_times: tuple = (), cma_voltages: tuple = (),
                         sine_times: tuple = ()):
    """--smoothi path -> subsampled (t, v, a, dadt, d2adt2)
    (train-r1.py:422-673).

    bi_exp_times: segment-interior times forced to bi-exp (the Pr5 flat tails,
    train-r1.py:633); cma_voltages: segment voltages needing the CMA-ES
    optimiser (the hard -90 mV segments, train-r1.py:554, 640); sine_times:
    segment-interior times marking a sinewave window — those segments take a
    lighter smooth and a quintic spline regardless of their std (the
    sinewave-recording branch at train-r1.py:564-573; t=3500 in the cell-5
    sinewave group, which the reference computes but never trains on)."""
    t = np.asarray(t, np.float64)
    i = np.asarray(i, np.float64)
    v = np.asarray(v, np.float64)
    r, _ = _known_r(t, v, rgate)
    a_raw = i / (np.float64(c.g) * r * (v - np.float64(c.e)))

    cap = P.capacitance_mask(v, cfg.cap_points, extra_changes)
    tt, aa = t[cap], a_raw[cap]
    edges = P.segment_edges(t, v)

    ao = np.zeros_like(t)
    dadto = np.zeros_like(t)
    d2o = np.zeros_like(t)
    t_i = 0.0
    for t_f in edges:
        idx = np.where((tt >= t_i) & (tt < t_f))[0]
        t_i = t_f
        if len(idx) <= cfg.smooth_window:
            continue  # degenerate segment; masked out of training anyway
        tfit = tt[idx]
        afit_raw = aa[idx]
        full = np.where((t >= tfit[0]) & (t <= tfit[-1]))[0]
        seg_v = v[full[0]]
        in_sine = any(is_within(tfit, ts_) for ts_ in sine_times)
        if np.std(afit_raw) > cfg.std_cutoff and not in_sine:
            tl = tfit - tfit[0]
            if any(is_within(tfit, tb) for tb in bi_exp_times):
                if cfg.fit_method == "ls":
                    x = fit_exp_ls(tl, afit_raw, "bi", X0_BI)
                else:
                    x = fit_exp(tl, afit_raw, "bi", X0_BI)
                vals = eval_exp("bi", t[full] - tfit[0], x)
            else:
                use_cma = any(abs(seg_v - cv) < 0.5 for cv in cma_voltages)
                tri_x0 = (np.asarray(cfg.tri_x0) if cfg.tri_x0 is not None
                          else X02_TRI)
                if cfg.fit_method == "ls":
                    x = fit_exp_ls(tl, afit_raw, "tri", tri_x0)
                else:
                    x = fit_exp(tl, afit_raw, "tri", tri_x0,
                                use_cma=use_cma)
                vals = eval_exp("tri", t[full] - tfit[0], x)
            ao[full], dadto[full], d2o[full] = vals
        else:
            win = cfg.sine_window if in_sine else cfg.smooth_window
            k = cfg.sine_spline_k if in_sine else cfg.spline_k
            asm = smooth_same_np(afit_raw, win)
            spl = UnivariateSpline(tfit, asm, k=k)
            spl.set_smoothing_factor(cfg.spline_s)
            ao[full] = spl(t[full])
            dadto[full] = spl(t[full], 1)
            d2o[full] = spl(t[full], 2)

    mask = P.training_mask(v, cfg.cap_points, cfg.extra_points, extra_changes)
    sl = slice(cfg.skip, None, cfg.sparse)
    return (t[mask][sl], v[mask][sl], ao[mask][sl], dadto[mask][sl],
            d2o[mask][sl])


# ---------------------------------------------------------------------------
# smoothi cache-refit parity
# ---------------------------------------------------------------------------

def smoothi_refit_cache(surface_dir: str, protocols=("pr3", "pr5"),
                        n_min: int = 12, max_fit_points: int = 2000,
                        seed: int = 0, n_points_cap: int = 70,
                        max_segments: int | None = None):
    """Re-run the --smoothi segment-fit dispatch on the retained-sample
    lattice of a reference surface cache and compare against the cache.

    The archived r-study surfaces (r1/r2/r1-bad {a,dadt,d2adt2}.pt) were
    produced WITH --smoothi (d2adt2.pt exists only on that branch,
    train-r1.py:809-811), so the cached gate a is the reference's per-segment
    tri/bi-exp or smoothing-spline fit and dadt/d2adt2 are its analytic/
    spline derivatives.  Re-fitting OUR segment dispatch (same std cutoffs,
    bi-exp windows and initial guesses; exp optimiser upgraded to the
    grid-seeded varpro + LM pipeline, ops/expfit.fit_exp_ls) to the cached a
    must therefore reproduce dadt/d2adt2 — a genuine end-to-end parity check
    of the C14 exp-fit machinery against real-lineage surfaces, no raw CSVs
    required.

    Exp segments fit on at most max_fit_points samples (strided) for speed;
    evaluation is at every retained sample.  Returns
    {protocol: {t, v, a, dadt, d2, a_ref, dadt_ref, d2_ref, branch}} with
    branch one of 'tri'/'bi'/'spline' per retained sample ('' = skipped
    degenerate segment).
    """
    from ionflux import protorec
    from ionflux.utils.ptload import pt_load

    v = np.asarray(pt_load(f"{surface_dir}/v.pt"), np.float64)
    a = np.asarray(pt_load(f"{surface_dir}/a.pt"), np.float64)
    dadt = np.asarray(pt_load(f"{surface_dir}/dadt.pt"), np.float64)
    d2 = np.asarray(pt_load(f"{surface_dir}/d2adt2.pt"), np.float64)
    sel_t, sel_m = _cache_lattice(surface_dir, protocols, v,
                                  n_points=n_points_cap)
    # per-protocol dispatch parameters (train-r1.py:460/490 vs :602/633/640;
    # pr4 as in train-r1-bad.py:459-492)
    params = {"pr3": dict(cutoff=0.01, tri_x0=X0_TRI, bi_times=()),
              "pr4": dict(cutoff=0.015, tri_x0=X02_TRI, bi_times=()),
              "pr5": dict(cutoff=0.015, tri_x0=X02_TRI,
                          bi_times=PR5_BI_TIMES)}
    out = {}
    for name in protocols:
        tl, m = sel_t[name], sel_m[name]
        vl, al, dl, d2l = v[m], a[m], dadt[m], d2[m]
        pp = params[name]
        vfull, dt = protorec.load_voltage(f"{name}-cell5")
        edges = P.segment_edges(np.arange(len(vfull)) * dt, vfull)
        ao = np.zeros_like(tl)
        do = np.zeros_like(tl)
        d2o = np.zeros_like(tl)
        branch = np.full(len(tl), "", dtype=object)
        t_i = 0.0
        n_fitted = 0
        for t_f in edges:
            idx = np.where((tl >= t_i) & (tl < t_f))[0]
            t_i = t_f
            if len(idx) < n_min:
                continue
            if max_segments is not None and n_fitted >= max_segments:
                break
            n_fitted += 1
            ts_, as_ = tl[idx], al[idx]
            tloc = ts_ - ts_[0]
            if np.std(as_) > pp["cutoff"]:
                kind = ("bi" if any(is_within(ts_, tb)
                                    for tb in pp["bi_times"]) else "tri")
                stride = max(1, len(idx) // max_fit_points)
                x = fit_exp_ls(tloc[::stride], as_[::stride], kind,
                               pp["tri_x0"] if kind == "tri" else X0_BI,
                               seed=seed)
                ao[idx], do[idx], d2o[idx] = eval_exp(kind, tloc, x)
                branch[idx] = kind
            else:
                asm = smooth_same_np(as_, 51)
                spl = UnivariateSpline(ts_, asm, k=4)
                spl.set_smoothing_factor(0.2)
                ao[idx] = spl(ts_)
                do[idx] = spl(ts_, 1)
                d2o[idx] = spl(ts_, 2)
                branch[idx] = "spline"
        out[name] = dict(t=tl, v=vl, a=ao, dadt=do, d2=d2o,
                         a_ref=al, dadt_ref=dl, d2_ref=d2l, branch=branch)
    return out


# ---------------------------------------------------------------------------
# Measured-current recovery from the reference's cached training surfaces
# ---------------------------------------------------------------------------

def _cache_lattice(surface_dir: str, protocols, v: np.ndarray,
                   n_points: int = 70):
    """Retained-sample split of a cached surface: {name: local times} and
    {name: bool selector into the concatenated cache arrays}.

    r1/r2 store t.pt (Pr3+Pr5 concatenated on a global clock,
    train-r1.py:800-803); r1-bad stores none — its lattice is rederived
    from the reconstructed protocols' own masks (3 ms cap, verified
    bit-exact against r1-bad/v.pt)."""
    from ionflux import protorec
    from ionflux.utils.ptload import pt_load

    if os.path.exists(f"{surface_dir}/t.pt"):
        # the PR3_N split below is specific to the r1/r2 Pr3+Pr5 caches
        if tuple(protocols) != ("pr3", "pr5"):
            raise ValueError(
                "the t.pt split is hardcoded for protocols=('pr3','pr5'); "
                f"got {tuple(protocols)} — use the mask-derived branch "
                "(surface dirs without t.pt) for other pairs")
        t = np.asarray(pt_load(f"{surface_dir}/t.pt"))
        n1 = protorec.PR3_N
        in3 = np.round(t / protorec.DT_MS).astype(np.int64) < n1
        sel_t = {protocols[0]: t[in3],
                 protocols[1]: t[~in3] - (n1 - 1) * protorec.DT_MS}
        sel_m = {protocols[0]: in3, protocols[1]: ~in3}
    else:
        # rebuild the retained-sample lattice from the protocol masks
        sel_t, sel_m, pos = {}, {}, 0
        for name in protocols:
            vfull, dt = protorec.load_voltage(f"{name}-cell5")
            m = P.training_mask(vfull, n_points=n_points)
            idx = np.where(m)[0][10::7]
            np.testing.assert_array_equal(vfull[idx], v[pos:pos + len(idx)])
            sel_t[name] = idx * dt
            sel = np.zeros(len(v), bool)
            sel[pos:pos + len(idx)] = True
            sel_m[name] = sel
            pos += len(idx)
    return sel_t, sel_m


def recover_measurements(surface_dir: str, c: Constants, rgate: HHParams,
                         protocols=("pr3", "pr5"), n_points: int = 70,
                         dtype=None):
    """Recover the (smoothed) measured currents from a cached r-study
    training surface.

    The surface stores a = I_smoothed / (g r (V - E)) at the retained sample
    times (train-r1.py:748-793), so with the known r-gate simulated on the
    reconstructed real protocols the measured current is
    I = a g r (V - E) — exactly the reference's own smoothed recording at
    ~90% of samples (capacitance-masked, [10::7]-subsampled).  This is what
    makes reference-faithful validation MAEs (train-r1.py:928-959) possible
    without the missing CSVs.

    protocols/n_points select the study's concatenation: r1/r2 cached
    Pr3+Pr5 with a 7 ms mask; r1-bad cached Pr3+Pr4 with 3 ms
    (train-r1-bad.py:76-96) and stores no t.pt — the retained sample times
    are rederived from the reconstructed protocols' own masks (verified
    bit-exact against r1-bad/v.pt).

    Returns {name: (t_local_ms, i)} per protocol.
    """
    import jax

    from ionflux import protorec
    from ionflux.utils.ptload import pt_load

    if dtype is None:
        dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    v = np.asarray(pt_load(f"{surface_dir}/v.pt"))
    a = np.asarray(pt_load(f"{surface_dir}/a.pt"))
    sel_t, sel_m = _cache_lattice(surface_dir, protocols, v, n_points)
    out = {}
    for name in protocols:
        tl, sel = sel_t[name], sel_m[name]
        proto = protorec.protocol(f"{name}-cell5", dtype=dtype)
        ts = jnp.concatenate([jnp.zeros((1,), dtype),
                              jnp.asarray(tl, dtype)])
        r = np.asarray(solve_r_gate(proto, ts, rgate,
                                    max_steps=1_000_000,
                                    buffer_size=65536))[1:]
        i = a[sel] * float(c.g) * r * (v[sel] - float(c.e))
        out[name] = (tl, i)
    return out
