"""Protocol reconstruction: recover the reference's missing voltage-clamp
protocol files from its stored simulation artifacts.

The reference trains/validates on five real Beattie-2018 cell-5 protocol CSVs
(``data/pr3-steady-activation-cell-5.csv``, ``pr4-inactivation``, ``pr5-
deactivation``, ``cell-5.csv`` sinewave, ``ap-cell-5.csv`` APs;
train-r1.py:80-94, table-1.py:52-96) that are absent from the data mount
(SURVEY.md §1.1).  They are, however, fully recoverable from artifacts the
reference *does* ship:

1. **GroundTruth_a state trajectories** — figure-1-s1/yc-pr4.pt stores the
   (a, u=da/dt) trajectory of the 2nd-order a-gate ODE (figure-1.py:72-118)
   simulated on the full Pr4 protocol at every 0.1 ms sample; figure-1-s2
   stores the same for the sinewave (yc-sinewave.pt) and the APs protocol
   (yc-pr4.pt — the reference misnames it; figure-1-s2.py:180-208 simulates
   ``ap-cell-5.csv`` and saves it under the pr4 name).  Because the dynamics
   du/dt = -K1(V)a - K2(V)u + K3(V) are analytic and (a, u) are both stored,
   V(t) is recoverable *algebraically per sample*: solve
   ``R(V) = du/dt + K1(V)a + K2(V)u - K3(V) = 0`` with du/dt from finite
   differences.  No ODE inversion, no drift.

2. **Clean d0-HH currents** — table-1/yo-{pr4,sinewave,aps}.pt are noise-free
   float64 simulations of the d0-fitted HH candidate (table-1.py:398-419,
   g=1, E=-88.4).  Driving-force ratios across one sample pin step-boundary
   samples exactly, and a trajectory-consistent fixed point
   ``V <- E + I/(g a(V) r(V))`` polishes the recovered V wherever the gate
   product is non-negligible.

3. **Masked surface samples** — r1/t.pt + r1/v.pt are the (t, V) points of
   the real Pr3+Pr5 training surface (train-r1.py:796-800: Pr3 times, then
   ``time1[-1] + time3``).  Step levels are read off directly; boundary
   times are bracketed by the capacitance-mask gaps (7 ms + 20 samples after
   a step, 20 samples before; train-r1.py:96-130) and intersected across
   sweeps assuming the recording's exact per-sweep periodicity.

The recovered per-sample voltage arrays are written once to
``ionflux/assets/protocols/*.npz`` by scripts/reconstruct_protocols.py and
shipped with the package; :func:`protocol` loads them (with analytic
fallbacks for the pure step/sine protocols, which need no stored asset).

Everything here is offline tooling (numpy/scipy); the hot simulation paths
stay in the JAX solver layer.
"""

from __future__ import annotations

import os

import numpy as np

from ionflux.models.registry import MARKOV_B06, MarkovParams

DT_MS = 0.1  # all cell-5 recordings are sampled at 0.1 ms (train-r1.py:100)

ASSET_DIR = os.path.join(os.path.dirname(__file__), "assets", "protocols")


# ---------------------------------------------------------------------------
# 1. Algebraic voltage inversion from GroundTruth_a (a, u) trajectories
# ---------------------------------------------------------------------------

def _gta_coeffs(p: MarkovParams, v: np.ndarray):
    """K1, K2, K3 of the reduced a-gate ODE (figure-1.py:100-110), numpy."""
    a1 = p.p1 * np.exp(p.p2 * v)
    b1 = p.p3 * np.exp(-p.p4 * v)
    a2 = p.p9 * np.exp(p.p10 * v)
    b2 = p.p11 * np.exp(-p.p12 * v)
    return a1 * a2 + a1 * b2 + b1 * b2, a1 + b1 + a2 + b2, a1 * a2


def invert_gt_a(a: np.ndarray, u: np.ndarray, dt: float = DT_MS,
                params: MarkovParams = MARKOV_B06,
                v_lo: float = -140.0, v_hi: float = 80.0,
                n_outer: int = 8) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Recover V(t) from a stored GroundTruth_a (a, u=da/dt) trajectory.

    Solves R(V) = u' + K1(V)a + K2(V)u - K3(V) = 0 per sample.  R can have
    several roots, so a coarse grid argmin seeds a Jacobi-style loop:
    median-filter the estimate for temporal continuity, then Newton-refine
    every sample in parallel.  Returns (V, |residual|, |dR/dV| sensitivity);
    samples with tiny sensitivity carry little voltage information (the gate
    barely moves there) and should be filled from structure priors.
    """
    a = np.asarray(a, np.float64)
    u = np.asarray(u, np.float64)
    dudt = np.gradient(u, dt)

    vg = np.linspace(v_lo, v_hi, int((v_hi - v_lo) * 2) + 1)  # 0.5 mV grid
    k1g, k2g, k3g = _gta_coeffs(params, vg)
    v = np.empty(a.shape)
    for s in range(0, len(a), 40000):
        e = min(s + 40000, len(a))
        r = (dudt[s:e, None] + k1g[None, :] * a[s:e, None]
             + k2g[None, :] * u[s:e, None] - k3g[None, :])
        v[s:e] = vg[np.argmin(np.abs(r), axis=1)]

    from scipy.ndimage import median_filter

    def _resid(v):
        k1, k2, k3 = _gta_coeffs(params, v)
        return dudt + k1 * a + k2 * u - k3

    def _dresid(v, h=0.01):
        k1p, k2p, k3p = _gta_coeffs(params, v + h)
        k1m, k2m, k3m = _gta_coeffs(params, v - h)
        return ((k1p - k1m) * a + (k2p - k2m) * u - (k3p - k3m)) / (2 * h)

    for _ in range(n_outer):
        v = median_filter(v, size=15, mode="nearest")
        for _ in range(12):
            dr = _dresid(v)
            dr = np.where(np.abs(dr) < 1e-18, 1e-18, dr)
            v = np.clip(v - np.clip(_resid(v) / dr, -10, 10), v_lo, v_hi)

    return v, np.abs(_resid(v)), np.abs(_dresid(v, h=0.05))


# ---------------------------------------------------------------------------
# 2. Step-boundary detection from clean currents
# ---------------------------------------------------------------------------

def boundaries_from_trace(i_clean: np.ndarray, rel_thresh: float = 0.15,
                          floor: float = 1e-5) -> np.ndarray:
    """Indices of the *first sample at a new voltage level* in a clean step-
    protocol current.  A voltage step multiplies I = g a r (V - E) by the
    driving-force ratio within one sample while (a, r) stay continuous, so
    relative one-sample jumps far above the smooth trend mark boundaries."""
    i_clean = np.asarray(i_clean, np.float64).reshape(-1)
    rel = np.abs(np.diff(i_clean)) / np.maximum(np.abs(i_clean[:-1]), floor)
    cand = np.where(rel > rel_thresh)[0]
    out: list[int] = []
    for idx in cand:
        if out and idx - out[-1] <= 3:
            continue  # same edge (interp ramp spans 2 samples)
        out.append(int(idx))
    return np.asarray([i + 1 for i in out], dtype=np.int64)


def level_from_ratio(i_clean: np.ndarray, b: int, v_prev: float,
                     e: float) -> float:
    """Voltage level after boundary sample ``b`` from the one-sample driving-
    force ratio (valid when the gates move slowly across the step, i.e. for
    steps between hyperpolarised levels where a is near-frozen)."""
    return e + (i_clean[b] / i_clean[b - 1]) * (v_prev - e)


def snap_segments(v: np.ndarray, sens: np.ndarray, bounds: np.ndarray,
                  sens_thresh: float = 1e-7) -> list[tuple[int, int, float]]:
    """Per-segment constant levels from an inverted-voltage estimate: the
    sensitivity-weighted median over well-conditioned samples (NaN when the
    whole segment is ill-conditioned — fill those by ratio/prior)."""
    edges = np.concatenate([[0], bounds, [len(v)]])
    segs = []
    for s, e in zip(edges[:-1], edges[1:]):
        ok = sens[s:e] > sens_thresh
        lvl = float(np.median(v[s:e][ok])) if ok.sum() > 10 else float("nan")
        segs.append((int(s), int(e), lvl))
    return segs


# ---------------------------------------------------------------------------
# 3. Gradient-based trajectory-consistent voltage fitting
# ---------------------------------------------------------------------------
#
# Pointwise/fixed-point refinement of V against the clean currents is
# UNSTABLE for this system: a local voltage correction shifts the gate states
# downstream through exponential rates with loop gain > 1 (measured: each
# sweep of V <- E + I/(g a r) grows the trace error).  The stable tool is
# joint trajectory fitting: integrate gt_a and the d0-HH candidate through a
# differentiable fixed-step RK4 (lax.scan, rematerialised) and descend on the
# per-sample voltages directly.  The gt_a trajectory term pins V wherever the
# gate moves (slow content); the current term pins the fast edges the gate
# low-passes away (AP upstrokes).  A large-then-decaying Adam step is needed
# because mistimed spikes require O(100 mV) per-sample corrections.


def fit_voltage(v0: np.ndarray, a_ref: np.ndarray, i_clean: np.ndarray,
                hh_params, c, params: MarkovParams = MARKOV_B06,
                dt: float = DT_MS, free: np.ndarray | None = None,
                stages=((1e6, 1.0, 0.3, 400), (1e5, 100.0, 1.0, 800),
                        (1e6, 100.0, 0.05, 300)),
                verbose: bool = True) -> np.ndarray:
    """Fit per-sample V(t) to a stored gt_a a-trajectory + clean HH current.

    stages: (w_a, w_i, adam_lr, iters) triples run in sequence, each with a
    cosine-decayed learning rate.  ``free`` masks which samples may move
    (None = all); fixed samples keep v0 (the analytic step scaffold).
    """
    import jax
    import jax.numpy as jnp
    import optax

    pm, ph = params, hh_params
    g, e = float(c.g), float(c.e)
    a_ref = jnp.asarray(np.asarray(a_ref, np.float64))
    i_ref = jnp.asarray(np.asarray(i_clean, np.float64).reshape(-1))
    v_fixed = jnp.asarray(np.asarray(v0, np.float64))
    free_m = (jnp.asarray(np.ones(len(v0), bool)) if free is None
              else jnp.asarray(np.asarray(free, bool)))

    def gta_rhs(y, v):
        a, u = y[0], y[1]
        a1 = pm.p1 * jnp.exp(pm.p2 * v)
        b1 = pm.p3 * jnp.exp(-pm.p4 * v)
        a2 = pm.p9 * jnp.exp(pm.p10 * v)
        b2 = pm.p11 * jnp.exp(-pm.p12 * v)
        k1 = a1 * a2 + a1 * b2 + b1 * b2
        k2 = a1 + b1 + a2 + b2
        return jnp.stack([u, -k1 * a - k2 * u + a1 * a2])

    def hh_rhs(y, v):
        a, r = y[0], y[1]
        k1 = ph.p1 * jnp.exp(ph.p2 * v)
        k2 = ph.p3 * jnp.exp(-ph.p4 * v)
        k3 = ph.p5 * jnp.exp(ph.p6 * v)
        k4 = ph.p7 * jnp.exp(-ph.p8 * v)
        return jnp.stack([k1 * (1 - a) - k2 * a, -k3 * r + k4 * (1 - r)])

    def rhs(y, v):
        return jnp.concatenate([gta_rhs(y[:2], v), hh_rhs(y[2:], v)])

    def rollout(v):
        def step(y, vv):
            v0_, v1_ = vv
            vm = 0.5 * (v0_ + v1_)
            k1 = rhs(y, v0_)
            k2 = rhs(y + 0.5 * dt * k1, vm)
            k3 = rhs(y + 0.5 * dt * k2, vm)
            k4 = rhs(y + dt * k3, v1_)
            y1 = y + dt / 6 * (k1 + 2 * k2 + 2 * k3 + k4)
            return y1, y1
        y_init = jnp.array([0.0, 0.0, 0.0, 1.0])
        _, ys = jax.lax.scan(jax.checkpoint(step), y_init,
                             (v[:-1], v[1:]))
        return jnp.concatenate([y_init[None], ys], axis=0)

    def loss(v, w_a, w_i):
        vv = jnp.where(free_m, v, v_fixed)
        ys = rollout(vv)
        la = jnp.mean((ys[:, 0] - a_ref) ** 2)
        li = jnp.mean((g * ys[:, 2] * ys[:, 3] * (vv - e) - i_ref) ** 2)
        return w_a * la + w_i * li, (la, li)

    vg = jax.jit(jax.value_and_grad(loss, has_aux=True))
    v = v_fixed
    for w_a, w_i, lr, iters in stages:
        sched = optax.cosine_decay_schedule(lr, iters, alpha=0.01)
        opt = optax.adam(sched)
        state = opt.init(v)
        for it in range(iters):
            (_, (la, li)), grads = vg(v, w_a, w_i)
            updates, state = opt.update(grads, state, v)
            v = optax.apply_updates(v, updates)
            if verbose and (it % 200 == 0 or it == iters - 1):
                print(f"  fit_voltage lr={lr} it {it:4d} "
                      f"a-RMSE {float(jnp.sqrt(la)):.3e} "
                      f"i-RMSE {float(jnp.sqrt(li)):.3e}", flush=True)
    v = jnp.where(free_m, v, v_fixed)
    return np.asarray(v)


# ---------------------------------------------------------------------------
# 4. Analytic protocol builders (no stored asset needed)
# ---------------------------------------------------------------------------

def _steps(n: int, segments: list[tuple[int, float]]) -> np.ndarray:
    """Per-sample voltage from (first_sample_index, level) pairs."""
    v = np.empty(n, np.float64)
    starts = [s for s, _ in segments] + [n]
    for (s, lvl), e in zip(segments, starts[1:]):
        v[s:e] = lvl
    return v


def sinewave_cell5_voltage() -> np.ndarray:
    """data/cell-5.csv voltage column (80,000 samples, 8 s).

    Step scaffold recovered by invert_gt_a from figure-1-s2/yc-sinewave.pt
    and boundary samples pinned by table-1/yo-sinewave.pt driving-force
    ratios; the window (3000, 6500] ms carries the published Beattie-2018
    3-sine waveform referenced to t0=2500 ms (the same window train-r1.py:107
    special-cases).  Median deviation of the recorded protocol from this
    analytic form is 0.12 mV (recording noise), so the analytic form is the
    asset."""
    n = 80000
    t = np.arange(n) * DT_MS
    v = _steps(n, [
        (0, -80.0),        # hold
        (2501, -120.0),    # 50 ms leak step
        (3001, -80.0),
        (5001, 40.0),      # 1 s activation
        (15001, -120.0),   # 0.5 s
        (20001, -80.0),
        (30001, 0.0),      # sine window, filled below
        (65001, -120.0),
        (70001, -80.0),
    ])
    w = slice(30001, 65001)
    x = t[w] - 2500.0
    v[w] = (-30.0 + 54.0 * np.sin(0.007 * x) + 26.0 * np.sin(0.037 * x)
            + 10.0 * np.sin(0.19 * x))
    return v


# Real Pr3 (steady activation, 7 sweeps): recovered from r1/t.pt + r1/v.pt.
# Sweep-local layout after the leak step, in samples (0.1 ms):
#   -120 x 500 | -80 x 2000 | test x 50000 | -40 x 10000 | -120 x 5000 |
#   -80 until the next sweep.  First leak sample 3791 (mask-gap brackets of
#   all 41 boundaries intersect to {3791, 3792}), period 82580 samples,
#   total 578060 samples (= time1[-1] 57805.9 ms, train-r1.py:796-800).
PR3_TEST_V = (-60.0, -40.0, -20.0, 0.0, 20.0, 40.0, 60.0)
PR3_N = 578060
PR3_LEAK0 = 3791
PR3_PERIOD = 82580


def pr3_cell5_voltage() -> np.ndarray:
    segs: list[tuple[int, float]] = [(0, -80.0)]
    for k, tv in enumerate(PR3_TEST_V):
        s = PR3_LEAK0 + k * PR3_PERIOD
        segs += [(s, -120.0), (s + 500, -80.0), (s + 2500, tv),
                 (s + 52500, -40.0), (s + 62500, -120.0), (s + 67500, -80.0)]
    return _steps(PR3_N, segs)


# Real Pr5 (deactivation, 9 sweeps), same provenance.  Sweep-local layout:
#   -120 x 500 | -80 x 2000 | +50 x 20000 | test x 60000 | -120 x 5000 |
#   -80 until next sweep.  First leak sample 4112 (exact: all 53 mask-gap
#   brackets intersect to a single sample), period 103224 samples, total
#   9 full periods (the last retained surface sample is 929011; the final
#   few -80 hold samples are not observable through the subsample lattice,
#   so the exact-9-period length is adopted).
PR5_TEST_V = (-120.0, -110.0, -100.0, -90.0, -80.0, -70.0, -60.0, -50.0,
              -40.0)
PR5_N = 9 * 103224
PR5_LEAK0 = 4112
PR5_PERIOD = 103224


def pr5_cell5_voltage() -> np.ndarray:
    segs: list[tuple[int, float]] = [(0, -80.0)]
    for k, tv in enumerate(PR5_TEST_V):
        s = PR5_LEAK0 + k * PR5_PERIOD
        segs += [(s, -120.0), (s + 500, -80.0), (s + 2500, 50.0),
                 (s + 22500, tv), (s + 82500, -120.0), (s + 87500, -80.0)]
    return _steps(PR5_N, segs)


# Real Pr4 (inactivation, 16 sweeps): structure from invert_gt_a on
# figure-1-s1/yc-pr4.pt with boundary samples pinned by table-1/yo-pr4.pt.
# Sweep-local layout: -80 | -120 x 500 (leak) | -80 x 2000 | +50 x 6000 |
#   -90 x 600 | test x 1500 | -120 x 5000 | -80 until next sweep.
# First leak sample 2954, period 29006 samples, total 464096 samples.
PR4_TEST_V = tuple(float(x) for x in range(-100, 60, 10))
PR4_N = 464096
PR4_LEAK0 = 2954
PR4_PERIOD = 29006


def pr4_cell5_voltage() -> np.ndarray:
    segs: list[tuple[int, float]] = [(0, -80.0)]
    for k, tv in enumerate(PR4_TEST_V):
        s = PR4_LEAK0 + k * PR4_PERIOD
        segs += [(s, -120.0), (s + 500, -80.0), (s + 2500, 50.0),
                 (s + 8500, -90.0), (s + 9100, tv), (s + 10600, -120.0),
                 (s + 15600, -80.0)]
    return _steps(PR4_N, segs)


# Sweep structure of the multi-sweep recordings: (n_sweeps, samples/sweep).
# Pr3 and Pr4 lengths are exact multiples (578060 = 7*82580,
# 464096 = 16*29006); figure scripts split the same way (figure-2.py:587).
SWEEPS = {
    "pr3-cell5": (7, PR3_PERIOD),
    "pr4-cell5": (16, PR4_PERIOD),
    "pr5-cell5": (9, PR5_PERIOD),
}


# ---------------------------------------------------------------------------
# 5. Asset IO + unified accessor
# ---------------------------------------------------------------------------

_ANALYTIC = {
    "pr3-cell5": pr3_cell5_voltage,
    "pr4-cell5": pr4_cell5_voltage,
    "pr5-cell5": pr5_cell5_voltage,
    "sinewave-cell5": sinewave_cell5_voltage,
}


def save_asset(name: str, v: np.ndarray, dt: float = DT_MS) -> str:
    os.makedirs(ASSET_DIR, exist_ok=True)
    path = os.path.join(ASSET_DIR, f"{name}.npz")
    np.savez_compressed(path, v=np.asarray(v, np.float32), dt=np.float64(dt))
    return path


def load_voltage(name: str) -> tuple[np.ndarray, float]:
    """Per-sample (voltage, dt).  Prefers the reconstructed asset (exact
    recovered samples, e.g. the APs waveform); falls back to the analytic
    builder for protocols with a closed form."""
    path = os.path.join(ASSET_DIR, f"{name}.npz")
    if os.path.exists(path):
        with np.load(path) as z:
            return z["v"].astype(np.float64), float(z["dt"])
    if name in _ANALYTIC:
        return _ANALYTIC[name](), DT_MS
    raise FileNotFoundError(
        f"no protocol asset '{name}' (run scripts/reconstruct_protocols.py)")


def protocol(name: str, dtype=None):
    """Reconstructed real protocol as an ionflux Protocol (linear interp at
    0.1 ms, matching the reference's scipy interp1d semantics)."""
    import jax.numpy as jnp

    from ionflux import protocols as P

    v, dt = load_voltage(name)
    t = np.arange(len(v)) * dt
    return P.from_time_series(t, v, dtype=dtype or jnp.float32)


def available() -> list[str]:
    names = set(_ANALYTIC)
    if os.path.isdir(ASSET_DIR):
        names |= {f[:-4] for f in os.listdir(ASSET_DIR) if f.endswith(".npz")}
    return sorted(names)
