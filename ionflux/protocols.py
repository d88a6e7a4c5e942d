"""Voltage-clamp protocols (layers L0/L1 of the reference).

The reference represents every protocol as a uniformly sampled (0.1 ms) time
series and evaluates V(t) through ``scipy.interpolate.interp1d`` (linear), with
a ``ValueError -> -80 mV`` fallback outside the domain (reference:
train-s1.py:148-167, 218-237).  That per-RHS-eval host round trip is the
reference's single biggest performance pathology (SURVEY.md §3.1).

Here a protocol is a pytree of device arrays and V(t) is a fused
gather + lerp that lives *inside* the jitted ODE right-hand side:

    x = (t - t0) / dt ;  i = clip(floor(x));  V = lerp(v[i], v[i+1], frac)

Out-of-domain times return -80 mV, matching the reference fallback.

Step-protocol builders reproduce the reference templates exactly
(train-s1.py:67-114 for the 0.1 ms training grids, train-s1.py:429-521 for the
1 ms prediction variants).
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import jax.numpy as jnp
import numpy as np

HOLDING_MV = -80.0  # out-of-domain fallback voltage (train-s1.py:166-167)


class Protocol(NamedTuple):
    """A fixed-form voltage protocol sampled on a uniform time grid (ms, mV).

    Linear interpolation between knots — identical to the reference's
    ``interp1d(t, v)`` on its uniform grids.
    """

    t0: jnp.ndarray  # scalar, ms
    dt: jnp.ndarray  # scalar, ms
    v: jnp.ndarray  # [N] knot voltages, mV

    @property
    def n(self) -> int:
        return self.v.shape[-1]

    @property
    def duration(self) -> jnp.ndarray:
        return self.t0 + (self.v.shape[-1] - 1) * self.dt

    def times(self) -> jnp.ndarray:
        return self.t0 + self.dt * jnp.arange(self.v.shape[-1], dtype=self.v.dtype)


def voltage(p: Protocol, t: jnp.ndarray) -> jnp.ndarray:
    """Evaluate V(t) (linear interp, -80 mV out of domain). Jit/vmap-safe.

    ``t`` may have any shape; broadcasts over it.
    """
    x = (t - p.t0) / p.dt
    n = p.v.shape[-1]
    i = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, n - 2)
    w = x - i.astype(x.dtype)
    lo = jnp.take(p.v, i, axis=-1)
    hi = jnp.take(p.v, i + 1, axis=-1)
    val = lo + w * (hi - lo)
    in_dom = (x >= 0.0) & (x <= jnp.asarray(n - 1, dtype=x.dtype))
    return jnp.where(in_dom, val, jnp.asarray(HOLDING_MV, dtype=val.dtype))


def from_time_series(t: np.ndarray, v: np.ndarray, dtype=jnp.float32) -> Protocol:
    """Build a Protocol from a (possibly irregular) time series by asserting a
    uniform grid (all reference protocols are uniform)."""
    t = np.asarray(t, dtype=np.float64)
    dts = np.diff(t)
    dt = float(np.median(dts))
    if not np.allclose(dts, dt, rtol=1e-6, atol=1e-9):
        raise ValueError("protocol time grid is not uniform")
    return Protocol(
        t0=jnp.asarray(t[0], dtype=dtype),
        dt=jnp.asarray(dt, dtype=dtype),
        v=jnp.asarray(v, dtype=dtype),
    )


def load_csv(path: str, time_in_seconds: bool = True, dtype=jnp.float32) -> Protocol:
    """Load a `time,voltage` CSV (header row), time s -> ms.

    Mirrors ``np.loadtxt(..., skiprows=1) * 1e3`` (train-s1.py:44-45).
    """
    raw = np.loadtxt(path, skiprows=1, delimiter=",")
    t = raw[:, 0] * (1e3 if time_in_seconds else 1.0)
    return from_time_series(t, raw[:, 1], dtype=dtype)


# ---------------------------------------------------------------------------
# Step-protocol templates (reference train-s1.py:67-114 and :429-521).
# All voltages in mV, times in ms.
# ---------------------------------------------------------------------------

ACTIVATION_STEPS_MV = (-60.0, -40.0, -20.0, 0.0, 20.0, 40.0, 60.0)
DEACTIVATION_STEPS_MV = (
    -120.0, -110.0, -100.0, -90.0, -80.0, -70.0, -60.0, -50.0, -40.0,
)
ATAU_DURATIONS_01MS = (30, 100, 300, 1000, 3000, 10000)  # in 0.1 ms samples
ATAU_DURATIONS_MS = (3, 10, 30, 100, 300, 1000)  # 1 ms prediction variant


def _steps_to_values(n: int, segments: Sequence[tuple[int, int, float]]) -> np.ndarray:
    v = np.zeros(n)
    for lo, hi, val in segments:
        v[lo:hi] = val
    return v


def activation_protocol(v_step: float, dt_ms: float = 0.1) -> Protocol:
    """Pr3-like activation template, 8 s (train-s1.py:69-80 at 0.1 ms;
    train-s1.py:431-444 at 1 ms)."""
    s = int(round(1.0 / dt_ms))  # samples per ms
    n = 8000 * s + 1
    v = _steps_to_values(
        n,
        [
            (0, 1000 * s, -80.0),
            (1000 * s, 6000 * s, float(v_step)),
            (6000 * s, 7000 * s, -40.0),
            (7000 * s, 7500 * s, -120.0),
            (7500 * s, n, -80.0),
        ],
    )
    return Protocol(jnp.float32(0.0), jnp.float32(dt_ms), jnp.asarray(v, jnp.float32))


def deactivation_protocol(v_step: float, dt_ms: float = 0.1) -> Protocol:
    """Pr5-like deactivation template, 10 s (train-s1.py:84-95 at 0.1 ms;
    train-s1.py:471-477 at 1 ms)."""
    s = int(round(1.0 / dt_ms))
    n = 10000 * s + 1
    v = _steps_to_values(
        n,
        [
            (0, 1000 * s, -80.0),
            (1000 * s, 3000 * s, 50.0),
            (3000 * s, 9000 * s, float(v_step)),
            (9000 * s, 9500 * s, -120.0),
            (9500 * s, n, -80.0),
        ],
    )
    return Protocol(jnp.float32(0.0), jnp.float32(dt_ms), jnp.asarray(v, jnp.float32))


def atau_protocol(t_step_ms: float, dt_ms: float = 0.1) -> Protocol:
    """Activation-time-constant-at-40mV template, 5 s (train-s1.py:96-114 at
    0.1 ms; train-s1.py:509-521 at 1 ms)."""
    s = int(round(1.0 / dt_ms))
    n = 5000 * s + 1
    ti = int(round(t_step_ms * s))
    v = _steps_to_values(
        n,
        [
            (0, 1000 * s, -80.0),
            (1000 * s, 1000 * s + ti, 40.0),
            (1000 * s + ti, 3500 * s + ti, -120.0),
            (3500 * s + ti, n, -80.0),
        ],
    )
    return Protocol(jnp.float32(0.0), jnp.float32(dt_ms), jnp.asarray(v, jnp.float32))


def activation_family(dt_ms: float = 0.1) -> list[Protocol]:
    return [activation_protocol(v, dt_ms) for v in ACTIVATION_STEPS_MV]


def deactivation_family(dt_ms: float = 0.1) -> list[Protocol]:
    return [deactivation_protocol(v, dt_ms) for v in DEACTIVATION_STEPS_MV]


def atau_family(dt_ms: float = 0.1) -> list[Protocol]:
    durs = ATAU_DURATIONS_MS if dt_ms >= 1.0 else [d * 0.1 for d in ATAU_DURATIONS_01MS]
    return [atau_protocol(d, dt_ms) for d in durs]


# The staircase main section: 19 x 500 ms steps — ascending sawtooth
# (up 40 mV / down 20 mV) from -40 mV to the +40 mV apex, then the mirrored
# descending sawtooth (down 40 / up 20).
STAIRCASE_STEPS_MV = [-40, -60, -20, -40, 0, -20, 20, 0, 40, 20,
                      40, 0, 20, -20, 0, -40, -20, -60, -40]


def staircase_protocol(dt_ms: float = 0.1) -> Protocol:
    """The staircase-ramp protocol (Lei et al. 2019, "Rapid characterization
    of hERG channel kinetics I"), the reference's missing
    ``test-protocols/staircase.csv`` (train-s1.py:266-276).

    Parametric reconstruction: leak step + ramp, +40 mV activation step,
    -120 mV tail, the 19-step staircase (STAIRCASE_STEPS_MV), then the
    signature ending — a +40 mV re-activation step followed by the fast
    ramp down to -120 mV that gives the protocol its name.  Validated
    against FOUR archived prediction logs: the s1/d1 NN-f and s2/d2 NN-d
    archived weights reproduce their logged staircase MAEs (0.218293 /
    0.248812 / 0.059485 / 0.191567) to 0.8% / 1.6% / 2.6% / 7.2% on this
    waveform, and the pixel-extracted s1/999-staircase.png current matches
    the HH_B06 simulation over the full 15 s trace.
    """
    dt = dt_ms
    segs: list[tuple] = [(-80.0, 250.0), (-120.0, 50.0),
                         ("ramp", -120.0, -80.0, 400.0),
                         (-80.0, 200.0), (40.0, 1000.0), (-120.0, 500.0),
                         (-80.0, 1000.0)]
    segs += [(float(v), 500.0) for v in STAIRCASE_STEPS_MV]
    segs += [(-80.0, 1050.0), (40.0, 500.0),
             ("ramp", 40.0, -120.0, 50.0), (-120.0, 400.0), (-80.0, 600.0)]
    arr = []
    for s in segs:
        if s[0] == "ramp":
            _, v0, v1, dur = s
            n = int(round(dur / dt))
            arr.append(v0 + (v1 - v0) * (np.arange(n) + 0.5) / n)
        else:
            v, dur = s
            arr.append(np.full(int(round(dur / dt)), v))
    v = np.concatenate(arr)
    return Protocol(jnp.float32(0.0), jnp.float32(dt),
                    jnp.asarray(v, jnp.float32))


def concat(ps: Sequence[Protocol]) -> Protocol:
    """Concatenate same-dt protocols end-to-end on a continuous time axis
    (the d0 study fits one trace spanning all Pr3 sweeps then all Pr5 sweeps,
    train-d0.py:489-502). Duplicate boundary knots are dropped."""
    dt = float(ps[0].dt)
    vs = [np.asarray(ps[0].v)]
    for p in ps[1:]:
        if abs(float(p.dt) - dt) > 1e-9:
            raise ValueError("concat requires equal dt")
        vs.append(np.asarray(p.v)[1:])
    return Protocol(ps[0].t0, ps[0].dt,
                    jnp.asarray(np.concatenate(vs), ps[0].v.dtype))


def stack(ps: Sequence[Protocol]) -> Protocol:
    """Stack same-length protocols into one batched Protocol [B, N] for
    vmapped solves (the TPU-native parallel axis, SURVEY.md §2 note)."""
    return Protocol(
        t0=jnp.stack([p.t0 for p in ps]),
        dt=jnp.stack([p.dt for p in ps]),
        v=jnp.stack([p.v for p in ps]),
    )


# ---------------------------------------------------------------------------
# Step-boundary / capacitance masks
# ---------------------------------------------------------------------------


def change_points(v: np.ndarray) -> np.ndarray:
    """Boolean array, True where sample CONTINUES the previous voltage.

    Matches ``np.append([True], ~(v[1:] != v[:-1]))`` (train-r1.py:102).
    """
    v = np.asarray(v)
    return np.append([True], v[1:] == v[:-1])


def segment_edges(t: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Times where the voltage changes, plus t[-1]+1 as the final sentinel.

    Matches the reference's ``t_split`` logic (train-s1.py:672-674).
    """
    t, v = np.asarray(t), np.asarray(v)
    t_split = t[np.append([False], v[:-1] != v[1:])]
    return np.append(t_split, t[-1] + 1)


def derivative_mask(n: int, step_indices: Sequence[int], lo: int = 5, hi: int = 50) -> np.ndarray:
    """Mask out samples around voltage steps where derivative estimates are
    unreliable. The s-study masks drop indices [i-5, i+50) around each step
    (train-s1.py:52-64)."""
    mask = np.ones(n, dtype=bool)
    for i in step_indices:
        mask[max(i - lo, 0): min(i + hi, n)] = False
    return mask


def s_study_masks() -> tuple[np.ndarray, np.ndarray]:
    """The exact (mask1, mask2) of train-s1.py:52-64 for the 0.1 ms grids."""
    mask1 = derivative_mask(80001, [10000, 60000, 70000, 75000])
    mask2 = derivative_mask(100001, [10000, 30000, 90000, 95000])
    return mask1, mask2


def capacitance_mask(v: np.ndarray, n_points: int = 70,
                     extra_changes: np.ndarray | None = None) -> np.ndarray:
    """Drop ``n_points`` samples after each voltage step (capacitive spikes).

    Matches train-r1.py:99-116 (7 ms at 0.1 ms -> 70 points; table-1.py uses
    3 ms -> 30). ``extra_changes`` ORs extra "treat as changing" samples into
    the change-point mask (the sinewave window special case,
    train-r1.py:107-109).
    """
    cc = change_points(v)
    if extra_changes is not None:
        cc = cc | extra_changes
    mask = np.copy(cc)
    for i in range(n_points):
        mask &= np.roll(cc, i + 1)
    return mask


def training_mask(v: np.ndarray, n_points: int = 70, extra_points: int = 20,
                  extra_changes: np.ndarray | None = None) -> np.ndarray:
    """Capacitance mask widened by ``extra_points`` on both sides of each step
    (derivative/smoothing guard band). Matches train-r1.py:117-130."""
    cc = change_points(v)
    if extra_changes is not None:
        cc = cc | extra_changes
    mask = capacitance_mask(v, n_points, extra_changes)
    for i in range(extra_points):
        mask &= np.roll(cc, i + n_points + 1)
        mask &= np.roll(cc, -i - 1)
    return mask
