"""Signal smoothing (reference smoothing.py).

``smooth``: reflect-padded window convolution (reference smoothing.py:73-129).
The reference returns length n + window_len - 1 and every caller trims
``[w//2 : -(w//2)]`` back to n (train-s1.py:681); ``smooth_same`` fuses that.

``savitzky_golay``: least-squares polynomial smoothing/differentiation
(reference smoothing.py:1-71; defined there but unused by the trainers).

Both have jittable JAX forms (convolutions) for on-device pipelines and exact
numpy forms for the offline data-prep path.
"""

from __future__ import annotations

from math import factorial

import jax.numpy as jnp
import numpy as np

_WINDOWS = {
    "flat": lambda n: np.ones(n),
    "hanning": np.hanning,
    "hamming": np.hamming,
    "bartlett": np.bartlett,
    "blackman": np.blackman,
}


def smooth_np(x: np.ndarray, window_len: int = 11, window: str = "hanning") -> np.ndarray:
    """Exact reference semantics: reflect-pad by window_len-1 on each side,
    convolve normalized window, 'valid' mode -> length n + window_len - 1."""
    x = np.asarray(x, dtype=np.float64)
    if x.ndim != 1:
        raise ValueError("smooth only accepts 1-d arrays")
    if len(x) < window_len:
        raise ValueError("input must be longer than the window")
    if window_len < 3:
        return x
    if window not in _WINDOWS:
        raise ValueError(f"unknown window {window!r}")
    s = np.r_[x[window_len - 1:0:-1], x, x[-2:-window_len - 1:-1]]
    w = _WINDOWS[window](window_len)
    return np.convolve(w / w.sum(), s, mode="valid")


def smooth_same_np(x: np.ndarray, window_len: int = 11, window: str = "hanning") -> np.ndarray:
    """smooth(x)[w//2 : -(w//2)] — same-length output, the form every
    reference call site uses (train-s1.py:681 et al.)."""
    h = window_len // 2
    return smooth_np(x, window_len, window)[h:-h] if h else smooth_np(x, window_len, window)


def smooth_same(x: jnp.ndarray, window_len: int = 11, window: str = "hanning") -> jnp.ndarray:
    """Jittable same-length smoothing; matches smooth_same_np.

    Reflect-pads (without repeating the edge sample) then convolves — a pure
    VPU op on TPU, vmappable over batches of segments.
    """
    w = jnp.asarray(_WINDOWS[window](window_len), dtype=x.dtype)
    w = w / jnp.sum(w)
    h = window_len // 2
    if h == 0:
        return x
    left = x[1:h + 1][::-1]
    right = x[-h - 1:-1][::-1]
    s = jnp.concatenate([left, x, right])
    return jnp.convolve(s, w, mode="valid")


def savgol_coeffs(window_size: int, order: int, deriv: int = 0, rate: float = 1.0) -> np.ndarray:
    """Savitzky-Golay filter taps (reference smoothing.py:61-65)."""
    if window_size % 2 != 1 or window_size < 1:
        raise ValueError("window_size must be a positive odd number")
    if window_size < order + 2:
        raise ValueError("window_size too small for the polynomial order")
    half = (window_size - 1) // 2
    b = np.array([[k ** i for i in range(order + 1)]
                  for k in range(-half, half + 1)], dtype=np.float64)
    return np.linalg.pinv(b)[deriv] * rate ** deriv * factorial(deriv)


def savitzky_golay_np(y: np.ndarray, window_size: int, order: int,
                      deriv: int = 0, rate: float = 1.0) -> np.ndarray:
    """Exact reference semantics incl. its signal-extension rule
    (smoothing.py:66-71)."""
    y = np.asarray(y, dtype=np.float64)
    m = savgol_coeffs(window_size, order, deriv, rate)
    half = (window_size - 1) // 2
    first = y[0] - np.abs(y[1:half + 1][::-1] - y[0])
    last = y[-1] + np.abs(y[-half - 1:-1][::-1] - y[-1])
    ypad = np.concatenate((first, y, last))
    return np.convolve(m[::-1], ypad, mode="valid")


def savitzky_golay(y: jnp.ndarray, window_size: int, order: int,
                   deriv: int = 0, rate: float = 1.0) -> jnp.ndarray:
    """Jittable Savitzky-Golay (same extension rule as the reference)."""
    m = jnp.asarray(savgol_coeffs(window_size, order, deriv, rate), y.dtype)
    half = (window_size - 1) // 2
    first = y[0] - jnp.abs(y[1:half + 1][::-1] - y[0])
    last = y[-1] + jnp.abs(y[-half - 1:-1][::-1] - y[-1])
    ypad = jnp.concatenate([first, y, last])
    return jnp.convolve(ypad, m[::-1], mode="valid")
