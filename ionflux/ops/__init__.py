from ionflux.ops.spline import tridiag_solve, cubic_spline_m, spline_derivative
from ionflux.ops.smoothing import (
    smooth_np,
    smooth_same_np,
    smooth_same,
    savitzky_golay,
    savitzky_golay_np,
)

__all__ = [
    "tridiag_solve",
    "cubic_spline_m",
    "spline_derivative",
    "smooth_np",
    "smooth_same_np",
    "smooth_same",
    "savitzky_golay",
    "savitzky_golay_np",
]
