from ionflux.ops.smoothing import (
    smooth_np,
    smooth_same_np,
    smooth_same,
    savitzky_golay,
    savitzky_golay_np,
)

__all__ = [
    "smooth_np",
    "smooth_same_np",
    "smooth_same",
    "savitzky_golay",
    "savitzky_golay_np",
]
