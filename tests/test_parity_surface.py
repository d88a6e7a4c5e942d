"""Parity of the full s1 data-generation + surface-estimation pipeline vs the
reference's cached tensors s1/{v,a,dadt}.pt (132410 points).

Noise draws are replicated bit-exactly (np.random.seed(0) stream); remaining
differences come from f32-vs-f64 ground-truth solves feeding the spline fits.
Acceptance: RMSE <= 1e-3 (BASELINE.md north star); V must match exactly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P
from ionflux.data import synth_study_currents
from ionflux.models.registry import HH_B06, SYNTHETIC
from ionflux.surface import SurfaceConfig, concat_surfaces, estimate_gate_surface
from ionflux.utils import pt_load


@pytest.fixture(scope="module")
def s1_surface(reference_dir):
    t1 = jnp.linspace(0.0, 8000.0, 80001, dtype=jnp.float32)
    t2 = jnp.linspace(0.0, 10000.0, 100001, dtype=jnp.float32)
    act, deact = synth_study_currents(HH_B06, t1, t2)
    mask1, mask2 = P.s_study_masks()
    cfg = SurfaceConfig()
    parts = [
        estimate_gate_surface(pr, t1, act[k], HH_B06, SYNTHETIC, mask1, cfg)
        for k, pr in enumerate(P.activation_family())
    ] + [
        estimate_gate_surface(pr, t2, deact[k], HH_B06, SYNTHETIC, mask2, cfg)
        for k, pr in enumerate(P.deactivation_family())
    ]
    return concat_surfaces(parts)


def test_surface_matches_reference_cache(s1_surface, reference_dir):
    v, a, dadt = s1_surface
    vref = pt_load(f"{reference_dir}/s1/v.pt")
    aref = pt_load(f"{reference_dir}/s1/a.pt")
    dref = pt_load(f"{reference_dir}/s1/dadt.pt")
    assert v.shape == vref.shape == (132410,)
    np.testing.assert_array_equal(v, vref)
    assert np.sqrt(np.mean((a - aref) ** 2)) < 1e-3
    assert np.sqrt(np.mean((dadt - dref) ** 2)) < 1e-3
