"""Parity vs the reference's stored d-study artifacts.

Loads the reference's trained d1 (NN-f) and d2 (NN-d) weights through the
torch-free reader and reproduces the archived validation MAEs (d1/log2,
d2/log2) that need no missing files: AP2Hz + activation/deactivation/atau
families (23 oracles per study), all against the 3-state Markov ground truth
through OUR solver.  Also asserts our regenerated d2 surface matches the
reference's cache.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P
from ionflux.eval import simulate
from ionflux.models.nn import NNdParams, NNfParams
from ionflux.models.registry import (
    HH_D0_INIT,
    HH_D2_BASE,
    MARKOV_B06,
    SYNTHETIC,
)
from ionflux.observe import mae
from ionflux.utils import load_mlp_state_dict

# d1/log2:4 and blocks below
D1_ORACLES = {
    "ap2hz": 0.116660,
    "act": [0.037936, 0.033357, 0.058684, 0.070097, 0.097757, 0.056332,
            0.079115],
    "deact": [0.088769, 0.014752, 0.024329, 0.021688, 0.045312, 0.051768,
              0.071988, 0.091710, 0.135923],
    "atau": [0.048105, 0.082985, 0.108812, 0.063288, 0.088939, 0.113411],
}
# d2/log2:4 and blocks below
D2_ORACLES = {
    "ap2hz": 0.142651,
    "act": [0.016007, 0.142809, 0.025535, 0.186992, 0.112693, 0.093742,
            0.081199],
    "deact": [0.068925, 0.042911, 0.030354, 0.013487, 0.027477, 0.090801,
              0.136121, 0.095556, 0.174691],
    "atau": [0.011916, 0.049322, 0.083298, 0.053915, 0.105207, 0.136358],
}

TOL = 2e-3  # discrepancy-study traces are stiffer than s1's; f32 slack


def _load(study, reference_dir):
    net = [(jnp.asarray(w), jnp.asarray(b)) for w, b in load_mlp_state_dict(
        f"{reference_dir}/{study}/model-state-dict.pt")]
    if study == "d1":
        return "nnf", NNfParams(net=net, rgate=HH_D0_INIT)
    return "nnd", NNdParams(net=net, hh=HH_D2_BASE)


def _maes(kind, params, protos, ts):
    out = []
    for pr in protos:
        truth = simulate("markov", MARKOV_B06, pr, ts, SYNTHETIC)
        pred = simulate(kind, params, pr, ts, SYNTHETIC)
        out.append(float(mae(pred, truth)))
    return out


@pytest.mark.parametrize("study,oracles",
                         [("d1", D1_ORACLES), ("d2", D2_ORACLES)])
def test_d_study_log_maes(study, oracles, reference_dir):
    kind, params = _load(study, reference_dir)

    ap2hz = P.load_csv(f"{reference_dir}/test-protocols/ap2hz.csv")
    ts = jnp.linspace(0.0, 3000.0, 1501, dtype=jnp.float32)
    got = _maes(kind, params, [ap2hz], ts)[0]
    assert abs(got - oracles["ap2hz"]) < TOL

    ts = jnp.linspace(0.0, 8000.0, 8001, dtype=jnp.float32)
    got = _maes(kind, params, P.activation_family(dt_ms=1.0), ts)
    np.testing.assert_allclose(got, oracles["act"], atol=TOL)

    ts = jnp.linspace(0.0, 10000.0, 10001, dtype=jnp.float32)
    got = _maes(kind, params, P.deactivation_family(dt_ms=1.0), ts)
    np.testing.assert_allclose(got, oracles["deact"], atol=TOL)

    ts = jnp.linspace(0.0, 5000.0, 5001, dtype=jnp.float32)
    got = _maes(kind, params, P.atau_family(dt_ms=1.0), ts)
    np.testing.assert_allclose(got, oracles["atau"], atol=TOL)


def test_d2_surface_matches_reference_cache(reference_dir):
    from ionflux.utils import pt_load

    ours = np.load("/root/repo/out/d2/surface.npz") \
        if __import__("os").path.exists("/root/repo/out/d2/surface.npz") \
        else None
    if ours is None:
        pytest.skip("run scripts/train_d2.py first")
    for name in ("v", "a", "dadt"):
        ref = pt_load(f"{reference_dir}/d2/{name}.pt")
        assert ours[name].shape == ref.shape
        rms = np.sqrt(np.mean((ours[name] - ref) ** 2))
        assert rms < 1e-3, (name, rms)
