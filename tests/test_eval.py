"""Evaluation-harness tests: canonical-shape padding and model dispatch."""

import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.eval import pad_protocol, simulate, simulate_cases
from ionflux.models.registry import HH_B06, SYNTHETIC


def test_pad_protocol_is_result_invariant():
    proto = P.activation_protocol(0.0, dt_ms=1.0)
    padded = pad_protocol(proto, proto.v.shape[-1] + 5000)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    a = simulate("hh", HH_B06, proto, ts, SYNTHETIC)
    b = simulate("hh", HH_B06, padded, ts, SYNTHETIC)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_simulate_cases_matches_individual_solves():
    cases = [
        (P.activation_protocol(20.0, dt_ms=1.0),
         jnp.linspace(0.0, 8000.0, 161, jnp.float32)),
        (P.atau_protocol(300.0, dt_ms=1.0),
         jnp.linspace(0.0, 5000.0, 101, jnp.float32)),
    ]
    outs = simulate_cases("hh", HH_B06, cases, SYNTHETIC)
    for (proto, ts), got in zip(cases, outs):
        ref = simulate("hh", HH_B06, proto, ts, SYNTHETIC)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3)


def test_method_dispatch_adams():
    proto = P.activation_protocol(0.0, dt_ms=1.0)
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    a = simulate("hh", HH_B06, proto, ts, SYNTHETIC)
    b = simulate("hh", HH_B06, proto, ts, SYNTHETIC, method="adams")
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)


def test_simulate_family_pallas_backend_matches_xla():
    """backend='pallas' routes the family sweep through the fused
    fixed-trip kernel (interpret mode here; Mosaic tier on chip)."""
    import jax

    from ionflux.eval import simulate_family
    from ionflux.models import nnf_init
    from ionflux.models.registry import HH_B06, SYNTHETIC

    params = nnf_init(jax.random.PRNGKey(0), HH_B06, n_layers=1, n_nodes=16)
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 20.0)]
    ts = jnp.linspace(0.0, 8000.0, 161, jnp.float32)
    ip = simulate_family("nnf", params, protos, ts, SYNTHETIC,
                         backend="pallas", trips=2048, interpret=True)
    ix = simulate_family("nnf", params, protos, ts, SYNTHETIC)
    assert bool(jnp.all(jnp.isfinite(ip)))
    assert float(jnp.max(jnp.abs(ip - ix))) < 5e-3
