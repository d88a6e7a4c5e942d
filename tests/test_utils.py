"""Utility coverage: protocol concat, observation, timing meters."""

import time

import jax.numpy as jnp
import numpy as np

from ionflux import protocols as P
from ionflux.observe import NOISE_SIGMA, add_noise, gate_current, mae, rmse
from ionflux.utils.timing import StageTimer, solves_per_sec


def test_concat_protocols_continuous_time():
    a = P.activation_protocol(0.0, dt_ms=1.0)   # 8001 knots
    b = P.activation_protocol(40.0, dt_ms=1.0)
    c = P.concat([a, b])
    assert c.v.shape[-1] == 8001 + 8000  # boundary knot dropped
    # values at the junction: end of a, then b's second knot
    t_end_a = float(a.duration)
    va = float(P.voltage(c, jnp.float32(t_end_a - 500.0)))
    vb = float(P.voltage(c, jnp.float32(t_end_a + 1500.0)))
    assert va == -80.0       # a's tail hold
    assert vb == 40.0        # b's step segment


def test_observation_and_metrics():
    y = jnp.array([[0.5, 0.8], [1.0, 0.2]], jnp.float32)
    v = jnp.array([-20.0, 40.0], jnp.float32)
    from ionflux.models.registry import SYNTHETIC

    i = gate_current(y, v, SYNTHETIC)
    np.testing.assert_allclose(
        np.asarray(i), [0.5 * 0.8 * 66.0, 1.0 * 0.2 * 126.0], rtol=1e-6)
    import jax

    noisy = add_noise(jax.random.PRNGKey(0), jnp.zeros(100000, jnp.float32))
    assert abs(float(noisy.std()) - NOISE_SIGMA) < 5e-3
    assert float(mae(jnp.ones(4), jnp.zeros(4))) == 1.0
    assert float(rmse(2 * jnp.ones(4), jnp.zeros(4))) == 2.0


def test_stage_timer_and_throughput_meter():
    timer = StageTimer()
    with timer.stage("work"):
        time.sleep(0.01)
    with timer.stage("work"):
        time.sleep(0.01)
    assert timer.counts["work"] == 2
    assert timer.totals["work"] >= 0.02
    assert "work" in timer.report()

    calls = []

    def fn(x):
        calls.append(1)
        return x + 1

    sps = solves_per_sec(fn, jnp.zeros(4), n_solves=4, reps=3, warmup=1)
    assert sps > 0 and len(calls) == 4


def test_model_bundle_roundtrip(tmp_path):
    import jax

    from ionflux.studies import S1, init_params
    from ionflux.utils.ckpt import load_pytree, save_model_bundle

    params = init_params(S1)
    path = str(tmp_path / "model-entire.npz")
    save_model_bundle(path, params, S1)
    import json
    import os

    with open(path.replace(".npz", "") + ".spec.json") as fh:
        meta = json.load(fh)
    assert meta["name"] == "s1" and meta["model_kind"] == "nnf"
    restored = load_pytree(path, init_params(S1))
    assert all(
        bool((a == b).all()) for a, b in zip(
            jax.tree.leaves(params), jax.tree.leaves(restored)))
