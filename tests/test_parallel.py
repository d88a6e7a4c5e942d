"""Mesh/sharding helpers on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ionflux.parallel import (
    make_mesh,
    pad_to_multiple,
    replicate,
    shard_along,
    sharded_map,
)


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    return make_mesh(8, ("pop",))


def test_shard_and_replicate(mesh):
    x = jnp.arange(64, dtype=jnp.float32).reshape(16, 4)
    xs = shard_along(mesh, "pop", x)
    assert xs.sharding.num_devices == 8
    p = replicate(mesh, {"w": jnp.ones((3,))})
    assert p["w"].sharding.num_devices == 8


def test_sharded_map_population(mesh):
    def per_shard(xs):
        return xs ** 2 + 1.0

    f = sharded_map(mesh, "pop", per_shard)
    x = jnp.arange(16, dtype=jnp.float32).reshape(16, 1)
    xs = shard_along(mesh, "pop", x)
    with mesh:
        out = f(xs)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x) ** 2 + 1.0)


def test_pad_to_multiple():
    x = np.arange(10).reshape(10, 1)
    padded, n = pad_to_multiple(x, 8)
    assert padded.shape[0] == 16 and n == 10
    np.testing.assert_array_equal(padded[9:], np.full((7, 1), 9))


def test_data_parallel_gradient_matches_single_device(mesh):
    """psum-reduced data-parallel gradient == single-device gradient."""
    from jax.sharding import NamedSharding, PartitionSpec as Ps

    w = jnp.array([1.0, -2.0], jnp.float32)
    x = jnp.arange(32, dtype=jnp.float32).reshape(16, 2) / 10.0
    y = jnp.arange(16, dtype=jnp.float32) / 5.0

    def loss(w, x, y):
        return jnp.sum((x @ w - y) ** 2)

    g_single = jax.grad(loss)(w, x, y)
    step = jax.jit(jax.grad(loss),
                   in_shardings=(NamedSharding(mesh, Ps()),
                                 NamedSharding(mesh, Ps("pop", None)),
                                 NamedSharding(mesh, Ps("pop"))),
                   out_shardings=NamedSharding(mesh, Ps()))
    with mesh:
        g_sharded = step(w, x, y)
    np.testing.assert_allclose(np.asarray(g_sharded), np.asarray(g_single),
                               rtol=1e-6)


def test_simulate_population_sharded_matches_unsharded(mesh):
    """The flagship popsweep kernel sharded over the pop axis (one launch
    per device, no collective in the solve) == the single-launch result,
    on the virtual 8-device CPU mesh in interpret mode."""
    from ionflux import protocols as P
    from ionflux.eval import simulate_population, simulate_population_sharded
    from ionflux.models import nnf_init
    from ionflux.models.registry import HH_B06, SYNTHETIC

    pop = jax.vmap(lambda k: nnf_init(k, HH_B06, n_layers=1,
                                      n_nodes=16))(
        jax.random.split(jax.random.PRNGKey(2), 16))
    protos = [P.activation_protocol(v, dt_ms=1.0) for v in (-40.0, 20.0)]
    ts = jnp.linspace(0.0, 8000.0, 81, jnp.float32)
    i_ref = np.asarray(simulate_population("nnf", pop, protos, ts,
                                           SYNTHETIC, trips=1024,
                                           interpret=True))
    i_sh = np.asarray(simulate_population_sharded(
        "nnf", pop, protos, ts, SYNTHETIC, mesh=mesh, trips=1024,
        interpret=True))
    assert i_sh.shape == i_ref.shape == (16, 2, 81)
    # per-shard launches run their OWN shared controller (2 members vs 16
    # per step decision), so step sequences differ within solve tolerance
    np.testing.assert_allclose(i_sh, i_ref, atol=5e-3)

    with pytest.raises(ValueError):
        simulate_population_sharded(
            "nnf", jax.tree.map(lambda x: x[:6], pop), protos, ts,
            SYNTHETIC, mesh=mesh, trips=256, interpret=True)
