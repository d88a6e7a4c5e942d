"""Multi-host (multi-process) mesh rehearsal — SURVEY.md §5.8's DCN tier.

The reference's only parallelism is single-host pints multiprocessing
(train-d0.py:538); our scale-out story is a population objective sharded
over a global mesh spanning hosts.  No multi-host TPU hardware exists in
this environment, so this test rehearses the EXACT code path on CPU: two
OS processes (gloo collectives) x 4 virtual devices each form one global
8-device mesh, and fit.cmaes.shard_objective routes the population through
parallel.multihost.scatter_global / gather_global — the same calls a real
pod makes over DCN.  Both processes must return the identical loss vector,
bit-equal to the single-process 8-device run.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = """
import json, os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", {repo!r} + "/.jax_cache")
from ionflux.parallel import init_multihost, global_mesh
init_multihost(local_cpu_devices=4)

import jax.numpy as jnp
from ionflux import protocols as P
from ionflux.fit.cmaes import shard_objective
from worker_objective import batch_fn

mesh = global_mesh(("pop",))
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4
obj = shard_objective(mesh, batch_fn=batch_fn, popsize=8, n_params=4)
xs = np.linspace(0.8, 1.2, 8 * 4, dtype=np.float32).reshape(8, 4)
losses = obj(xs)
print("LOSSES " + json.dumps([float(v) for v in losses]), flush=True)
"""

OBJECTIVE = """
import jax.numpy as jnp
from ionflux import protocols as P
from ionflux.models.registry import HH_B06
from ionflux.solver import odeint_batched

_PROTO = P.activation_protocol(20.0, dt_ms=1.0)
_TS = jnp.linspace(0.0, 400.0, 9, dtype=jnp.float32)


def _rhs(t, y, scale):
    v = P.voltage(_PROTO, t)
    k1 = scale[:, 0] * HH_B06.p1 * jnp.exp(HH_B06.p2 * v)
    k2 = scale[:, 1] * HH_B06.p3 * jnp.exp(-HH_B06.p4 * v)
    k3 = scale[:, 2] * HH_B06.p5 * jnp.exp(HH_B06.p6 * v)
    k4 = scale[:, 3] * HH_B06.p7 * jnp.exp(-HH_B06.p8 * v)
    dadt = k1 * (1 - y[:, 0]) - k2 * y[:, 0]
    drdt = -k3 * y[:, 1] + k4 * (1 - y[:, 1])
    return jnp.stack([dadt, drdt], axis=-1)


def batch_fn(xs):
    b = xs.shape[0]
    y0 = jnp.tile(jnp.array([0.0, 1.0], jnp.float32), (b, 1))
    ys = odeint_batched(_rhs, y0, _TS, xs, rtol=1e-5, atol=1e-7,
                        buffer_size=512)
    open_prob = ys[:, :, 0] * ys[:, :, 1]
    return jnp.sum((open_prob - 0.5) ** 2, axis=-1)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_global_mesh_objective(tmp_path):
    (tmp_path / "worker_objective.py").write_text(OBJECTIVE)
    (tmp_path / "worker.py").write_text(WORKER.format(repo=REPO))
    port = _free_port()

    procs = []
    for pid in range(2):
        env = dict(os.environ,
                   IONFLUX_COORDINATOR=f"127.0.0.1:{port}",
                   IONFLUX_NUM_PROCS="2",
                   IONFLUX_PROC_ID=str(pid),
                   JAX_PLATFORMS="",
                   PYTHONPATH=str(tmp_path))
        procs.append(subprocess.Popen(
            [sys.executable, str(tmp_path / "worker.py")],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True, env=env, cwd=str(tmp_path)))
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=600)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    loss_vecs = []
    for out, p in zip(outs, procs):
        assert p.returncode == 0, out[-3000:]
        lines = [ln for ln in out.splitlines() if ln.startswith("LOSSES ")]
        assert lines, out[-3000:]
        loss_vecs.append(np.array(json.loads(lines[-1][7:])))

    # both processes saw the full, identical loss vector (DCN all-gather)
    np.testing.assert_array_equal(loss_vecs[0], loss_vecs[1])

    # and it matches the single-process 8-device mesh bit-for-bit: the
    # per-device shard shapes are identical, only the transport differs
    sys.path.insert(0, str(tmp_path))
    try:
        import worker_objective
        from ionflux.fit.cmaes import shard_objective
        from ionflux.parallel import make_mesh
        mesh = make_mesh(8, axes=("pop",))
        obj = shard_objective(mesh, batch_fn=worker_objective.batch_fn,
                              popsize=8, n_params=4)
        xs = np.linspace(0.8, 1.2, 8 * 4, dtype=np.float32).reshape(8, 4)
        expect = obj(xs)
    finally:
        sys.path.remove(str(tmp_path))
    np.testing.assert_allclose(loss_vecs[0], expect, rtol=1e-6, atol=0)
    assert np.all(np.isfinite(expect))
