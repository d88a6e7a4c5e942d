"""Multi-host (multi-process) mesh support — the DCN tier of §5.8.

The reference's only parallelism is single-host pints multiprocessing
(train-d0.py:538 ``set_parallel(True)``); its natural TPU-native scale-out
is a population sweep sharded over a GLOBAL mesh spanning hosts: members
ride the first mesh axis, each host's chips solve their local lanes, and
the per-member losses all-gather back over DCN.  This module provides the
process plumbing; ``fit.cmaes.shard_objective`` is multi-process aware and
uses the helpers here whenever ``jax.process_count() > 1``.

The driver pattern is SPMD: every process runs the SAME training script
(same CMA-ES seed, so every process proposes the identical population),
calls :func:`init_multihost` first, builds the mesh with
:func:`global_mesh`, and passes it to ``shard_objective`` — nothing else
changes relative to single-host code.  Verified end-to-end without TPU
hardware by a 2-process x 4-CPU-device gloo run
(tests/test_multihost.py), which exercises the same
``make_array_from_callback`` / replicate-gather path a real multi-host
TPU pod uses over DCN.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def init_multihost(coordinator_address: str | None = None,
                   num_processes: int | None = None,
                   process_id: int | None = None,
                   local_cpu_devices: int | None = None) -> None:
    """Join this process to a multi-process JAX runtime.

    On TPU pods the three arguments are discovered from the environment
    and may be omitted (jax.distributed.initialize autodetects).  For the
    CPU-backend rehearsal path (this box, CI) pass them explicitly or via
    IONFLUX_COORDINATOR / IONFLUX_NUM_PROCS / IONFLUX_PROC_ID, and set
    ``local_cpu_devices`` to give each process a virtual device count;
    CPU cross-process collectives go through gloo.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "IONFLUX_COORDINATOR")
    if num_processes is None and os.environ.get("IONFLUX_NUM_PROCS"):
        num_processes = int(os.environ["IONFLUX_NUM_PROCS"])
    if process_id is None and os.environ.get("IONFLUX_PROC_ID"):
        process_id = int(os.environ["IONFLUX_PROC_ID"])
    if local_cpu_devices is not None:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", local_cpu_devices)
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)


def global_mesh(axes: tuple[str, ...] = ("pop",),
                shape: tuple[int, ...] | None = None) -> Mesh:
    """Mesh over ALL global devices, host-major: with the default flat
    ("pop",) axis, consecutive blocks of lanes land on one host's chips,
    so the per-shard solve stays on-host and only the loss all-gather
    crosses DCN."""
    devs = jax.devices()  # global, process-major on multi-host
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    return Mesh(np.array(devs).reshape(shape), axes)


def scatter_global(mesh: Mesh, x_full: np.ndarray, dim: int = 0,
                   axis: str | None = None) -> jax.Array:
    """Build a global jax.Array sharded along ``axis`` on dim ``dim`` from
    a host array every process holds in full (the SPMD replicated-driver
    case: each process ran the same CMA-ES step and proposes the same
    population).  Each process materialises only its addressable shards."""
    axis = axis or mesh.axis_names[0]
    spec = [None] * x_full.ndim
    spec[dim] = axis
    sharding = NamedSharding(mesh, P(*spec))
    x_full = np.asarray(x_full)
    return jax.make_array_from_callback(
        x_full.shape, sharding, lambda idx: x_full[idx])


def gather_global(mesh: Mesh, x: jax.Array) -> np.ndarray:
    """Replicate a sharded array across the mesh (all-gather — over DCN
    for the cross-host hop) and return it as host numpy on EVERY process."""
    rep = jax.jit(lambda a: a,
                  out_shardings=NamedSharding(mesh, P()))(x)
    return np.asarray(rep)
