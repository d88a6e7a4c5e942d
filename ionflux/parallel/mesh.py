"""Device-mesh parallelism (the TPU-native replacement for the reference's
only parallelism, PINTS multiprocessing — SURVEY.md §2 note, §5.8).

Axes of parallelism in this domain (no NCCL/MPI analogue needed):
  data  — surface points / protocols / voltage-step sweeps (batch-like)
  pop   — CMA-ES population members / architecture-sweep configs

All helpers target a 1-D or 2-D ``jax.sharding.Mesh`` over ICI; DCN only
enters for multi-host sweeps (not exercised here).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axes: tuple[str, ...] = ("data",),
              shape: tuple[int, ...] | None = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    if shape is None:
        shape = (len(devs),) + (1,) * (len(axes) - 1)
    arr = np.array(devs).reshape(shape)
    return Mesh(arr, axes)


def shard_along(mesh: Mesh, axis: str, x: jnp.ndarray, dim: int = 0):
    """Place ``x`` sharded along mesh axis ``axis`` on array dim ``dim``."""
    spec = [None] * x.ndim
    spec[dim] = axis
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (e.g. model params) across the mesh."""
    return jax.device_put(tree, NamedSharding(mesh, P()))


def pad_to_multiple(x: np.ndarray, m: int, axis: int = 0):
    """Pad dim ``axis`` up to a multiple of ``m`` (for even sharding).
    Returns (padded, original_length)."""
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, mode="edge"), n


def sharded_map(mesh: Mesh, axis: str, fn: Callable):
    """shard_map a per-shard function over one mesh axis (population /
    protocol fan-out). fn sees its local shard; outputs stay sharded."""
    return jax.shard_map(
        fn, mesh=mesh, in_specs=(P(axis),), out_specs=P(axis),
        check_vma=False,
    )
