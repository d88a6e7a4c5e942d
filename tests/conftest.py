"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
paths are exercised without TPU hardware (driver contract)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# The axon sitecustomize forces jax_platforms="axon,cpu"; override in-process
# so tests run on the virtual 8-device CPU backend regardless.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)  # CPU parity tests run in f64
# Persistent compilation cache: first-time vmap(while_loop) compiles are slow
# on the CPU backend; cache them across test runs.
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import pytest

REFERENCE = "/root/reference"


@pytest.fixture(scope="session")
def reference_dir():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference repo not mounted")
    return REFERENCE


def pt_load(path):
    """Load a reference .pt oracle as numpy (torch-cpu is available in the
    test env; the framework itself never depends on torch)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(obj, "detach"):
        return obj.detach().numpy()
    return obj


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
