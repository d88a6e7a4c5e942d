"""Minimal repro for the Mosaic bias-broadcast compiler fault (round 4).

The popsweep kernel's Q occupancy was capped at 8 protocol rows because
any larger launch coredumped the Mosaic compiler with

    F array.h:480  Check failed: limits[i] <= dim(i) (2 vs. 1)

The round-4 bisect (feature toggles -> core strip -> op ladder) landed on
the MLP's per-layer bias add: broadcasting a [P, 1, m] bias onto a
batched-dot result whose second-minor (Q) dim spans >= 2 sublane tiles
(2Q > 16 at f32 sublane 8) inside a loop body.  The fix is fold_bias in
ops/pallas_solve.fused_nnf_popsweep_solve_ft: the bias rides the matmul
as an augmented ones-column weight row, which this probe's `fold` case
demonstrates.

Run each case in its own process (the fault is a process coredump):

    python scripts/probe_mosaic_bias_fault.py bias   # expect: coredump
    python scripts/probe_mosaic_bias_fault.py fold   # expect: OK

If `bias` ever starts passing, the toolchain fixed the underlying bug
and fold_bias (plus POPSWEEP_MAX_ROWS) can be re-evaluated.  Chip-
verified 2026-08-18: Q=8/16/32 popsweep -> 731/1555/2391 solves/s.
"""
import sys

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  "/root/repo/.jax_cache")

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P, Q, M, TRIPS = 64, 16, 16, 64     # Q = 16 -> the dot result spans two
                                    # 8-sublane tiles; Q <= 8 passes


def main(case: str) -> None:
    def kernel(w_ref, b_ref, o_ref):
        def body(i, acc):                               # acc [P, Q]
            if case == "fold":
                x = jnp.stack([acc, 1.0 - acc, jnp.ones_like(acc)],
                              axis=-1)                  # [P, Q, 3]
                wb = jnp.concatenate(
                    [w_ref[...][:, :2, :], b_ref[...][:, None, :]],
                    axis=1)                             # [P, 3, M]
                h = jax.lax.dot_general(
                    x, wb, (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)
            else:
                x = jnp.stack([acc, 1.0 - acc], axis=-1)
                h = jax.lax.dot_general(
                    x, w_ref[...][:, :2, :], (((2,), (1,)), ((0,), (0,))),
                    preferred_element_type=jnp.float32)  # [P, Q, M]
                h = h + b_ref[...][:, None, :]          # THE faulting op
            return jnp.tanh(h[:, :, 0] + 1e-3 * acc)

        acc = jax.lax.fori_loop(
            0, TRIPS, body, jnp.full((P, Q), 0.1, jnp.float32))
        o_ref[...] = jnp.concatenate(
            [acc, jnp.zeros((P, 128 - Q), jnp.float32)], axis=1)

    f = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((P, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    rng = np.random.RandomState(0)
    w = jnp.asarray(rng.randn(P, 3, M) * 0.1, jnp.float32)
    b = jnp.asarray(rng.randn(P, M) * 0.1, jnp.float32)
    out = f(w, b)
    jax.block_until_ready(out)
    print(case, "OK", float(out[0, 0]))


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "bias")
