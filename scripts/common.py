"""Shared CLI scaffolding for the study scripts (mirrors the reference's
per-script argparse flags, train-s1.py:20-27)."""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def study_parser(desc: str, real: bool = False) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(desc)
    p.add_argument("--method", type=str,
                   choices=["dopri5", "adams", "vcabm", "rosenbrock"],
                   default="dopri5")
    p.add_argument("--adjoint", action="store_true")
    p.add_argument("--debug", action="store_true")
    p.add_argument("--pred", action="store_true")
    p.add_argument("--cached", action="store_true")
    if real:
        p.add_argument("--smoothi", action="store_true")
        p.add_argument("--info", type=str, default=None,
                       help="architecture id s00..s11 (r1-tune sweep)")
    # framework additions
    p.add_argument("--iters", type=int, default=None,
                   help="override main training iterations")
    p.add_argument("--platform", type=str, default=None,
                   choices=["cpu", "axon", "tpu"])
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--x64", action="store_true")
    p.add_argument("--trace", action="store_true",
                   help="capture a jax.profiler trace of the whole run "
                        "under <outdir>/trace/ (SURVEY §5.1)")
    return p


def _tpu_alive(timeout_s: float = 90.0) -> bool:
    """Bounded TPU-backend probe in a subprocess — a dead axon tunnel hangs
    jax.devices() in-process indefinitely (bench.py:249, VERDICT round 1)."""
    import subprocess

    code = "import jax; print(jax.devices()[0].platform)"
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return False
    return res.returncode == 0 and "cpu" not in res.stdout


def setup(args, default_outdir: str) -> str:
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    elif os.environ.get("IONFLUX_SKIP_TPU_PROBE") != "1":
        # default platform is the axon TPU tunnel; probe it with a bounded
        # subprocess and fall back to CPU instead of hanging forever
        if not _tpu_alive():
            print("TPU backend unreachable — falling back to CPU "
                  "(pass --platform to override)")
            jax.config.update("jax_platforms", "cpu")
    if args.x64:
        jax.config.update("jax_enable_x64", True)
    if getattr(args, "method", None) and args.method != "dopri5":
        import ionflux.eval as _eval

        _eval.DEFAULT_METHOD = args.method
        print(f"solver method: {args.method}")
    if getattr(args, "adjoint", False):
        # accepted for reference-CLI parity but NOT silently: like the
        # reference (train-s1.py:29-32 wires odeint_adjoint, yet the loss
        # is surface regression), study training never differentiates
        # through a solve, so the flag cannot change any result here
        print("--adjoint ignored: study training never differentiates "
              "through a solve (reference parity, train-s1.py:29-32); "
              "scripts/train_neural_ode.py demonstrates the adjoint path")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache = os.path.join(repo, ".jax_cache")
    os.makedirs(cache, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache)
    outdir = args.outdir or os.path.join(repo, "out", default_outdir)
    os.makedirs(outdir, exist_ok=True)
    if getattr(args, "trace", False):
        # whole-run profiler trace (SURVEY §5.1 rebuild note): stopped at
        # interpreter exit so every stage of the script is captured;
        # inspect with xprof/tensorboard or jax.profiler tooling
        import atexit

        trace_dir = os.path.join(outdir, "trace")
        jax.profiler.start_trace(trace_dir)
        atexit.register(jax.profiler.stop_trace)
        print(f"profiler trace -> {trace_dir}")
    return outdir
