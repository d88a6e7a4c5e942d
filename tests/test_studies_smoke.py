"""Smoke tests for the study runners (tiny iteration counts, cached
surfaces where possible) — protects the end-to-end orchestration."""

import os

import numpy as np
import pytest

# the full-runner smoke tests compile several solver variants (~8 min cold
# on the CPU backend); opt in with IONFLUX_SLOW_TESTS=1
slow = pytest.mark.skipif(
    not os.environ.get("IONFLUX_SLOW_TESTS"),
    reason="slow end-to-end smoke tests (set IONFLUX_SLOW_TESTS=1)")

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "out")


@slow
def test_run_study_s1_smoke(tmp_path):
    from ionflux.studies import S1, run_study

    # reuse the cached surface if a real run produced one; else build it
    src = os.path.join(OUT, "s1", "surface.npz")
    outdir = str(tmp_path)
    if os.path.exists(src):
        os.makedirs(outdir, exist_ok=True)
        with open(src, "rb") as s, open(
                os.path.join(outdir, "surface.npz"), "wb") as d:
            d.write(s.read())
    params = run_study(S1, outdir, iters=50, cached=True)
    assert os.path.exists(os.path.join(outdir, "model.npz"))
    assert all(np.isfinite(np.asarray(w)).all() for w, _ in params.net)


@slow
def test_run_real_study_smoke(tmp_path, reference_dir):
    from ionflux.rstudies import R1, run_real_study

    params = run_real_study(R1, str(tmp_path), iters=50)
    assert os.path.exists(os.path.join(str(tmp_path), "model.npz"))
    assert os.path.exists(
        os.path.join(str(tmp_path), "checkpoint-2.params.npz"))
    assert all(np.isfinite(np.asarray(w)).all() for w, _ in params.net)


def test_tune_study_arch_shapes():
    from ionflux.rstudies import init_params, tune_study

    spec = tune_study("s04")  # 1 x 10
    p = init_params(spec)
    shapes = [w.shape for w, _ in p.net]
    assert shapes == [(2, 10), (10, 10), (10, 1)]
