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


def test_run_study_s1_smoke(tmp_path):
    """End-to-end s1 pipeline in the DEFAULT suite (VERDICT r2 weak #7):
    surface -> pretrain -> train -> persist -> AP2Hz validation rollout.
    The committed out/s1/surface.npz fixture (subsampled here to bound the
    one-core full-batch cost) skips the ~3 min surface build; without it
    the test skips unless IONFLUX_SLOW_TESTS=1 builds it from scratch."""
    from dataclasses import replace

    from ionflux.studies import S1, run_study

    src = os.path.join(OUT, "s1", "surface.npz")
    outdir = str(tmp_path)
    if os.path.exists(src):
        os.makedirs(outdir, exist_ok=True)
        d = dict(np.load(src))
        np.savez(os.path.join(outdir, "surface.npz"),
                 **{k: v[::8] for k, v in d.items()})
    elif not os.environ.get("IONFLUX_SLOW_TESTS"):
        pytest.skip("out/s1/surface.npz fixture missing; full surface build "
                    "is slow (set IONFLUX_SLOW_TESTS=1)")
    params = run_study(replace(S1, pretrain_iters=100), outdir, iters=50,
                       cached=True)
    assert os.path.exists(os.path.join(outdir, "model.npz"))
    assert os.path.exists(os.path.join(outdir, "model-entire.spec.json"))
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


def test_run_study_validated_selects_best_checkpoint(tmp_path, monkeypatch):
    """The checkpoint-validated default recipe (VERDICT r3 #1): every
    val_every-iter checkpoint of every seed is scored and the global best
    (seed, iter) kept; infinite scores (diverged iterates) are rejected."""
    from dataclasses import replace

    from ionflux.studies import S1, run_study_validated

    src = os.path.join(OUT, "s1", "surface.npz")
    if not os.path.exists(src):
        pytest.skip("out/s1/surface.npz fixture missing")
    d = dict(np.load(src))
    np.savez(os.path.join(str(tmp_path), "surface.npz"),
             **{k: v[::16] for k, v in d.items()})

    calls = []
    # scripted metric: seed 0 diverges, seed 1's SECOND checkpoint is best
    scores = iter([float("inf"), float("inf"), 0.8, 0.2, 0.5, 0.9])

    def metric(spec, params):
        s = next(scores)
        calls.append((spec.init_seed, s))
        return {"score": s}

    params = run_study_validated(
        replace(S1, pretrain_iters=5), str(tmp_path), n_seeds=3,
        iters=2, val_every=1, metric=metric)
    assert len(calls) == 6
    assert os.path.exists(os.path.join(str(tmp_path), "model.npz"))
    assert all(np.isfinite(np.asarray(w)).all() for w, _ in params.net)


def test_d0_fused_lattice_decomposition(monkeypatch):
    """The --fused objective's per-sweep view of the global [::10] score
    lattice must tile the reference's flat-axis subsample exactly — the
    phase shifts across sweeps whenever period % SUB != 0 (Pr5:
    103224 % 10 = 4; train-d0.py:504-505 subsamples the concatenation)."""
    import os
    import sys as _sys

    import numpy as np

    scripts = os.path.join(os.path.dirname(__file__), "..", "scripts")
    monkeypatch.syspath_prepend(scripts)
    monkeypatch.setattr(_sys, "argv",
                        ["train_d0.py", "--cached", "--platform", "cpu"])
    import train_d0 as T

    for n_sweeps, period in ((7, 82580), (9, 103224), (4, 17), (2, 7)):
        idx, msk, counts = T._lattice_decomposition(n_sweeps, period)
        got = np.concatenate(
            [k * period + idx[k][msk[k]] for k in range(n_sweeps)])
        want = np.arange(0, n_sweeps * period, T.SUB)
        assert np.array_equal(got, want), (n_sweeps, period)
        assert counts.sum() == want.size
