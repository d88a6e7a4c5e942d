"""Protocol-reconstruction parity: the recovered cell-5 protocols reproduce
the reference's stored trajectories/traces through our solver.

Fast tier: step-table invariants + mask-gap bracket consistency against the
r1 surface cache (pure numpy).  Simulation parity on the full 80k-929k-point
protocols is exercised by scripts/reconstruct_protocols.py and the slow tier
(IONFLUX_SLOW_TESTS=1).
"""

import os

import numpy as np
import pytest

from ionflux import protorec as R

SLOW = os.environ.get("IONFLUX_SLOW_TESTS") == "1"


def test_step_tables_shapes_and_levels():
    v3 = R.pr3_cell5_voltage()
    v5 = R.pr5_cell5_voltage()
    v4 = R.pr4_cell5_voltage()
    vs = R.sinewave_cell5_voltage()
    assert len(v3) == R.PR3_N and len(v5) == R.PR5_N
    assert len(v4) == R.PR4_N and len(vs) == 80000
    # holding potential everywhere before the first leak step
    assert np.all(v3[:R.PR3_LEAK0] == -80.0)
    assert np.all(v5[:R.PR5_LEAK0] == -80.0)
    assert np.all(v4[:R.PR4_LEAK0] == -80.0)
    # test-step levels appear in order
    for k, tv in enumerate(R.PR3_TEST_V):
        assert v3[R.PR3_LEAK0 + k * R.PR3_PERIOD + 2500] == tv
    for k, tv in enumerate(R.PR5_TEST_V):
        assert v5[R.PR5_LEAK0 + k * R.PR5_PERIOD + 22500] == tv
    for k, tv in enumerate(R.PR4_TEST_V):
        assert v4[R.PR4_LEAK0 + k * R.PR4_PERIOD + 9100] == tv
    # sine window carries the published waveform, steps elsewhere
    assert vs[30001] != -80.0 and vs[30000] == -80.0
    assert vs[65001] == -120.0
    x = (np.arange(30001, 65001) * R.DT_MS) - 2500.0
    form = (-30.0 + 54.0 * np.sin(0.007 * x) + 26.0 * np.sin(0.037 * x)
            + 10.0 * np.sin(0.19 * x))
    np.testing.assert_allclose(vs[30001:65001], form, atol=1e-9)


def test_pr3_pr5_match_r1_surface_samples(reference_dir):
    """Every retained (t, V) sample of the reference's real training surface
    (r1/t.pt, r1/v.pt — train-r1.py:796-800) must equal our step tables."""
    from ionflux.utils.ptload import pt_load

    t = np.asarray(pt_load(f"{reference_dir}/r1/t.pt"))
    v = np.asarray(pt_load(f"{reference_dir}/r1/v.pt"))
    si = np.round(t / R.DT_MS).astype(np.int64)
    v3 = R.pr3_cell5_voltage()
    v5 = R.pr5_cell5_voltage()
    in3 = si < R.PR3_N
    np.testing.assert_array_equal(v3[si[in3]], v[in3])
    loc = si[~in3] - (R.PR3_N - 1)
    np.testing.assert_array_equal(v5[loc], v[~in3])


def test_aps_asset_present_and_sane():
    v, dt = R.load_voltage("aps-cell5")
    assert len(v) == 88245 and dt == R.DT_MS
    assert np.all(np.isfinite(v))
    assert -140.0 < v.min() <= -80.0 and 0.0 < v.max() < 80.0
    # initial hold sits at the holding potential (recorded noise ~1 mV)
    assert np.all(np.abs(v[:2400] + 80.0) < 2.0)


def test_protocol_accessor_roundtrip():
    import jax.numpy as jnp

    from ionflux import protocols as P

    pr = R.protocol("pr4-cell5")
    vq = P.voltage(pr, jnp.asarray([0.0, 295.4, 845.4, 1210.0]))
    np.testing.assert_allclose(np.asarray(vq), [-80.0, -120.0, 50.0, -100.0],
                               atol=5e-3)  # f32 knot-index arithmetic


@pytest.mark.skipif(not SLOW, reason="full-length simulation parity is slow")
def test_sinewave_gta_trajectory_parity(reference_dir):
    import jax.numpy as jnp

    from ionflux import protocols as P
    from ionflux.eval import solve_states
    from ionflux.models.registry import MARKOV_B06
    from ionflux.utils.ptload import pt_load

    a_ref, _ = pt_load(f"{reference_dir}/figure-1-s2/yc-sinewave.pt")
    v, dt = R.load_voltage("sinewave-cell5")
    t = np.arange(len(v)) * dt
    proto = P.from_time_series(t, v, dtype=jnp.float64)
    ts = jnp.asarray(t, jnp.float64)
    y0 = jnp.asarray(np.array([0.0, 0.0]), jnp.float64)
    ys = solve_states("gta", MARKOV_B06, proto, ts, y0=y0, rtol=1e-7,
                      atol=1e-9, max_steps=1_000_000, buffer_size=65536)
    rmse = float(np.sqrt(np.mean(
        (np.asarray(ys)[:, 0] - np.asarray(a_ref, np.float64)) ** 2)))
    assert rmse < 1e-3, rmse


def test_sinewave_hh_current_parity_f32(reference_dir):
    """The recovered sinewave protocol reproduces the stored clean d0-HH
    current through our f32 solver (the full-precision build-time check is
    scripts/reconstruct_protocols.py; this guards the shipped asset)."""
    import jax.numpy as jnp

    from ionflux import protocols as P
    from ionflux.eval import simulate
    from ionflux.models.registry import HH_D0_FIT, TABLE1
    from ionflux.utils.ptload import pt_load

    v, dt = R.load_voltage("sinewave-cell5")
    t = np.arange(len(v)) * dt
    proto = P.from_time_series(t, v)
    ts = jnp.asarray(t, jnp.float32)
    i = simulate("hh", HH_D0_FIT, proto, ts, TABLE1, max_steps=400_000,
                 buffer_size=32768)
    yo = np.asarray(pt_load(f"{reference_dir}/table-1/yo-sinewave.pt"),
                    np.float64).reshape(-1)
    rmse = float(np.sqrt(np.mean((np.asarray(i, np.float64) - yo) ** 2)))
    assert rmse < 2e-3, rmse


def test_pr4_chained_gta_trajectory_parity_f32(reference_dir):
    """The Pr4 step table + chained solver reproduce the stored gt_a
    trajectory (f32, guards simulate_long / solve_states_long)."""
    import jax.numpy as jnp

    from ionflux.eval import solve_states_long
    from ionflux.models.registry import MARKOV_B06
    from ionflux.utils.ptload import pt_load

    a_ref, _ = pt_load(f"{reference_dir}/figure-1-s1/yc-pr4.pt")
    ys = solve_states_long("gta", MARKOV_B06, "pr4-cell5",
                           y0=jnp.asarray([0.0, 0.0], jnp.float32))
    rmse = float(np.sqrt(np.mean(
        (np.asarray(ys)[:, 0] - np.asarray(a_ref, np.float64)) ** 2)))
    assert rmse < 1e-3, rmse
