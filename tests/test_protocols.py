import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P


def test_activation_template_matches_reference_layout():
    # train-s1.py:69-80
    p = P.activation_protocol(20.0)
    v = np.asarray(p.v)
    assert v.shape == (80001,)
    assert np.all(v[:10000] == -80)
    assert np.all(v[10000:60000] == 20)
    assert np.all(v[60000:70000] == -40)
    assert np.all(v[70000:75000] == -120)
    assert np.all(v[75000:] == -80)
    assert float(p.duration) == 8000.0


def test_deactivation_template_matches_reference_layout():
    # train-s1.py:84-95
    p = P.deactivation_protocol(-100.0)
    v = np.asarray(p.v)
    assert v.shape == (100001,)
    assert np.all(v[10000:30000] == 50)
    assert np.all(v[30000:90000] == -100)
    assert np.all(v[90000:95000] == -120)


def test_atau_template():
    # train-s1.py:96-114 (t_i = 300 samples of 0.1 ms = 30 ms)
    p = P.atau_protocol(30.0)
    v = np.asarray(p.v)
    assert v.shape == (50001,)
    assert np.all(v[10000:10300] == 40)
    assert np.all(v[10300:35300] == -120)


def test_voltage_linear_interp_and_fallback():
    p = P.Protocol(jnp.float32(0.0), jnp.float32(0.1),
                   jnp.asarray([0.0, 1.0, 3.0], jnp.float32))
    assert float(P.voltage(p, jnp.float32(0.05))) == pytest.approx(0.5)
    assert float(P.voltage(p, jnp.float32(0.15))) == pytest.approx(2.0)
    # out of domain -> -80 (train-s1.py:166-167 ValueError fallback)
    assert float(P.voltage(p, jnp.float32(-1.0))) == -80.0
    assert float(P.voltage(p, jnp.float32(99.0))) == -80.0


def test_voltage_matches_scipy_interp1d_on_csv():
    from scipy.interpolate import interp1d

    p = P.load_csv("/root/reference/test-protocols/ap2hz.csv", dtype=jnp.float64)
    raw = np.loadtxt("/root/reference/test-protocols/ap2hz.csv",
                     skiprows=1, delimiter=",")
    t = raw[:, 0] * 1e3
    f = interp1d(t, raw[:, 1])
    tq = np.linspace(t[0], t[-1], 5001)
    ours = np.asarray(P.voltage(p, jnp.asarray(tq, jnp.float64)))
    ref = f(tq)
    # the CSV time column is not binary-exact; 1e-5 mV slack at ramp knots
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_s_study_masks_match_reference_indices():
    # train-s1.py:52-64
    mask1, mask2 = P.s_study_masks()
    bad1 = (list(range(9995, 10050)) + list(range(59995, 60050))
            + list(range(69995, 70050)) + list(range(74995, 75050)))
    expect1 = np.ones(80001, bool)
    expect1[bad1] = False
    np.testing.assert_array_equal(mask1, expect1)
    bad2 = (list(range(9995, 10050)) + list(range(29995, 30050))
            + list(range(89995, 90050)) + list(range(94995, 95050)))
    expect2 = np.ones(100001, bool)
    expect2[bad2] = False
    np.testing.assert_array_equal(mask2, expect2)


def test_capacitance_masks_match_reference_roll_logic():
    # replicate train-r1.py:99-130 directly and compare
    v = np.asarray(P.activation_protocol(0.0).v)
    n_points, extra = 70, 20
    change_pt = np.append([True], ~(v[1:] != v[:-1]))
    cap = np.copy(change_pt)
    for i in range(n_points):
        cap = cap & np.roll(change_pt, i + 1)
    mask = np.copy(cap)
    for i in range(extra):
        mask = mask & np.roll(change_pt, i + n_points + 1)
        mask = mask & np.roll(change_pt, -i - 1)
    np.testing.assert_array_equal(P.capacitance_mask(v, n_points), cap)
    np.testing.assert_array_equal(P.training_mask(v, n_points, extra), mask)


def test_segment_edges():
    p = P.activation_protocol(20.0)
    t = np.asarray(p.times())
    edges = P.segment_edges(t, np.asarray(p.v))
    np.testing.assert_allclose(
        edges, [1000.0, 6000.0, 7000.0, 7500.0, 8001.0], atol=1e-3
    )


def test_stack_batches_protocols():
    ps = P.activation_family()
    b = P.stack(ps)
    assert b.v.shape == (7, 80001)
    tq = jnp.float32(3000.0)
    import jax

    vs = jax.vmap(lambda pp: P.voltage(pp, tq))(b)
    np.testing.assert_allclose(np.asarray(vs), P.ACTIVATION_STEPS_MV)
