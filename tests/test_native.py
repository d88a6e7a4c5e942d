"""Native C++ host solver (ionflux/native) vs the JAX solver."""

import shutil

import jax.numpy as jnp
import numpy as np
import pytest

from ionflux import protocols as P
from ionflux.models import hh_rhs, markov_rhs, MARKOV_Y0_REST
from ionflux.models.registry import HH_B06, MARKOV_B06
from ionflux.solver import odeint

pytestmark = pytest.mark.skipif(shutil.which("g++") is None,
                                reason="no C++ toolchain")


def test_native_hh_matches_jax():
    from ionflux.native import csolve

    proto = P.activation_protocol(20.0, dt_ms=1.0)
    ts = np.linspace(0.0, 8000.0, 801)
    ys_c = csolve("hh", [float(x) for x in HH_B06], 0.0, 1.0,
                  np.asarray(proto.v), ts)

    def rhs(t, y, a):
        return hh_rhs(a[0], t, y, P.voltage(a[1], t))

    ref = odeint(rhs, jnp.array([0.0, 1.0], jnp.float32),
                 jnp.asarray(ts, jnp.float32), (HH_B06, proto),
                 rtol=1e-7, atol=1e-9)
    assert np.max(np.abs(ys_c - np.asarray(ref))) < 1e-4


def test_native_markov_and_sentinel():
    from ionflux.native import csolve

    proto = P.deactivation_protocol(-80.0, dt_ms=1.0)
    ts = np.linspace(0.0, 10000.0, 501)
    ys = csolve("markov", [float(x) for x in MARKOV_B06], 0.0, 1.0,
                np.asarray(proto.v), ts)
    np.testing.assert_allclose(ys.sum(axis=1), 1.0, atol=1e-6)

    bad = csolve("hh", [1e3] * 8, 0.0, 1.0, np.asarray(proto.v), ts,
                 max_steps=500)
    assert np.all(np.isinf(bad))
