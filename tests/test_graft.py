"""Driver-contract smoke: dryrun_multichip in an isolated subprocess (it
rewires JAX backends, so never in-process with the test session)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.skipif(not os.environ.get("IONFLUX_SLOW_TESTS"),
                    reason="subprocess compile ~1-3 min")
def test_dryrun_multichip_subprocess():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "__graft_entry__.py"), "4"],
        capture_output=True, text=True, timeout=600, env=env, cwd=REPO)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "dryrun_multichip ok" in out.stdout
