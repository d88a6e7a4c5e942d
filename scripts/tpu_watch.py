"""Opportunistic TPU bench capture (VERDICT r3 #1).

The axon tunnel goes down for 45+ minute stretches; a bench run scheduled
at a fixed time (round end) can land in an outage and cost the round its
on-chip datum (BENCH_r03.json fell back to CPU at 20.5x against a 50x
target).  This watcher loops for the whole round: bounded liveness probe
-> when the tunnel answers, run the full bench (which refreshes
BENCH_TPU_LAST.json on success) -> keep refreshing on a long period so
the freshest capture is never older than one window.

Run detached:  nohup python -u scripts/tpu_watch.py > /tmp/tpu_watch.log &
Stop:          kill $(cat /tmp/tpu_watch.pid)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PROBE_TIMEOUT = float(os.environ.get("IONFLUX_WATCH_PROBE_TIMEOUT", "90"))
DOWN_SLEEP = float(os.environ.get("IONFLUX_WATCH_DOWN_SLEEP", "240"))
UP_SLEEP = float(os.environ.get("IONFLUX_WATCH_UP_SLEEP", "2400"))
MAX_HOURS = float(os.environ.get("IONFLUX_WATCH_MAX_HOURS", "11"))
BENCH_TIMEOUT = float(os.environ.get("IONFLUX_WATCH_BENCH_TIMEOUT", "1500"))


def log(*a):
    print(time.strftime("%H:%M:%S"), *a, flush=True)


def probe(timeout_s: float) -> bool:
    # Must COMPUTE, not just enumerate: one outage mode (2026-08-19)
    # answers device enumeration while every compile/execute hangs.
    code = (
        "import jax;"
        "jax.config.update('jax_compilation_cache_dir',"
        f" {os.path.join(REPO, '.jax_cache')!r});"
        "import jax.numpy as jnp;"
        "x = jnp.ones((128, 128));"
        "print('ndev', len(jax.devices()), 'val', float(jnp.vdot(x, x)))"
    )
    try:
        res = subprocess.run([sys.executable, "-c", code],
                             capture_output=True, text=True,
                             timeout=timeout_s, cwd=REPO)
    except subprocess.TimeoutExpired:
        return False
    return res.returncode == 0 and "ndev" in res.stdout


def run_bench() -> bool:
    env = dict(os.environ)
    env["IONFLUX_BENCH_BUDGET"] = str(BENCH_TIMEOUT - 120.0)
    try:
        res = subprocess.run([sys.executable, os.path.join(REPO, "bench.py")],
                             capture_output=True, text=True,
                             timeout=BENCH_TIMEOUT, cwd=REPO, env=env)
    except subprocess.TimeoutExpired:
        log("bench run timed out")
        return False
    tail = res.stdout.strip().splitlines()[-1:] or [""]
    log("bench line:", tail[0])
    for ln in res.stderr.strip().splitlines()[-8:]:
        log("  |", ln)
    try:
        rec = json.loads(tail[0])
        return rec.get("backend") != "cpu-fallback" and rec.get("value")
    except ValueError:
        return False


def main():
    t0 = time.monotonic()
    with open("/tmp/tpu_watch.pid", "w") as fh:
        fh.write(str(os.getpid()))
    log(f"watcher up (pid {os.getpid()}); probing every {DOWN_SLEEP:.0f}s")
    while time.monotonic() - t0 < MAX_HOURS * 3600:
        if os.path.exists("/tmp/ionflux_bench_hold"):
            log("hold file present; sleeping")
            time.sleep(DOWN_SLEEP)
            continue
        if probe(PROBE_TIMEOUT):
            log("tunnel UP — running bench capture")
            ok = run_bench()
            log("capture", "succeeded" if ok else "failed")
            time.sleep(UP_SLEEP if ok else DOWN_SLEEP)
        else:
            log("tunnel down")
            time.sleep(DOWN_SLEEP)
    log("watcher budget exhausted; exiting")


if __name__ == "__main__":
    main()
