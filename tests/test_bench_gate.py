"""The driver gates must never hang (CLAUDE.md quirk 11 + the flapping
tunnel): every device touch in bench.py is a bounded, group-killable child,
and dryrun_multichip never touches an uninitialized non-cpu backend."""

import importlib.util
import json
import os
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name, fname):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, fname)
    )
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_run_bounded_kills_the_whole_process_group():
    """A hung child that spawned a pipe-holding grandchild must still be
    reaped at the timeout: plain subprocess.run kills only the child and
    then blocks draining pipes the grandchild keeps open (the exact way the
    round-2 bench gate could hang on the flapping tunnel)."""
    bench = _load("bench_gate_mod", "bench.py")
    cmd = [
        sys.executable,
        "-c",
        "import subprocess, sys, time\n"
        # grandchild inherits our stdout/stderr pipes and outlives the kill
        "subprocess.Popen([sys.executable, '-c', 'import time; time.sleep(600)'])\n"
        "time.sleep(600)\n",
    ]
    t0 = time.monotonic()
    rc, out, err = bench._run_bounded(cmd, 2.0)
    dt = time.monotonic() - t0
    assert rc == -9
    assert dt < 30.0, f"group kill took {dt:.1f}s"


def test_zero_line_is_a_parseable_primary_line():
    bench = _load("bench_gate_mod2", "bench.py")
    parsed = json.loads(bench._zero_line("boom"))
    assert parsed["metric"] == "physics_env_steps_per_sec"
    assert parsed["value"] == 0.0
    assert parsed["vs_baseline"] == 0.0
    assert parsed["error"] == "boom"


def test_safe_device_count_never_touches_uninitialized_backend():
    """In a fresh process aimed at the (possibly dead) remote device,
    _safe_device_count must return 0 immediately instead of initializing
    the backend — jax.devices() blocks forever during a tunnel outage."""
    runner = (
        "import time; t0 = time.monotonic()\n"
        "import __graft_entry__ as g\n"
        "n = g._safe_device_count()\n"
        "dt = time.monotonic() - t0\n"
        "print('COUNT', n, 'DT', round(dt, 1))\n"
        "assert n == 0, n\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", runner],
        cwd=ROOT,
        capture_output=True,
        text=True,
        timeout=240,  # imports only; generous for a loaded 1-cpu box
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "COUNT 0" in proc.stdout, proc.stdout
