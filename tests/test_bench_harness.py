"""bench.py failure policy (the round-2 lesson: a perf harness must never
convert an exception into a silent zero). Host-logic only — no TPU."""

import json
import subprocess
import sys


def test_run_probe_captures_every_failure():
    from bench import _run_probe

    errors = []
    out = _run_probe("boom", lambda: 1 / 0, errors, retries=1)
    assert out is None
    assert len(errors) == 2  # the first attempt AND the retry
    assert all(e["probe"] == "boom" for e in errors)
    assert "ZeroDivisionError" in errors[0]["error"]


def test_run_probe_retry_recovers_but_records():
    from bench import _run_probe

    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient")
        return 42.0

    errors = []
    assert _run_probe("flaky", flaky, errors, retries=1) == 42.0
    assert len(errors) == 1 and "transient" in errors[0]["error"]


def test_bench_zero_always_carries_errors():
    """If every probe fails, the one JSON line must say why: run main()
    with the probes stubbed to fail and check the output contract."""
    code = r"""
import json, sys
sys.path.insert(0, %r)
import bench
bench._tpu_alive = lambda **k: True
def dead(*a, **k):
    raise RuntimeError("chip exploded")
bench.measure_tx = dead
bench.measure_rx = dead
bench.measure_rx_soft = dead
bench.measure_rx_noisy = dead
bench.main()
"""
    import os

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = subprocess.run(
        [sys.executable, "-c", code % repo],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    assert d["value"] == 0.0
    errs = d["extras"]["errors"]
    assert errs and any("chip exploded" in e["error"] for e in errs)
