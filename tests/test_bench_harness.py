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


def test_bench_zero_always_carries_errors(tmp_path):
    """If every probe fails, the output must say why: the compact stdout
    line carries the error COUNT + the last failure, and the detail file
    records every traceback verbatim (run main() with the probes stubbed
    to fail and check both output contracts)."""
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
    detail = tmp_path / "detail.json"
    out = subprocess.run(
        [sys.executable, "-c", code % repo],
        capture_output=True, text=True, timeout=300,
        env=dict(os.environ, JAX_PLATFORMS="cpu",
                 ATSC_BENCH_DETAIL=str(detail)),
    )
    assert out.returncode == 0, out.stderr[-2000:]
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    # the captured line must survive a bounded tail capture (r4 lesson)
    assert len(line) < 2000, len(line)
    d = json.loads(line)
    assert d["value"] == 0.0
    assert d["extras"]["errors"] >= 1
    assert "chip exploded" in d["extras"]["last_error"]
    full = json.loads(detail.read_text())
    errs = full["extras"]["errors"]
    assert errs and any("chip exploded" in e["error"] for e in errs)


def test_bench_compact_line_is_bounded(tmp_path):
    """The compact emitter's line stays small even with every tier and a
    full TX sweep present — the property that keeps the driver's bounded
    stdout capture parseable."""
    import os

    os.environ["ATSC_BENCH_DETAIL"] = str(tmp_path / "d.json")
    try:
        from bench import _emit

        extras = {"tx": [
            {"batch": b, "format": f, "fields_per_s": 1.0,
             "ms_per_step": 1.0, "samples_per_s": 1.0,
             "realtime_channels": 700.0}
            for b in (256, 384, 512) for f in ("cf32", "cs16", "cs8")
        ]}
        for tier in ("rx", "rx_noisy", "rx_soft", "rx_soft_i8",
                     "rx_adaptive", "rx_adaptive_cadence", "rx_erasure",
                     "rx_soft_noisy", "rx_ntsc"):
            extras[tier] = {"realtime_channels": 123.4, "batch": 512,
                            "composed_ms": 1.0}
            extras[tier + "_sweep"] = [dict(extras[tier]) for _ in range(4)]
        extras["errors"] = [{"probe": "x", "attempt": 0, "error": "e" * 500}]
        result = {"metric": "m", "value": 1.0, "unit": "samples/s",
                  "vs_baseline": 1.0}
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            _emit(result, extras)
        line = buf.getvalue().strip()
        assert len(line) < 2000, len(line)
        d = json.loads(line)
        assert d["extras"]["rx_soft_i8"] == 123.4
        assert d["extras"]["tx"]["realtime_channels"] == 700.0
    finally:
        del os.environ["ATSC_BENCH_DETAIL"]
