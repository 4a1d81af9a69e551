"""Benchmark harness: sustained encode throughput on the attached TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured against the reference design point of one real-time
8VSB channel (10,762,237.76 IQ samples/s — the implicit baseline of
philburr/atsc, BASELINE.md): value/baseline = simultaneous real-time
channels per chip.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402

# persistent compilation cache: the fused Pallas kernel costs minutes to
# compile over the remote-compile tunnel; repeated bench runs reuse it
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import encode_field, init_state  # noqa: E402


def measure(batch: int, iters: int = 30, warmup: int = 3) -> float:
    """Returns sustained fields/s for `batch` channels on one chip."""
    rng = np.random.default_rng(0)
    ts = jnp.asarray(
        rng.integers(0, 256, size=(batch, P.FIELD_TS_BYTES), dtype=np.uint8)
    )
    step = jax.jit(encode_field, donate_argnums=(0,))
    state = init_state(batch)
    for _ in range(warmup):
        state, iq = step(state, ts)
    float(jnp.sum(iq))  # block_until_ready is unreliable on the axon tunnel;
    # a value fetch is the only sure execution barrier
    t0 = time.perf_counter()
    for _ in range(iters):
        state, iq = step(state, ts)
    float(jnp.sum(iq))  # forces the whole chain via the state dependency
    dt = (time.perf_counter() - t0) / iters
    return batch / dt


def _tpu_alive(timeout_s: int = 240) -> bool:
    """Probe backend registration in a subprocess: a wedged device tunnel
    HANGS jax.devices() rather than failing (observed repeatedly), which
    would otherwise hang the whole bench run."""
    import subprocess

    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; jax.devices(); print('ok')"],
            capture_output=True, text=True, timeout=timeout_s,
        )
        return "ok" in out.stdout
    except subprocess.TimeoutExpired:
        return False


def main() -> None:
    if not _tpu_alive():
        print(json.dumps({
            "metric": "baseband IQ samples/s/chip",
            "value": 0.0,
            "unit": "samples/s",
            "vs_baseline": 0.0,
            "error": "TPU backend unreachable (device tunnel down); "
                     "see PERF.md for the last measured numbers",
        }))
        return
    import signal

    best = 0.0
    best_b = 0
    for batch in (256, 384, 512):
        # convert a mid-run tunnel death (a hang) into an exception
        signal.signal(
            signal.SIGALRM,
            lambda *_: (_ for _ in ()).throw(TimeoutError("tpu hang")),
        )
        signal.alarm(1200)
        try:
            fps = measure(batch)
        except Exception:
            break
        finally:
            signal.alarm(0)
        if fps > best:
            best, best_b = fps, batch
    samples_per_sec = best * P.SYMBOLS_PER_FIELD
    print(
        json.dumps(
            {
                "metric": f"baseband IQ samples/s/chip (batch={best_b} channels)",
                "value": round(samples_per_sec, 1),
                "unit": "samples/s",
                "vs_baseline": round(samples_per_sec / P.SAMPLE_RATE, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
