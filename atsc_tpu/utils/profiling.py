"""Observability: throughput counters + JAX profiler hooks (SURVEY.md §5.1
— the reference has no instrumentation at all; its only perf tool is the
null-sink binary)."""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field

import jax

from atsc_tpu import params as P


@dataclass
class ThroughputMeter:
    """Tracks fields/samples throughput and real-time margin."""

    t0: float = field(default_factory=time.perf_counter)
    fields: int = 0
    channels: int = 1

    def add_fields(self, n: int) -> None:
        self.fields += n

    @property
    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    @property
    def fields_per_sec(self) -> float:
        return self.fields / max(self.elapsed, 1e-9)

    @property
    def samples_per_sec(self) -> float:
        return self.fields_per_sec * P.SYMBOLS_PER_FIELD

    @property
    def realtime_factor(self) -> float:
        """>1 means faster than the 8VSB sample clock (per stream)."""
        return self.fields_per_sec / self.channels / P.FIELD_RATE

    def summary(self) -> dict:
        return {
            "elapsed_s": round(self.elapsed, 3),
            "fields": self.fields,
            "fields_per_sec": round(self.fields_per_sec, 2),
            "samples_per_sec": round(self.samples_per_sec, 1),
            "realtime_factor_per_channel": round(self.realtime_factor, 2),
        }


@contextlib.contextmanager
def profile(logdir: str = "/tmp/atsc_tpu_profile"):
    """Capture a JAX/XLA device profile (view with tensorboard/xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
