"""IQ output quantization: CF32 -> CS16 / CS8 native SDR sample formats.

The reference emits only complex<float> (CF32) to SoapySDR
(reference util/atsc_encoder.cpp:75-76), and the SDR driver then converts
to the hardware's native wire format (e.g. the HackRF's 8-bit IQ) on the
host CPU. On TPU the dominant per-step cost is *writing the 8-byte CF32
samples to HBM* (see PERF.md), so emitting the wire format directly from
the fused kernel halves (CS16) or quarters (CS8) the bottleneck traffic
and removes the host-side conversion entirely.

Scaling: one global full-scale constant, derived from the worst-case
analytic peak of the 8VSB baseband so no field can ever clip:

    peak = |phasor| * OSC_AMPLITUDE * max|level| * sum|rrc_taps|

(max|level| = 2*7 - 7 + 1.25 = 8.25; |oscillator| = 0.9; the per-field
phase-continuity phasor drifts from 1 only by float32 rounding). Real
fields stay well below this bound, but a fixed scale keeps the quantizer
stateless and bit-reproducible across sharding/batching.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.rrc import rrc_taps

#: quantized integer full-scale per format (symmetric, avoids -qmax-1)
QMAX = {"cs16": 32767, "cs8": 127}
DTYPE = {"cs16": jnp.int16, "cs8": jnp.int8}
BYTES_PER_SAMPLE = {"cf32": 8, "cs16": 4, "cs8": 2}  # interleaved I+Q


@functools.lru_cache(maxsize=1)
def iq_peak() -> float:
    """Analytic worst-case |I| (= worst-case |Q|) of the baseband output."""
    max_level = 2.0 * 7 - 7 + P.PILOT_OFFSET                      # 8.25
    taps_l1 = float(np.abs(rrc_taps()).sum())
    phasor_slack = 1.0 + 1e-4  # float32 drift bound of the unit phasor
    return phasor_slack * P.OSC_AMPLITUDE * max_level * taps_l1


def quantize_scale(fmt: str) -> float:
    """Multiplier taking float IQ to integer codes for 'cs16'/'cs8'."""
    return QMAX[fmt] / iq_peak()


def quantize_iq(iq: jnp.ndarray, fmt: str) -> jnp.ndarray:
    """float32 IQ -> int16/int8 codes (round-to-nearest-even, clipped).

    The XLA fallback for the fused kernel's in-kernel quantization; both
    apply the identical scale so outputs agree to <=1 LSB (they differ only
    in where the fp32 phasor rotation is applied).
    """
    q = float(QMAX[fmt])
    x = jnp.round(iq * jnp.float32(quantize_scale(fmt)))
    return jnp.clip(x, -q, q).astype(DTYPE[fmt])


def dequantize_iq(iq: np.ndarray, fmt: str) -> np.ndarray:
    """Integer codes -> float32 IQ (host-side, for tests/analysis)."""
    return np.asarray(iq, dtype=np.float32) / np.float32(quantize_scale(fmt))
