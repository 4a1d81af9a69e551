"""Pilot/frequency offset stage: modulate the real field onto the complex
oscillator with per-stream phase continuity.

Behavioral spec: reference src/atsc/offset.h — elementwise complex multiply
by a precomputed oscillator table whose phase advances by a float32 scalar
per field (see tables/oscillator.py for the replicated float32-argument
quirk). Because the symbol field is purely real, the 'complex multiply' is
two real multiplies against the rotated table.

Complex numbers are carried as planar float32 (re, im) throughout the
framework: it is what the TPU vector unit wants, and the final interleaved
(re, im) float32 output is bit-layout-identical to the reference's
complex<float> CF32 stream.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu.tables.oscillator import field_scale, oscillator_table


@functools.lru_cache(maxsize=1)
def _osc_planar() -> tuple[np.ndarray, np.ndarray]:
    t = oscillator_table()
    return t.real.copy(), t.imag.copy()


@functools.lru_cache(maxsize=1)
def _scale_planar() -> np.ndarray:
    s = field_scale()
    return np.array([s.real, s.imag], dtype=np.float32)


def advance_phasor(phasor: jnp.ndarray) -> jnp.ndarray:
    """One field's worth of oscillator phase advance: (B, 2) -> (B, 2).

    Same float32 complex-multiply the reference applies to its table each
    field (offset.h:97-101), factored out so fused kernels that don't call
    apply_pilot_offset can still carry phase continuity."""
    s = _scale_planar()
    sr, si = jnp.float32(s[0]), jnp.float32(s[1])
    return jnp.stack(
        [phasor[:, 0] * sr - phasor[:, 1] * si,
         phasor[:, 0] * si + phasor[:, 1] * sr],
        axis=-1,
    )


def apply_pilot_offset(
    field: jnp.ndarray, phasor: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """field: (B, 261248) float32 real symbols; phasor: (B, 2) float32 (re, im).

    Returns (iq (B, 2, 261248) planar float32, next_phasor (B, 2)).
    """
    osc_re, osc_im = _osc_planar()
    pr = phasor[:, 0:1]
    pi = phasor[:, 1:2]
    tr = jnp.asarray(osc_re)[None, :]
    ti = jnp.asarray(osc_im)[None, :]
    out_re = field * (tr * pr - ti * pi)
    out_im = field * (tr * pi + ti * pr)
    out = jnp.stack([out_re, out_im], axis=1)

    return out, advance_phasor(phasor)
