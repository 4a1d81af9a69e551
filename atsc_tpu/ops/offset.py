"""Pilot/frequency offset stage: modulate the real field onto the complex
oscillator with per-stream phase continuity.

Behavioral spec: reference src/atsc/offset.h — elementwise complex multiply
by a precomputed oscillator table whose phase advances by a float32 scalar
per field (see tables/oscillator.py for the replicated float32-argument
quirk). Because the symbol field is purely real, the 'complex multiply' is
two real multiplies against the rotated table.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu.tables.oscillator import field_scale, oscillator_table


@functools.lru_cache(maxsize=1)
def _osc_planar() -> tuple[np.ndarray, np.ndarray]:
    t = oscillator_table()
    return t.real.copy(), t.imag.copy()


FIELD_SCALE = np.complex64(field_scale())


def apply_pilot_offset(
    field: jnp.ndarray, phasor: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """field: (B, 261248) float32 real symbols; phasor: (B,) complex64.

    Returns (iq (B, 261248) complex64, next_phasor (B,) complex64).
    """
    osc_re, osc_im = _osc_planar()
    pr = jnp.real(phasor)[:, None]
    pi = jnp.imag(phasor)[:, None]
    tr = jnp.asarray(osc_re)[None, :]
    ti = jnp.asarray(osc_im)[None, :]
    out_re = field * (tr * pr - ti * pi)
    out_im = field * (tr * pi + ti * pr)
    out = jax.lax.complex(out_re, out_im)
    next_phasor = phasor * jnp.asarray(FIELD_SCALE)
    return out, next_phasor
