"""Root-raised-cosine pulse-shaping FIR stage.

Behavioral spec: reference src/atsc/filter.h:9-69 — anti-causal forward
convolution out[i] = sum_{k=0..111} in[i+k] * c[k] for i in [0, 260416)
over the padded field (the 832-symbol field-sync pad supplies the 111-
sample lookahead exactly, making fields embarrassingly parallel).

Implementation: XLA cross-correlation (`lax.conv_general_dilated` with no
kernel flip — exactly the reference's forward form) over planar re/im
float32, full fp32 precision. The fused Pallas mapper+offset+FIR kernel in
ops/pallas/ supersedes this on the hot path; this op remains the readable,
differentiable fallback used in tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.rrc import rrc_taps


@functools.lru_cache(maxsize=1)
def _kernel() -> np.ndarray:
    return rrc_taps()[: P.RRC_NTAPS].reshape(1, 1, P.RRC_NTAPS)


def rrc_filter_field(iq_planar: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 261248) planar float32 -> (B, 260416, 2) interleaved float32 IQ.

    The interleaved output is bit-layout-identical to the reference's
    complex<float> stream (CF32), ready for an SDR sink.
    """
    b = iq_planar.shape[0]
    planar = iq_planar.reshape(b * 2, 1, P.PADDED_SYMBOLS)
    out = jax.lax.conv_general_dilated(
        planar,
        jnp.asarray(_kernel()),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )  # (2B, 1, 261248-111+1)
    out = out[:, 0, : P.SYMBOLS_PER_FIELD].reshape(b, 2, P.SYMBOLS_PER_FIELD)
    return out.transpose(0, 2, 1)
