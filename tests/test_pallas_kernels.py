"""Pallas fused-kernel correctness vs the unfused reference ops
(interpret mode on CPU; compiled path exercised on TPU by bench)."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.offset import _scale_planar, apply_pilot_offset
from atsc_tpu.ops.pallas.offset_fir import offset_fir_fused
from atsc_tpu.ops.rrc_filter import rrc_filter_field


def test_offset_fir_fused_matches_unfused(golden):
    field = jnp.asarray(golden["sync"][:2].real.astype(np.float32))
    # field 0 starts at phase identity; field 1 continues with the per-field
    # phase advance (reference offset.h scale_ multiplication).
    s = _scale_planar()
    phasor = jnp.asarray([[1.0, 0.0], [s[0], s[1]]], jnp.float32)

    iq_padded, _ = apply_pilot_offset(field, phasor)
    want = np.asarray(rrc_filter_field(iq_padded))

    got = np.asarray(offset_fir_fused(field, phasor, interpret=True))
    err = np.abs(got - want).max()
    assert err < 2e-6, err

    # and against golden IQ directly
    got_c = (got[..., 0] + 1j * got[..., 1]).astype(np.complex64)
    assert np.abs(got_c - golden["iq"][:2]).max() < 5e-6
