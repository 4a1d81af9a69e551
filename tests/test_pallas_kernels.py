"""Pallas fused-kernel correctness vs the unfused reference ops
(interpret mode on CPU; compiled path exercised on TPU by bench)."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.assemble import field_levels
from atsc_tpu.ops.offset import _scale_planar, apply_pilot_offset
from atsc_tpu.ops.pallas.offset_fir import offset_fir_fused
from atsc_tpu.ops.rrc_filter import rrc_filter_field


def _symbols_from_levels(levels: np.ndarray) -> np.ndarray:
    """Invert the signal map on a golden level field -> int8 symbol values.

    The 12-sample padding tail is level 0.0 in the golden dumps (no valid
    symbol); it never reaches a valid FIR output, so symbol 0 is stored.
    """
    sym = np.rint((levels - P.PILOT_OFFSET + 7.0) / 2.0).astype(np.int8)
    tail = P.PADDED_SYMBOLS - P.RESERVED_SYMBOLS
    sym[..., tail:] = 0
    assert (sym >= 0).all() and (sym <= 7).all()
    return sym


def test_offset_fir_fused_matches_unfused(golden):
    levels = golden["sync"][:2].real.astype(np.float32)
    sym = jnp.asarray(_symbols_from_levels(levels))
    # field 0 starts at phase identity; field 1 continues with the per-field
    # phase advance (reference offset.h scale_ multiplication).
    s = _scale_planar()
    phasor = jnp.asarray([[1.0, 0.0], [s[0], s[1]]], jnp.float32)

    iq_padded, _ = apply_pilot_offset(field_levels(sym), phasor)
    want = np.asarray(rrc_filter_field(iq_padded))  # (2, 2, 260480)

    got = np.asarray(offset_fir_fused(sym, phasor, interpret=True))
    assert got.shape == (2, 2, P.PADDED_OUT)
    n = P.SYMBOLS_PER_FIELD
    err = np.abs(got[..., :n] - want[..., :n]).max()
    assert err < 2e-6, err

    # and against golden IQ directly
    got_c = (got[:, 0, :n] + 1j * got[:, 1, :n]).astype(np.complex64)
    assert np.abs(got_c - golden["iq"][:2]).max() < 5e-6
