"""Pure-numpy executable specification of the ATSC 8VSB encoder.

This is the slow, obviously-correct oracle: a direct statement of the A/53
stage semantics (validated bit-for-bit against the reference's golden
vectors in tests/golden/golden.npz). The JAX/TPU implementation is tested
against both this model and the golden vectors; the model also regenerates
arbitrary-length test fixtures without the C++ toolchain.

Behavioral citations: reference src/atsc/{randomize,reed_solomon,
interleaver,trellis,field_sync,offset,filter}.h and atsc.cpp:79-90.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.galois import rs_encode_segment_np
from atsc_tpu.tables.interleave import interleave_field_np
from atsc_tpu.tables.oscillator import field_scale, oscillator_table
from atsc_tpu.tables.randomizer import randomize_field_np
from atsc_tpu.tables.rrc import rrc_filter_field_np
from atsc_tpu.tables.sync import RESERVED_START, sync_templates
from atsc_tpu.tables.trellis_tables import commutator_gather


def rs_encode_field_np(rand_field: np.ndarray) -> np.ndarray:
    """(312,207) randomized field (parity zeroed) -> RS-encoded field."""
    out = rand_field.reshape(P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES).copy()
    for seg in range(P.DATA_SEGMENTS):
        out[seg, P.SEGMENT_BYTES :] = rs_encode_segment_np(out[seg, : P.SEGMENT_BYTES])
    return out.reshape(-1)


@dataclasses.dataclass
class TrellisState:
    """Per-encoder state: differential precoder D, convolutional D1/D2.

    z2 = D after update (inclusive scan of X2 bits);
    z0 = D1 *before* update (delayed scan of X1 bits);
    trellis.h:12-34 (bit-serial reference model).
    """

    d: np.ndarray  # (12,) uint8 differential precoder state
    d1: np.ndarray  # (12,) uint8
    d2: np.ndarray  # (12,) uint8

    @staticmethod
    def zeros() -> "TrellisState":
        z = lambda: np.zeros(P.TRELLIS_ENCODERS, dtype=np.uint8)
        return TrellisState(z(), z(), z())


def trellis_encode_field_np(
    il_field: np.ndarray, state: TrellisState
) -> tuple[np.ndarray, TrellisState]:
    """Bit-serial oracle. il_field: (64584,) -> (261248,) complex64 padded
    field with data symbols placed by the output commutator, zeros elsewhere.
    Mutates a copy of `state`; returns (field, new_state).
    """
    st = TrellisState(state.d.copy(), state.d1.copy(), state.d2.copy())
    data = il_field.reshape(P.TRELLIS_ROUNDS, P.TRELLIS_ENCODERS, P.TRELLIS_INPUT_BYTES)

    # symbols in round-major stream order (round, encoder, 52)
    symbols = np.zeros(
        (P.TRELLIS_ROUNDS, P.TRELLIS_ENCODERS, 52), dtype=np.int8
    )
    for r in range(P.TRELLIS_ROUNDS):
        for e in range(P.TRELLIS_ENCODERS):
            w = 0
            for byte in data[r, e]:
                for pair in range(4):  # MSB-first: bits (7,6),(5,4),(3,2),(1,0)
                    x2 = (byte >> (7 - 2 * pair)) & 1
                    x1 = (byte >> (6 - 2 * pair)) & 1
                    st.d[e] ^= x2
                    z2 = st.d[e]
                    z0 = st.d1[e]               # output is pre-update state
                    st.d1[e], st.d2[e] = x1 ^ st.d2[e], st.d1[e]
                    symbols[r, e, w] = (z2 << 2) | (x1 << 1) | z0
                    w += 1

    out = np.zeros(P.PADDED_SYMBOLS, dtype=np.complex64)
    position, source = commutator_gather()
    levels = (symbols.reshape(-1)[source] * 2 - 7).astype(np.float32) + np.float32(
        P.PILOT_OFFSET
    )
    out[position] = levels
    return out, st


@dataclasses.dataclass
class EncoderState:
    """The complete carried state of one 8VSB stream (SURVEY.md §5.4)."""

    prev_rs: np.ndarray          # (64584,) previous field's RS output
    trellis: TrellisState        # 36 bits of trellis carries
    saved_symbols: np.ndarray    # (12,) complex64 reserved symbols
    parity: int                  # 0 = even field next, 1 = odd
    phasor: np.complex64         # oscillator phase carried across fields

    @staticmethod
    def initial() -> "EncoderState":
        return EncoderState(
            prev_rs=np.zeros(P.DATA_PER_FIELD, dtype=np.uint8),
            trellis=TrellisState.zeros(),
            saved_symbols=np.full(
                P.RESERVED_SYMBOLS, np.complex64(-7 + 1.25), dtype=np.complex64
            ),
            parity=0,
            phasor=np.complex64(1.0),
        )


def encode_field_np(
    ts_field: np.ndarray, state: EncoderState
) -> tuple[dict[str, np.ndarray], EncoderState]:
    """Run one field through the full pipeline; returns all stage outputs."""
    rand = randomize_field_np(ts_field).reshape(-1)
    rs = rs_encode_field_np(rand)
    il = interleave_field_np(rs, state.prev_rs)
    trellis_out, tstate = trellis_encode_field_np(il, state.trellis)

    # field/segment sync insertion
    template, is_const = sync_templates()
    sync = np.where(is_const, template[state.parity].astype(np.complex64), trellis_out)
    sync[RESERVED_START : RESERVED_START + P.RESERVED_SYMBOLS] = state.saved_symbols
    saved = sync[
        P.SYMBOLS_PER_FIELD - P.RESERVED_SYMBOLS : P.SYMBOLS_PER_FIELD
    ].copy()

    # pilot/frequency offset: float32 complex multiply, matching the
    # reference's per-field scalar phase advance recurrence
    osc = (oscillator_table() * state.phasor).astype(np.complex64)
    offset = (sync * osc).astype(np.complex64)

    iq = rrc_filter_field_np(offset)

    new_state = EncoderState(
        prev_rs=rs.copy(),
        trellis=tstate,
        saved_symbols=saved,
        parity=state.parity ^ 1,
        phasor=np.complex64(state.phasor * np.complex64(field_scale())),
    )
    stages = {
        "rand": rand,
        "rs": rs,
        "il": il,
        "trellis": trellis_out,
        "sync": sync,
        "offset": offset,
        "iq": iq,
    }
    return stages, new_state
