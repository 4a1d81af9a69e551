"""Symbol-domain receive chain: the exact inverses of the transmit FEC
stages, recovering transport-stream bytes from 8VSB symbol fields.

The reference has no receive path at all — its RS decoder is dead code
(reference src/atsc/reed_solomon.h:41-190, never called). This module
makes the full inverse chain live:

    field symbols -> de-commutate (gather) -> trellis decode (local XOR)
    -> de-interleave (gather vs previous field) -> RS(207,187) error
    correction (ops/rs_decode.py) -> de-randomize -> TS packets

Every step is the algebraic inverse of the encoder's table/permutation
form, so each becomes one precomputed gather or an elementwise XOR:

* De-commutator: invert tables/trellis_tables.py's commutator gather —
  the data slots of the padded field, back in encoder-major stream order.
* Trellis decode: hard-decision and *local* — z1 IS the lower input bit
  (reference trellis.h:23-34: Z1 = X1), and the differential precoder
  inverts as X2[s] = z2[s] XOR z2[s-1] (trellis.h:12-21), needing only
  one carried z2 bit per encoder. The z0 redundancy bit is unused here
  (a soft/over-the-air receiver would Viterbi it; for clean-signal
  loopback and byte-error injection RS(207,187) provides the margin).
* De-interleaver: the reference's scatter table *is* the deinterleave
  gather — input byte i of RS field N was delivered to position pos[i]
  of interleaved field N+field_bit[i] (tables/interleave.py), so RS
  field N gathers from received fields N and N+1 (one field latency,
  previous received field is the only carried state).
* De-randomizer: the PN XOR is self-inverse; re-insert the 0x47 syncs.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.interleave import _scatter_table
from atsc_tpu.tables.randomizer import randomizer_table
from atsc_tpu.tables.trellis_tables import (
    commutator_gather,
    encoder_stream_to_round_major,
)

_NSYM = P.TRELLIS_SYMBOLS_PER_ENCODER       # 21,528 symbols per encoder
_NB = P.TRELLIS_BYTES_PER_ENCODER           # 5,382 bytes per encoder
_LEN = P.DATA_PER_FIELD                     # 64,584


@functools.lru_cache(maxsize=1)
def _decommutate_src() -> np.ndarray:
    """(12*21528,) int32: padded-field position of each encoder-major
    trellis symbol (inverse of the assemble stage's gather)."""
    position, source = commutator_gather()   # round-major source indices
    perm = encoder_stream_to_round_major()   # round_major[i] = enc_major[perm[i]]
    table = np.full(P.TRELLIS_ENCODERS * _NSYM, -1, dtype=np.int32)
    table[perm[source]] = position
    assert (table >= 0).all()
    return table


@functools.lru_cache(maxsize=1)
def _deinterleave_src() -> np.ndarray:
    """(64584,) int32 gather into concat([cur, prev]) interleaved fields
    (round-major byte order): RS field N's byte i sits at pos[i] of
    interleaved field N + field_bit[i] — cur is field N+1 here."""
    scatter = _scatter_table()
    pos = (scatter & 0xFFFF).astype(np.int64)
    field_bit = (scatter >> 16).astype(np.int64)
    return (pos + _LEN * (1 - field_bit)).astype(np.int32)


def decommutate_field(field: jnp.ndarray) -> jnp.ndarray:
    """(B, >=260416) int8 symbol field -> (B, 12, 21528) int8 trellis
    symbols in encoder-major stream order."""
    syms = jnp.take(field, jnp.asarray(_decommutate_src()), axis=-1)
    return syms.reshape(field.shape[0], P.TRELLIS_ENCODERS, _NSYM)


def trellis_decode_field(
    symbols: jnp.ndarray, z2_prev: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Invert the 12-way trellis encode (hard-decision).

    symbols: (B, 12, 21528) int8 3-bit symbols (encoder-major);
    z2_prev: (B, 12) int32 — last z2 bit of each encoder's previous field
    (the differential precoder state; 0 at cold start, matching the
    encoder's zeroed initial state).
    Returns (bytes (B, 12, 5382) uint8, new z2_prev (B, 12) int32).
    """
    # uint8 end-to-end: the bit algebra never exceeds a byte (the packed
    # byte is exact mod 256), and 8-bit planes quarter the HBM traffic
    # of the int32 formulation — measured 11.75 -> 5.15 ms at B=512 on
    # the v5e, bit-identical (PERF.md round-4 log)
    s = symbols.astype(jnp.uint8)
    z2 = (s >> 2) & 1
    x1 = (s >> 1) & 1                          # z1 = X1 verbatim
    z2_shifted = jnp.concatenate(
        [z2_prev.astype(jnp.uint8)[..., None], z2[..., :-1]], axis=-1
    )
    x2 = z2 ^ z2_shifted                       # differential decode
    b = s.shape[0]
    x2p = x2.reshape(b, P.TRELLIS_ENCODERS, _NB, 4)
    x1p = x1.reshape(b, P.TRELLIS_ENCODERS, _NB, 4)
    # MSB-first bit pairs: pair p occupies bits (7-2p, 6-2p)
    weights2 = jnp.asarray([128, 32, 8, 2], dtype=jnp.uint8)
    weights1 = jnp.asarray([64, 16, 4, 1], dtype=jnp.uint8)
    bytes_ = jnp.sum(x2p * weights2 + x1p * weights1, axis=-1,
                     dtype=jnp.uint8)
    return bytes_, (z2[..., -1]).astype(jnp.int32)


def enc_major_to_round_major(bytes_enc: jnp.ndarray) -> jnp.ndarray:
    """(B, 12, 5382) encoder-major bytes -> (B, 64584) round-major
    interleaved field (j = (round*12 + enc)*13 + col)."""
    b = bytes_enc.shape[0]
    x = bytes_enc.reshape(
        b, P.TRELLIS_ENCODERS, P.TRELLIS_ROUNDS, P.TRELLIS_INPUT_BYTES
    )
    return x.transpose(0, 2, 1, 3).reshape(b, _LEN)


def deinterleave_field(
    cur_il: jnp.ndarray, prev_il: jnp.ndarray
) -> jnp.ndarray:
    """Recover the RS field whose bytes span the two received fields.

    cur_il/prev_il: (B, 64584) uint8 round-major interleaved fields N+1
    and N. Returns RS field N (B, 64584) uint8.
    """
    both = jnp.concatenate([cur_il, prev_il], axis=-1)
    return jnp.take(both, jnp.asarray(_deinterleave_src()), axis=-1)


def propagate_erasure_flags(
    flag_field: jnp.ndarray, prev_flag_il: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Carry per-symbol unreliability flags through the inverse chain.

    A symbol flagged unreliable (e.g. by the receiver's burst detector,
    ops/erasures.py) marks its trellis byte, which lands in some RS
    codeword position — the *same* gathers decode_field uses move the
    flags, so each codeword learns exactly which of its bytes came from
    flagged symbols and RS can treat them as erasures (twice the
    correction budget of unknown-position errors).

    flag_field: (B, >=260416) uint8/bool flags of received field k;
    prev_flag_il: (B, 64584) uint8 carried flags (previous field).
    Returns (codeword flags (B, 312, 207) uint8 for RS field k-1,
    new carried flags (B, 64584) uint8).
    """
    f = decommutate_field(flag_field.astype(jnp.uint8))
    b = f.shape[0]
    fb = f.reshape(b, P.TRELLIS_ENCODERS, _NB, 4).max(axis=-1)
    cur = enc_major_to_round_major(fb)
    rs = deinterleave_field(cur, prev_flag_il)
    return rs.reshape(b, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES), cur


def derandomize_field(rs_data: jnp.ndarray) -> jnp.ndarray:
    """(B, 312, 207) uint8 corrected codewords -> (B, 58656) uint8 TS
    packets (PN XOR undone, 0x47 sync bytes re-inserted)."""
    b = rs_data.shape[0]
    payload = rs_data[..., : P.SEGMENT_BYTES] ^ jnp.asarray(randomizer_table())
    sync = jnp.full((b, P.DATA_SEGMENTS, 1), 0x47, dtype=jnp.uint8)
    pkts = jnp.concatenate([sync, payload], axis=-1)
    return pkts.reshape(b, P.FIELD_TS_BYTES)
