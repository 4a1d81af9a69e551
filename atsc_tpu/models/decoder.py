"""The 8VSB symbol-domain field decoder: inverse pipeline + RS correction.

Counterpart of models/encoder.py on the receive side (a capability the
reference lacks entirely — see ops/decode.py). The jittable core inverts
commutator/trellis/interleaver per field; Reed-Solomon correction runs on
the host only for segments whose MXU-computed syndromes are non-zero, so
clean fields never leave the device path.

Latency/state model: byte i of RS field N is spread over interleaved
fields N and N+1 (the convolutional interleaver's two-field span), so
`decode_field(state, field_k)` returns TS field k-1; the carried state is
the previous received interleaved field, 12 precoder bits, and nothing
else. A cold-start decoder fed the encoder's field 0 first returns the
encoder's virtual all-zero pre-start field (drop it), exactly mirroring
the encoder's zero-initialized interleaver buffer (reference
src/atsc/atsc.cpp:34).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.decode import (
    decommutate_field,
    deinterleave_field,
    derandomize_field,
    enc_major_to_round_major,
    propagate_erasure_flags,
    trellis_decode_field,
)
from atsc_tpu.ops.rs_decode import (
    rs_correct_field_erasures_jit,
    rs_correct_field_jit,
    syndrome_field,
)


class DecoderState(NamedTuple):
    """Carried per-channel state; every leaf is batched (B, ...)."""

    prev_il: jnp.ndarray   # (B, 64584) uint8 previous received interleaved field
    z2_prev: jnp.ndarray   # (B, 12) int32 trellis precoder state (last z2)


def init_decoder_state(batch: int) -> DecoderState:
    return DecoderState(
        prev_il=jnp.zeros((batch, P.DATA_PER_FIELD), dtype=jnp.uint8),
        z2_prev=jnp.zeros((batch, P.TRELLIS_ENCODERS), dtype=jnp.int32),
    )


def decode_field(
    state: DecoderState, field: jnp.ndarray
) -> tuple[DecoderState, jnp.ndarray, jnp.ndarray]:
    """One received field for B channels (jittable device core).

    field: (B, >=260416) int8 symbol values (field k).
    Returns (new state, codewords (B, 312, 207) uint8 of RS field k-1
    *before* error correction, syndromes (B, 312, 20) uint8 — all-zero
    rows are error-free segments).
    """
    syms = decommutate_field(field)
    bytes_enc, z2_new = trellis_decode_field(syms, state.z2_prev)
    cur_il = enc_major_to_round_major(bytes_enc)
    rs = deinterleave_field(cur_il, state.prev_il)
    codewords = rs.reshape(rs.shape[0], P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    syn = syndrome_field(codewords)
    return DecoderState(prev_il=cur_il, z2_prev=z2_new), codewords, syn


class SoftDecoderState(NamedTuple):
    """Soft-path carried state: adds the Viterbi path metrics."""

    prev_il: jnp.ndarray   # (B, 64584) uint8
    z2_prev: jnp.ndarray   # (B, 12) int32
    metrics: jnp.ndarray   # (B, 12, 4) float32 trellis path metrics


def init_soft_decoder_state(batch: int) -> SoftDecoderState:
    from atsc_tpu.ops.viterbi import init_metrics

    hard = init_decoder_state(batch)
    return SoftDecoderState(
        prev_il=hard.prev_il, z2_prev=hard.z2_prev,
        metrics=init_metrics(batch),
    )


def soft_decode_field(
    state: SoftDecoderState, levels: jnp.ndarray, n_chunks: int = 1
) -> tuple[SoftDecoderState, jnp.ndarray, jnp.ndarray]:
    """Soft-decision twin of decode_field: maximum-likelihood trellis
    decoding (ops/viterbi.py) instead of hard slicing — ~3.5 dB of
    coding gain on noisy captures.

    levels: (B, >=260416) float32 equalized soft levels (pilot offset
    included, NOT sliced). Same returns/latency as decode_field.
    n_chunks > 1: chunk-parallel near-MLSE Viterbi (byte-identical at
    operating SNRs, ~n_chunks-times less sequential scan depth).
    """
    from atsc_tpu.ops.viterbi import viterbi_decode_field

    if levels.dtype == jnp.int8:
        # quantized soft-level codes (ops.quantize SOFT_LEVEL_SCALE):
        # gather and transpose stay int8; the Viterbi kernel dequantizes
        soft = decommutate_field(levels)
    else:
        soft = decommutate_field(levels.astype(jnp.float32))
    bytes_enc, z2_new, metrics = viterbi_decode_field(
        soft, state.z2_prev, state.metrics, n_chunks
    )
    cur_il = enc_major_to_round_major(bytes_enc)
    rs = deinterleave_field(cur_il, state.prev_il)
    codewords = rs.reshape(rs.shape[0], P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    syn = syndrome_field(codewords)
    new_state = SoftDecoderState(
        prev_il=cur_il, z2_prev=z2_new, metrics=metrics
    )
    return new_state, codewords, syn


class Decoder:
    """Stateful wrapper: symbol fields in, corrected TS fields out."""

    def __init__(self, batch: int = 1):
        self.batch = batch
        self._state = init_decoder_state(batch)
        self._step = jax.jit(decode_field)
        self._derand = jax.jit(derandomize_field)
        self._flag_step = jax.jit(propagate_erasure_flags)
        self._flag_il: jnp.ndarray | None = None  # carried erasure flags
        self.segments_corrected = 0
        self.segments_uncorrectable = 0
        self.segments_erasure_assisted = 0

    @property
    def state(self) -> DecoderState:
        return self._state

    def decode(
        self, field: np.ndarray, erasure_flags: np.ndarray | None = None
    ) -> tuple[np.ndarray, np.ndarray]:
        """(B, >=260416) int8 symbol field k -> (ts (B, 58656) uint8 of
        field k-1, n_errors (B, 312) int32; -1 marks uncorrectable).

        erasure_flags: optional (B, >=260416) uint8/bool per-symbol
        unreliability flags for the *same* received field (e.g. from
        ops/erasures.py's burst detector); flagged bytes are treated as
        RS erasures — 2*errors + erasures <= 20 per segment instead of
        errors <= 10. Once used, keep supplying flags every call (they
        carry one field of state, like the symbols themselves).

        The first call after a cold start returns the all-zero pre-start
        field (see module docstring); callers should drop it.
        """
        self._state, codewords, syn = self._step(
            self._state, jnp.asarray(field)
        )
        cw_flags = None   # stays a DEVICE array: the erasure corrector
        if erasure_flags is not None or self._flag_il is not None:
            if self._flag_il is None:
                self._flag_il = jnp.zeros(
                    (self.batch, P.DATA_PER_FIELD), dtype=jnp.uint8
                )
            flags_in = (
                jnp.zeros((self.batch, P.SYMBOLS_PER_FIELD), dtype=jnp.uint8)
                if erasure_flags is None
                else jnp.asarray(erasure_flags)
            )
            cw_flags, self._flag_il = self._flag_step(flags_in, self._flag_il)
        n_errors = np.zeros((self.batch, P.DATA_SEGMENTS), dtype=np.int32)
        dirty = np.asarray(jnp.any(syn != 0, axis=-1))  # (B, 312) bool
        if dirty.any():
            # full-field correction in ONE device dispatch — a
            # threshold-SNR field with most segments dirty costs the
            # same as one dirty segment. With erasure flags the
            # errors-and-erasures corrector runs (2*errors + erasures
            # <= 20 per segment, per-segment errors-only fallback for
            # wrong flags — rs_correct_field_erasures); otherwise the
            # errors-only tier (batched inversionless BM + bit-matmul
            # Chien/Forney).
            if cw_flags is not None:
                codewords, n_dev = rs_correct_field_erasures_jit(
                    codewords, syn, cw_flags
                )
            else:
                codewords, n_dev = rs_correct_field_jit(codewords, syn)
            n_errors = np.asarray(n_dev)
            self.segments_corrected += int((n_errors > 0).sum())
            self.segments_uncorrectable += int((n_errors < 0).sum())
            if cw_flags is not None:
                flagged = dirty & np.asarray(
                    jnp.any(cw_flags != 0, axis=-1)
                )
                self.segments_erasure_assisted += int(
                    ((n_errors > 0) & flagged).sum()
                )
        ts = np.asarray(self._derand(codewords))
        return ts, n_errors


class SoftDecoder(Decoder):
    """Decoder taking *soft levels* instead of sliced symbols: the
    trellis stage runs maximum-likelihood (Viterbi) — use on noisy
    captures where hard slicing exceeds RS's 10-byte/segment budget."""

    def __init__(self, batch: int = 1, viterbi_chunks: int = 1):
        super().__init__(batch)
        self._state = init_soft_decoder_state(batch)
        self._step = jax.jit(
            functools.partial(soft_decode_field, n_chunks=viterbi_chunks)
        )


class NtscDecoderState(NamedTuple):
    """Comb-path carried state: 16-state partial-response path metrics."""

    prev_il: jnp.ndarray   # (B, 64584) uint8
    z2_prev: jnp.ndarray   # (B, 12) int32
    metrics: jnp.ndarray   # (B, 12, 16) float32 PR path metrics


def init_ntsc_decoder_state(batch: int) -> NtscDecoderState:
    from atsc_tpu.ops.ntsc import init_pr_metrics

    hard = init_decoder_state(batch)
    return NtscDecoderState(
        prev_il=hard.prev_il, z2_prev=hard.z2_prev,
        metrics=init_pr_metrics(batch),
    )


def ntsc_decode_field(
    state: NtscDecoderState, levels: jnp.ndarray, n_chunks: int = 1
) -> tuple[NtscDecoderState, jnp.ndarray, jnp.ndarray]:
    """NTSC-rejection twin of soft_decode_field: 12-symbol comb filter +
    16-state partial-response Viterbi (ops/ntsc.py) — use on captures
    with analog co-channel interference, which the comb nulls at the
    ~3 dB white-noise cost the code was designed to absorb.

    levels: (B, >=260416) float32 equalized soft levels (pilot offset
    included, NOT sliced). Same returns/latency as decode_field.
    """
    from atsc_tpu.ops.ntsc import comb_field, viterbi_pr_decode_field

    y = decommutate_field(comb_field(levels.astype(jnp.float32)))
    bytes_enc, z2_new, metrics = viterbi_pr_decode_field(
        y, state.z2_prev, state.metrics, n_chunks
    )
    cur_il = enc_major_to_round_major(bytes_enc)
    rs = deinterleave_field(cur_il, state.prev_il)
    codewords = rs.reshape(rs.shape[0], P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    syn = syndrome_field(codewords)
    new_state = NtscDecoderState(
        prev_il=cur_il, z2_prev=z2_new, metrics=metrics
    )
    return new_state, codewords, syn


class NtscDecoder(Decoder):
    """Decoder for NTSC co-channel-impaired captures: soft levels in,
    comb-filtered 15-level partial-response ML trellis decoding."""

    def __init__(self, batch: int = 1, viterbi_chunks: int = 1):
        super().__init__(batch)
        self._state = init_ntsc_decoder_state(batch)
        self._step = jax.jit(
            functools.partial(ntsc_decode_field, n_chunks=viterbi_chunks)
        )
