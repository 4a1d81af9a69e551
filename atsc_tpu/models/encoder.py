"""The 8VSB encoder model: the 7-stage pipeline over batched channels.

This is the TPU analog of the reference's pipeline driver
(reference src/atsc/atsc.cpp:79-90): one pure function
``state, iq = encode_field(state, ts)`` instead of a mutable stage chain,
so it jits once, vmaps/shards over channels, and scans over fields.

Carried state per stream (the complete resumable state, SURVEY.md §5.4):
previous field's RS output (interleaver double-buffer), 36 bits of trellis
carries, 12 saved reserved symbols, field parity, oscillator phasor.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops import (
    apply_pilot_offset,
    randomize_field,
    rrc_filter_field,
    rs_encode_field,
    trellis_encode_field,
)
from atsc_tpu.ops.assemble import assemble_field_structured, field_levels
from atsc_tpu.ops.interleave import interleave_field_enc_major
from atsc_tpu.ops.offset import advance_phasor
from atsc_tpu.tables.oscillator import phasor_for_field


def _use_fused_offset_fir() -> bool:
    """The fused Pallas offset+FIR kernel runs only on real TPU backends
    (Mosaic lowering); interpret mode on CPU is far slower than XLA's own
    fusion, so CPU (tests, dryruns) keeps the unfused ops. Override with
    ATSC_TPU_FUSED=0/1."""
    import os

    env = os.environ.get("ATSC_TPU_FUSED")
    if env is not None:
        return env not in ("0", "false", "")
    return jax.default_backend() != "cpu"


class EncoderState(NamedTuple):
    """Pytree of carried per-channel state; every leaf is batched (B, ...)."""

    prev_rs: jnp.ndarray        # (B, 64584) uint8
    trellis_d: jnp.ndarray      # (B, 12) int32 differential precoder
    trellis_d1: jnp.ndarray     # (B, 12) int32 conv encoder delay 1
    trellis_d2: jnp.ndarray     # (B, 12) int32 conv encoder delay 2
    saved: jnp.ndarray          # (B, 12) int8 reserved symbol values
    parity: jnp.ndarray         # (B,) int32 field parity (0 even, 1 odd)
    phasor: jnp.ndarray         # (B, 2) float32 oscillator phasor (re, im)


def init_state(batch: int, field_index: int = 0) -> EncoderState:
    """Fresh state for `batch` channels, as of a given global field index.

    field_index > 0 only sets the closed-form components (parity, phasor);
    data-dependent state (interleaver buffer, trellis carries, saved
    symbols) matches a cold start, exactly like the reference's constructor
    (atsc.cpp:17-35: zeroed field1, xform(0) saved symbols — symbol value 0
    here).
    """
    return EncoderState(
        prev_rs=jnp.zeros((batch, P.DATA_PER_FIELD), dtype=jnp.uint8),
        trellis_d=jnp.zeros((batch, P.TRELLIS_ENCODERS), dtype=jnp.int32),
        trellis_d1=jnp.zeros((batch, P.TRELLIS_ENCODERS), dtype=jnp.int32),
        trellis_d2=jnp.zeros((batch, P.TRELLIS_ENCODERS), dtype=jnp.int32),
        saved=jnp.zeros((batch, P.RESERVED_SYMBOLS), dtype=jnp.int8),
        parity=jnp.full((batch,), field_index % 2, dtype=jnp.int32),
        phasor=jnp.tile(
            jnp.asarray(
                [np.float32(phasor_for_field(field_index).real),
                 np.float32(phasor_for_field(field_index).imag)],
                dtype=jnp.float32,
            ),
            (batch, 1),
        ),
    )


def encode_field(
    state: EncoderState, ts: jnp.ndarray, out_format: str = "cf32",
    wire: bool = False,
) -> tuple[EncoderState, jnp.ndarray]:
    """One field for B channels: (B, 58656) TS bytes -> (B, 2, 260480)
    planar float32 IQ, valid through sample 260,416 (use iq_interleave /
    iq_to_complex for the reference's CF32 memory layout).

    out_format 'cs16'/'cs8' instead emits int16/int8 IQ codes (scaled by
    ops.quantize.quantize_scale) straight from the device — the SDR wire
    formats, at 1/2 / 1/4 the HBM write traffic of CF32 (must be static
    under jit).

    wire=True (quantized formats only): (B, >=260416) packed lanes (one
    little-endian (I, Q) pair each — int16 for cs8, int32 for cs16)
    whose bytes per channel ARE the interleaved SDR wire stream; the
    host writes them verbatim (no planar->interleaved pass)."""
    rand = randomize_field(ts)
    rs = rs_encode_field(rand)
    rs_flat = rs.reshape(rs.shape[0], -1)
    il = interleave_field_enc_major(rs_flat, state.prev_rs)
    # materialize the gather and the trellis symbols: without the barriers
    # XLA fuses (= recomputes) the 64,584-wide gather into every bit-plane
    # consumer of the trellis stage, ~2x-ing the front half's cost
    il = jax.lax.optimization_barrier(il)
    symbols, d, d1, d2 = trellis_encode_field(
        il, state.trellis_d, state.trellis_d1, state.trellis_d2
    )
    symbols = jax.lax.optimization_barrier(symbols)
    if _use_fused_offset_fir():
        from atsc_tpu.ops.pallas.offset_fir import (
            QUANT_FIELD_LEN,
            offset_fir_fused,
        )

        # the quantized kernel's 2048-block grid needs 8 extra zero input
        # blocks; append them inside assemble's concat (free) instead of a
        # separate full-field pad copy
        pad_to = P.PADDED_SYMBOLS if out_format == "cf32" else QUANT_FIELD_LEN
        field, new_saved = assemble_field_structured(
            symbols, state.parity, state.saved, pad_to=pad_to
        )
        iq = offset_fir_fused(field, state.phasor, out_format=out_format,
                              wire=wire)
        next_phasor = advance_phasor(state.phasor)
    else:
        field, new_saved = assemble_field_structured(
            symbols, state.parity, state.saved
        )
        iq_padded, next_phasor = apply_pilot_offset(
            field_levels(field), state.phasor
        )
        iq = rrc_filter_field(iq_padded)
        if out_format != "cf32":
            from atsc_tpu.ops.quantize import pack_wire, quantize_iq

            iq = quantize_iq(iq, out_format)
            if wire:
                iq = pack_wire(iq, out_format)
        elif wire:
            raise ValueError("wire layout applies to cs16/cs8 only")

    new_state = EncoderState(
        prev_rs=rs_flat,
        trellis_d=d,
        trellis_d1=d1,
        trellis_d2=d2,
        saved=new_saved,
        parity=state.parity ^ 1,
        phasor=next_phasor,
    )
    return new_state, iq


def encode_fields(
    state: EncoderState, ts_fields: jnp.ndarray, out_format: str = "cf32",
    wire: bool = False,
) -> tuple[EncoderState, jnp.ndarray]:
    """Scan over T fields: (T, B, 58656) -> (T, B, 2, 260480) float32
    (or (T, B, >=260416) packed wire lanes with wire=True)."""
    import functools

    step = functools.partial(encode_field, out_format=out_format, wire=wire)
    return jax.lax.scan(step, state, ts_fields)


class Encoder:
    """Convenience stateful wrapper around the pure functions (the public
    single-process API, analog of reference atsc.h's atsc_encoder)."""

    def __init__(self, batch: int = 1, field_index: int = 0, donate: bool = True,
                 out_format: str = "cf32", wire: bool = False):
        self.batch = batch
        self.out_format = out_format
        self.wire = wire            # packed wire-layout output (cs16/cs8)
        self._state = init_state(batch, field_index)
        donate_args = (0,) if donate else ()
        self._step = jax.jit(
            encode_field, donate_argnums=donate_args,
            static_argnames=("out_format", "wire"),
        )
        self._scan = jax.jit(
            encode_fields, donate_argnums=donate_args,
            static_argnames=("out_format", "wire"),
        )

    @property
    def state(self) -> EncoderState:
        return self._state

    @state.setter
    def state(self, s: EncoderState) -> None:
        self._state = s

    def encode(self, ts: np.ndarray) -> jax.Array:
        """(B, 58656) uint8 -> (B, 2, >=260416) planar IQ for one field
        (valid through sample 260,416; dtype per out_format), or
        (B, >=260416) packed wire lanes when wire=True."""
        self._state, iq = self._step(
            self._state, jnp.asarray(ts), out_format=self.out_format,
            wire=self.wire,
        )
        return iq

    def encode_many(self, ts_fields: np.ndarray) -> jax.Array:
        """(T, B, 58656) -> (T, B, 2, >=260416) planar IQ, or
        (T, B, >=260416) packed wire lanes when wire=True."""
        self._state, iq = self._scan(
            self._state, jnp.asarray(ts_fields), out_format=self.out_format,
            wire=self.wire,
        )
        return iq


def iq_interleave(iq: np.ndarray) -> np.ndarray:
    """Planar (..., 2, N>=260416) float32 -> interleaved (..., 260416, 2).

    The interleaved output is bit-layout-identical to the reference's
    complex<float> CF32 stream (atsc.cpp:89); done host-side so the device
    path never pays a transpose over the 2 MB/field IQ."""
    arr = np.asarray(iq)[..., : P.SYMBOLS_PER_FIELD]
    return np.ascontiguousarray(np.moveaxis(arr, -2, -1))


def iq_to_complex(iq: np.ndarray) -> np.ndarray:
    """Planar (..., 2, N) or interleaved (..., N, 2) float32 IQ -> complex64
    of the 260,416 valid samples."""
    arr = np.asarray(iq)
    if arr.shape[-1] == 2:  # interleaved
        arr = np.ascontiguousarray(arr[..., : P.SYMBOLS_PER_FIELD, :])
        return arr.view(np.complex64)[..., 0]
    return iq_interleave(arr).view(np.complex64)[..., 0]
