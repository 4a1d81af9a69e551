"""Symbol assembly: output commutator + sync insertion, fused into one
gather/select pass — entirely in the int8 3-bit-symbol domain.

Behavioral spec: reference src/atsc/trellis.h:549-576 (output commutator
scatter), src/atsc/field_sync.h:12-26 (field/segment sync memcpys, reserved
symbols from the previous field's tail, even/odd parity alternation).

TPU-first reformulation: a single precomputed gather index maps every
padded-field position to its source symbol in the encoder-major trellis
output; sync constants come from a (2, 261248) parity-indexed int8 template
and one `where`. Keeping the whole assembled field as int8 symbol *values*
(not float levels) quarters the HBM traffic of this stage and of the fused
offset+FIR kernel's input; the level map (signal.h: 2v-7+1.25) is applied
on the fly wherever float levels are actually needed (field_levels / the
Pallas kernel's VMEM-resident cast).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.sync import RESERVED_START, sync_symbol_templates
from atsc_tpu.tables.trellis_tables import (
    encoder_stream_to_round_major,
    padded_field_gather,
)


@functools.lru_cache(maxsize=1)
def _tables() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    is_data, src_round_major = padded_field_gather()
    # compose: padded position -> round-major stream -> encoder-major index
    src_enc_major = encoder_stream_to_round_major()[src_round_major]
    template, is_const = sync_symbol_templates()
    # data slots gather from trellis symbols; const slots from the template;
    # the 12 reserved slots are overwritten afterwards, any source is fine.
    return src_enc_major.astype(np.int32), template, is_const


def assemble_field(
    symbols: jnp.ndarray, parity: jnp.ndarray, saved: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Build the padded symbol-value field.

    symbols: (B, 12, 21528) int8 trellis symbols (encoder-major);
    parity:  (B,) int32 field parity (0 even / 1 odd);
    saved:   (B, 12) int8 reserved symbols (previous field's tail).
    Returns (field (B, 261248) int8 symbol values, new_saved (B, 12) int8).
    """
    src, template, is_const = _tables()
    b = symbols.shape[0]

    flat = symbols.reshape(b, -1)  # (B, 258336)
    data_syms = jnp.take(flat, jnp.asarray(src), axis=-1)

    const_part = jnp.asarray(template)[parity]  # (B, 261248) int8
    field = jnp.where(jnp.asarray(is_const), const_part, data_syms)
    field = field.at[:, RESERVED_START : RESERVED_START + P.RESERVED_SYMBOLS].set(
        saved
    )
    new_saved = field[
        :, P.SYMBOLS_PER_FIELD - P.RESERVED_SYMBOLS : P.SYMBOLS_PER_FIELD
    ]
    return field, new_saved


@functools.lru_cache(maxsize=1)
def _segment_templates() -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(fsync (2, 832) int8, segsync (4,) int8, pad (2, 832) int8)."""
    template, _ = sync_symbol_templates()
    fsync = template[:, : P.SYMBOLS_PER_SEGMENT].copy()
    pad = template[:, P.SYMBOLS_PER_FIELD :].copy()
    segsync = np.array([6, 1, 1, 6], dtype=np.int8)
    return fsync, segsync, pad


def assemble_field_structured(
    symbols: jnp.ndarray,
    parity: jnp.ndarray,
    saved: jnp.ndarray,
    pad_to: int = P.PADDED_SYMBOLS,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gather-free assemble_field (same contract).

    pad_to > 261,248 appends zero symbols inside the assembling concat
    (free — the field is written once either way), so consumers needing a
    longer 128-block grid (the quantized fused kernel) skip a separate
    full-field pad copy.

    The output commutator (reference trellis.h:549-576) is block-cyclic:
    symbol i of data-segment d comes from encoder (4d + i) mod 12, and each
    encoder contributes exactly 69 consecutive stream symbols per segment.
    With the encoder-major stream viewed as (12, 312, 69), the whole
    commutator is one transpose to (312, 69, 12) plus a roll of the encoder
    axis by (4d mod 12) — which has period 3 in d, so three static rolls
    cover all 312 segments. No gather tables, no select masks; everything
    is reshapes XLA turns into a single relayout pass.
    """
    b = symbols.shape[0]
    n_seg = P.DATA_SEGMENTS
    per_seg = P.DATA_SYMBOLS_PER_SEGMENT // P.TRELLIS_ENCODERS  # 69

    sym4 = symbols.reshape(b, P.TRELLIS_ENCODERS, n_seg, per_seg)
    t = sym4.transpose(0, 2, 3, 1)                 # (B, 312, 69, 12)
    t = t.reshape(b, n_seg // 3, 3, per_seg, P.TRELLIS_ENCODERS)
    rolled = jnp.stack(
        [jnp.roll(t[:, :, g], -4 * g, axis=-1) for g in range(3)], axis=2
    )
    data = rolled.reshape(b, n_seg, P.DATA_SYMBOLS_PER_SEGMENT)

    fsync_t, segsync, pad_t = _segment_templates()
    fsync = jnp.asarray(fsync_t)[parity]           # (B, 832)
    fsync = fsync.at[:, RESERVED_START : RESERVED_START + P.RESERVED_SYMBOLS].set(
        saved
    )
    seg_sync = jnp.broadcast_to(
        jnp.asarray(segsync), (b, n_seg, 4)
    )
    data_segs = jnp.concatenate([seg_sync, data], axis=-1).reshape(
        b, n_seg * P.SYMBOLS_PER_SEGMENT
    )
    pad = jnp.asarray(pad_t)[parity]               # (B, 832)
    parts = [fsync, data_segs, pad]
    if pad_to > P.PADDED_SYMBOLS:
        parts.append(
            jnp.zeros((b, pad_to - P.PADDED_SYMBOLS), dtype=symbols.dtype)
        )
    field = jnp.concatenate(parts, axis=-1)
    new_saved = data[:, -1, -P.RESERVED_SYMBOLS :]
    return field, new_saved


def field_levels(field: jnp.ndarray) -> jnp.ndarray:
    """(.., 261248) int8 symbol values -> float32 levels (signal.h xform).

    The 12-sample padding tail is forced to 0.0 (complex zero), matching the
    reference's value-initialized buffer tail exactly — it is never read by
    the valid FIR outputs, but the spec/golden dumps include it.
    """
    lvl = field.astype(jnp.float32) * 2.0 + jnp.float32(P.PILOT_OFFSET - 7.0)
    tail = P.SYMBOLS_PER_FIELD + P.SYMBOLS_PER_SEGMENT - P.RESERVED_SYMBOLS
    return lvl.at[..., tail:].set(0.0)
