"""Convolutional interleaver stage: one fused gather pair.

Behavioral spec: reference src/atsc/interleaver.h:11-19 (64,584-element
scatter through a fused table, double-buffered across fields). TPU-first
reformulation (see tables/interleave.py): inverted into gathers over output
positions, selecting between the current and previous field's RS output.
The only carried state is the previous RS field.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.interleave import gather_tables


@functools.lru_cache(maxsize=1)
def _combined_src() -> np.ndarray:
    """One gather table into concat([cur, prev]): src + 64584*from_prev."""
    src, from_prev = gather_tables()
    return (src + P.DATA_PER_FIELD * from_prev.astype(np.int64)).astype(np.int32)


def interleave_field(cur_rs: jnp.ndarray, prev_rs: jnp.ndarray) -> jnp.ndarray:
    """(B, 64584) current + previous RS fields -> (B, 64584) interleaved."""
    both = jnp.concatenate([cur_rs, prev_rs], axis=-1)  # (B, 129168)
    return jnp.take(both, jnp.asarray(_combined_src()), axis=-1)


@functools.lru_cache(maxsize=1)
def _combined_src_enc_major() -> np.ndarray:
    """The interleave gather composed with the trellis stage's
    encoder-major byte permutation (reference interleaver.h's fused trellis
    rotate/transpose, taken one step further): round-major index
    j = (r*12 + e)*13 + c  ->  encoder-major m = (e*414 + r)*13 + c, so the
    trellis stage reads contiguous per-encoder streams with no transpose
    pass of its own."""
    src = _combined_src().reshape(
        P.TRELLIS_ROUNDS, P.TRELLIS_ENCODERS, P.TRELLIS_INPUT_BYTES
    )
    return np.ascontiguousarray(src.transpose(1, 0, 2)).reshape(
        P.TRELLIS_ENCODERS, -1
    )


def interleave_field_enc_major(
    cur_rs: jnp.ndarray, prev_rs: jnp.ndarray
) -> jnp.ndarray:
    """(B, 64584) current + previous RS fields -> (B, 12, 5382) interleaved
    bytes in encoder-major layout (the trellis stage's native input)."""
    both = jnp.concatenate([cur_rs, prev_rs], axis=-1)  # (B, 129168)
    return jnp.take(both, jnp.asarray(_combined_src_enc_major()), axis=-1)
