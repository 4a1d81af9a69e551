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
def _tables() -> tuple[np.ndarray, np.ndarray]:
    src, from_prev = gather_tables()
    return src.astype(np.int32), from_prev.astype(bool)


def interleave_field(cur_rs: jnp.ndarray, prev_rs: jnp.ndarray) -> jnp.ndarray:
    """(B, 64584) current + previous RS fields -> (B, 64584) interleaved."""
    src, from_prev = _tables()
    cur_g = jnp.take(cur_rs, jnp.asarray(src), axis=-1)
    prev_g = jnp.take(prev_rs, jnp.asarray(src), axis=-1)
    return jnp.where(jnp.asarray(from_prev), prev_g, cur_g)
