"""Data randomizer stage: one fused XOR over the field.

Behavioral spec: reference src/atsc/randomize.h:43-55 — drop each packet's
0x47 sync byte, XOR the 187 payload bytes with the per-field PN table,
zero the 20 RS parity slots.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.randomizer import randomizer_table


@functools.lru_cache(maxsize=1)
def _table() -> np.ndarray:
    return randomizer_table()  # (312, 187) uint8


def randomize_field(ts: jnp.ndarray) -> jnp.ndarray:
    """(B, 58656) uint8 TS bytes -> (B, 312, 207) uint8, parity slots zeroed."""
    b = ts.shape[0]
    pkts = ts.reshape(b, P.DATA_SEGMENTS, P.MPEG2_BYTES)
    payload = pkts[:, :, 1:] ^ jnp.asarray(_table())
    parity = jnp.zeros((b, P.DATA_SEGMENTS, P.RS_BYTES), dtype=jnp.uint8)
    return jnp.concatenate([payload, parity], axis=-1)
