"""Reed-Solomon RS(207,187) encoder as a GF(2) matmul on the MXU.

Behavioral spec: reference src/atsc/reed_solomon.h:192-242 (LFSR division
per segment). TPU-first reformulation (see tables/galois.py): the code is
GF(2)-linear, so parity bits = data bits @ M (mod 2) with a precomputed
(1496, 160) binary matrix — the whole field becomes one
(B*312, 1496) x (1496, 160) int8 matmul with int32 accumulation, which is
exactly what the MXU is built for. Bit-exact by construction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.galois import rs_bit_matrix

_BIT_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)  # MSB-first bit order


@functools.lru_cache(maxsize=1)
def _matrix() -> np.ndarray:
    return rs_bit_matrix().astype(np.int8)  # (1496, 160)


def rs_encode_field(rand: jnp.ndarray) -> jnp.ndarray:
    """(B, 312, 207) uint8 with zeroed parity -> (B, 312, 207) RS-encoded."""
    b = rand.shape[0]
    data = rand[:, :, : P.SEGMENT_BYTES]  # (B, 312, 187)

    # unpack to bits, MSB-first: (B, 312, 187*8)
    bits = (data[..., None] >> jnp.asarray(_BIT_SHIFTS)) & 1
    bits = bits.reshape(b, P.DATA_SEGMENTS, P.SEGMENT_BYTES * 8).astype(jnp.int8)

    parity_bits = (
        jax.lax.dot_general(
            bits,
            jnp.asarray(_matrix()),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        & 1
    )  # (B, 312, 160)

    # pack bits back to bytes, MSB-first
    pb = parity_bits.reshape(b, P.DATA_SEGMENTS, P.RS_BYTES, 8)
    weights = jnp.asarray(1 << _BIT_SHIFTS.astype(np.int32))
    parity = jnp.sum(pb * weights, axis=-1).astype(jnp.uint8)  # (B, 312, 20)

    return jnp.concatenate([data, parity], axis=-1)
