"""12-way interleaved 2/3-rate trellis encoder as XOR prefix scans on the MXU.

Behavioral spec: reference src/atsc/trellis.h — semantics documented by its
bit-serial model (trellis.h:10-51): each byte is consumed MSB-first as bit
pairs (7,6),(5,4),(3,2),(1,0); the upper bit X2 feeds a differential
precoder (z2 inclusive-XOR chain); the lower bit X1 is emitted as z1 and
feeds a 2-delay feedback encoder whose output z0 is the *pre-update* state
D1. The encoders are never reset — 3 bits of state per encoder persist
across fields.

TPU-first reformulation (replacing the reference's pext/pdep byte tricks):
the 2-delay recurrence splits into two independent differential chains on
alternating X1 bits, so all three recurrences are XOR prefix scans:

    z2        = inclusive scan of X2 bits        (carry: D)
    z0 @ odd  = inclusive scan of even X1 bits   (carry: D2)
    z0 @ even = exclusive scan of odd  X1 bits   (carry: D1)

The scans run as *block prefix matmuls* on the MXU: partition each bit
stream into 128-bit blocks, multiply by a constant upper-triangular ones
matrix (in-block inclusive prefix; bf16 is exact since partial sums are
<= 128 < 256), then add an exclusive carry cumsum over the short block
axis. Mod 2 is deferred to the end.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P

_BLK = 128
_TRIU = np.triu(np.ones((_BLK, _BLK), dtype=np.float32))  # U[i,j]=1 for i<=j


def _block_prefix_scan(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive running-sum along the last axis via MXU block matmuls.

    x: (..., n) in {0,1}. Returns int32 inclusive cumulative sums (not yet
    reduced mod 2). Exact: in-block sums <= 128 are exact in bf16/f32.
    """
    *lead, n = x.shape
    q = -(-n // _BLK)
    pad = q * _BLK - n
    if pad:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    xb = x.reshape(*lead, q, _BLK).astype(jnp.bfloat16)
    pref = jax.lax.dot_general(
        xb,
        jnp.asarray(_TRIU, dtype=jnp.bfloat16),
        dimension_numbers=(((xb.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (..., q, 128) in-block inclusive prefix
    pref = pref.astype(jnp.int32)
    totals = pref[..., -1]                       # (..., q)
    excl = jnp.cumsum(totals, axis=-1) - totals  # exclusive block carries
    out = pref + excl[..., None]
    return out.reshape(*lead, q * _BLK)[..., :n]


def trellis_encode_field(
    il: jnp.ndarray, d: jnp.ndarray, d1: jnp.ndarray, d2: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode one interleaved field.

    il: (B, 64584) uint8; d/d1/d2: (B, 12) int32 per-encoder carries.
    Returns (symbols, d, d1, d2) with symbols (B, 12, 21528) int8 in
    encoder-major order (round*52 + within_encode along the last axis).
    """
    b = il.shape[0]
    # (B, rounds, encoders, 13) -> per-encoder contiguous byte streams
    bytes_ = il.reshape(
        b, P.TRELLIS_ROUNDS, P.TRELLIS_ENCODERS, P.TRELLIS_INPUT_BYTES
    ).transpose(0, 2, 1, 3).reshape(b, P.TRELLIS_ENCODERS, -1)
    bytes_ = bytes_.astype(jnp.int32)

    n = P.TRELLIS_SYMBOLS_PER_ENCODER  # 21,528 bit pairs per encoder
    # bit pairs MSB-first: X2 from bits 7,5,3,1; X1 from bits 6,4,2,0
    shifts_x2 = jnp.asarray([7, 5, 3, 1], dtype=jnp.int32)
    shifts_x1 = jnp.asarray([6, 4, 2, 0], dtype=jnp.int32)
    x2 = ((bytes_[..., None] >> shifts_x2) & 1).reshape(b, P.TRELLIS_ENCODERS, n)
    x1 = ((bytes_[..., None] >> shifts_x1) & 1).reshape(b, P.TRELLIS_ENCODERS, n)

    # z2: inclusive XOR scan with carry
    z2 = (_block_prefix_scan(x2) + d[..., None]) & 1
    d_new = z2[..., -1]

    # z0: split X1 by step parity
    u = x1[..., 0::2]  # even-step inputs  (B, 12, 10764)
    v = x1[..., 1::2]  # odd-step inputs
    u_scan = _block_prefix_scan(u)
    v_scan = _block_prefix_scan(v)
    z0_odd = (u_scan + d2[..., None]) & 1                     # z0 at odd steps
    v_excl = jnp.concatenate(
        [jnp.zeros_like(v_scan[..., :1]), v_scan[..., :-1]], axis=-1
    )
    z0_even = (v_excl + d1[..., None]) & 1                    # z0 at even steps
    d1_new = (v_scan[..., -1] + d1) & 1
    d2_new = (u_scan[..., -1] + d2) & 1
    z0 = jnp.stack([z0_even, z0_odd], axis=-1).reshape(b, P.TRELLIS_ENCODERS, n)

    symbols = (z2 * 4 + x1 * 2 + z0).astype(jnp.int8)
    return symbols, d_new, d1_new, d2_new
