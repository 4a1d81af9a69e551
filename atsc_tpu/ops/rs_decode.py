"""Reed-Solomon RS(207,187) decoder: syndromes on the MXU, correction on
the host.

The reference carries a full RS decoder (Berlekamp-Massey, Chien search,
Forney) that is dead code in its encode pipeline (reference
src/atsc/reed_solomon.h:41-190; never called, untested). This framework
ships a *working* decoder: the TX hot path never needs it, but the
receiver-side syndrome check is GF(2)-linear, so batched syndrome
computation reuses the encoder's bit-matrix trick on the MXU —
syndrome_bits = codeword_bits @ S (mod 2) — making "is this field clean?"
a single matmul for all 312 segments of many channels. Segments with
non-zero syndromes (rare) are corrected on the host with the classic
Berlekamp-Massey + Chien + Forney pipeline in numpy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.galois import gf_mul, gf_tables

_NROOTS = P.RS_BYTES
_N = P.SEGMENT_FEC_BYTES  # 207
_BIT_SHIFTS = np.arange(7, -1, -1, dtype=np.uint8)


def syndromes_np(codeword: np.ndarray) -> np.ndarray:
    """(..., 207) uint8 -> (..., 20) uint8 syndromes S_j = c(alpha^j).

    The codeword polynomial convention matches the encoder (tables/galois
    .py): c = [data(187) | parity(20)], highest-degree coefficient first.
    """
    exp, _ = gf_tables()
    cw = np.asarray(codeword, dtype=np.uint8)
    out = np.zeros(cw.shape[:-1] + (_NROOTS,), dtype=np.uint8)
    for j in range(_NROOTS):
        # Horner: s = s*alpha^j + c[i]
        s = np.zeros(cw.shape[:-1], dtype=np.uint8)
        alpha_j = exp[j]
        for i in range(_N):
            s = gf_mul(s, alpha_j) ^ cw[..., i]
        out[..., j] = s
    return out


@functools.lru_cache(maxsize=1)
def _syndrome_bit_matrix() -> np.ndarray:
    """(207*8, 20*8) GF(2) matrix: syndrome_bits = codeword_bits @ S mod 2."""
    nbits_in = _N * 8
    m = np.zeros((nbits_in, _NROOTS * 8), dtype=np.int8)
    cw = np.zeros(_N, dtype=np.uint8)
    for byte in range(_N):
        for bit in range(8):
            cw[byte] = 1 << (7 - bit)
            m[byte * 8 + bit] = np.unpackbits(syndromes_np(cw))
            cw[byte] = 0
    return m


def syndrome_field(codewords: jnp.ndarray) -> jnp.ndarray:
    """(B, 312, 207) uint8 -> (B, 312, 20) uint8 syndromes, one MXU matmul."""
    b = codewords.shape[0]
    bits = (codewords[..., None] >> jnp.asarray(_BIT_SHIFTS)) & 1
    bits = bits.reshape(b, P.DATA_SEGMENTS, _N * 8).astype(jnp.int8)
    syn_bits = (
        jax.lax.dot_general(
            bits,
            jnp.asarray(_syndrome_bit_matrix()),
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        & 1
    )
    sb = syn_bits.reshape(b, P.DATA_SEGMENTS, _NROOTS, 8)
    weights = jnp.asarray(1 << _BIT_SHIFTS.astype(np.int32))
    return jnp.sum(sb * weights, axis=-1).astype(jnp.uint8)


def _gf_pow(base_log: int, k: int) -> int:
    return (base_log * k) % 255


def correct_segment_np(codeword: np.ndarray) -> tuple[np.ndarray, int]:
    """Correct up to 10 byte errors in one 207-byte codeword.

    Returns (corrected codeword, n_errors); n_errors = -1 if uncorrectable.
    Classic Berlekamp-Massey -> Chien search -> Forney, numpy scalar
    (receiver-side utility; not on the TX hot path).
    """
    exp, log = gf_tables()
    cw = np.array(codeword, dtype=np.uint8)
    syn = syndromes_np(cw)
    if not syn.any():
        return cw, 0

    # Berlekamp-Massey for the error locator Lambda(x)
    lam = np.zeros(_NROOTS + 1, dtype=np.uint8)
    prev = np.zeros(_NROOTS + 1, dtype=np.uint8)
    lam[0] = prev[0] = 1
    L, m, b = 0, 1, 1
    for r in range(_NROOTS):
        delta = 0
        for i in range(L + 1):
            delta ^= int(gf_mul(lam[i], syn[r - i])) if r - i >= 0 else 0
        if delta == 0:
            m += 1
        elif 2 * L <= r:
            t = lam.copy()
            coef = gf_mul(delta, exp[255 - log[b]])  # delta / b
            shifted = np.zeros_like(prev)
            shifted[m:] = prev[:_NROOTS + 1 - m]
            lam = lam ^ gf_mul(shifted, coef)
            L = r + 1 - L
            prev = t
            b = delta
            m = 1
        else:
            coef = gf_mul(delta, exp[255 - log[b]])
            shifted = np.zeros_like(prev)
            shifted[m:] = prev[:_NROOTS + 1 - m]
            lam = lam ^ gf_mul(shifted, coef)
            m += 1
    if L > _NROOTS // 2:
        return cw, -1

    # Chien search over the 207 valid positions. Position i (0 = first
    # transmitted byte, degree n-1) has locator root alpha^{-(n-1-i)}.
    err_pos = []
    for i in range(_N):
        j = _N - 1 - i  # degree of position i
        x_inv_log = (255 - j) % 255  # log of alpha^{-j}
        v = 0
        for k in range(L + 1):
            if lam[k]:
                v ^= exp[(log[lam[k]] + _gf_pow(x_inv_log, k)) % 255] if lam[k] else 0
        if v == 0:
            err_pos.append(i)
    if len(err_pos) != L:
        return cw, -1

    # Forney: Omega(x) = S(x) Lambda(x) mod x^2t ; e_i = Omega(Xi^-1)/Lambda'(Xi^-1)
    omega = np.zeros(_NROOTS, dtype=np.uint8)
    for i in range(_NROOTS):
        acc = 0
        for k in range(min(i, _NROOTS) + 1):
            if k <= _NROOTS and i - k < _NROOTS:
                acc ^= int(gf_mul(lam[k] if k < lam.size else 0, syn[i - k]))
        omega[i] = acc
    for i in err_pos:
        j = _N - 1 - i
        xi_inv_log = (255 - j) % 255
        num = 0
        for k in range(_NROOTS):
            if omega[k]:
                num ^= exp[(log[omega[k]] + _gf_pow(xi_inv_log, k)) % 255]
        den = 0  # Lambda'(x) = sum of odd-degree terms' derivatives
        for k in range(1, _NROOTS + 1, 2):
            if k < lam.size and lam[k]:
                den ^= exp[(log[lam[k]] + _gf_pow(xi_inv_log, k - 1)) % 255]
        if den == 0:
            return cw, -1
        mag = gf_mul(num, exp[255 - log[den]])
        # e_i = Xi * Omega(Xi^-1)/Lambda'(Xi^-1) with Xi = alpha^j
        mag = gf_mul(mag, exp[j % 255])
        cw[i] ^= mag
    if syndromes_np(cw).any():
        return np.array(codeword, dtype=np.uint8), -1
    return cw, len(err_pos)


def decode_field_np(codewords: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(312, 207) -> (corrected (312, 207), n_errors (312,) int32)."""
    out = np.array(codewords, dtype=np.uint8)
    nerr = np.zeros(P.DATA_SEGMENTS, dtype=np.int32)
    for seg in range(P.DATA_SEGMENTS):
        out[seg], nerr[seg] = correct_segment_np(out[seg])
    return out, nerr
