"""Reed-Solomon RS(207,187) decoder: syndromes AND error correction on
the device.

The reference carries a full RS decoder (Berlekamp-Massey, Chien search,
Forney) that is dead code in its encode pipeline (reference
src/atsc/reed_solomon.h:41-190; never called, untested). This framework
ships a *working* decoder with two tiers:

* `syndrome_field` — "is this field clean?" is GF(2)-linear, so batched
  syndrome computation reuses the encoder's bit-matrix trick on the MXU:
  syndrome_bits = codeword_bits @ S (mod 2), one matmul for all 312
  segments of many channels.
* `rs_correct_field` — the errors-only decode (Berlekamp-Massey + Chien
  + Forney) re-expressed as fixed-shape, branch-free vectorized
  arithmetic over ALL (B, 312) segments at once, so a threshold-SNR
  field where *most* segments carry errors corrects in one device
  dispatch instead of tens of thousands of serial host BM calls. See
  the section marker below for the formulation.

The scalar numpy path (`correct_segment_np`) remains as the oracle and
as the erasure-assisted (Sugiyama) tier — burst-erasure events are rare
and per-segment, so they stay host-side by design.
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


def _bit_matmul(values: jnp.ndarray, matrix: np.ndarray,
                out_bytes: int) -> jnp.ndarray:
    """GF(2)-linear map as one MXU matmul: (..., nin) byte values ->
    (..., out_bytes) byte values through `matrix` ((nin*8, out_bytes*8)
    over GF(2), unpackbits/MSB-first bit convention on both sides)."""
    lead = values.shape[:-1]
    bits = (values[..., None].astype(jnp.int32)
            >> jnp.asarray(_BIT_SHIFTS.astype(np.int32))) & 1
    bits = bits.reshape(*lead, values.shape[-1] * 8).astype(jnp.int8)
    out_bits = (
        jax.lax.dot_general(
            bits,
            jnp.asarray(matrix),
            dimension_numbers=(((bits.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        & 1
    )
    ob = out_bits.reshape(*lead, out_bytes, 8)
    weights = jnp.asarray(1 << _BIT_SHIFTS.astype(np.int32))
    return jnp.sum(ob * weights, axis=-1)


def syndrome_field(codewords: jnp.ndarray) -> jnp.ndarray:
    """(..., 207) uint8 -> (..., 20) uint8 syndromes, one MXU matmul."""
    syn = _bit_matmul(codewords, _syndrome_bit_matrix(), _NROOTS)
    return syn.astype(jnp.uint8)


def _gf_pow(base_log: int, k: int) -> int:
    return (base_log * k) % 255


# -- GF(256) polynomial helpers (ascending coefficients: p[i] is x^i) ----

def _poly_trim(p: np.ndarray) -> np.ndarray:
    nz = np.nonzero(p)[0]
    return p[: nz[-1] + 1] if nz.size else p[:1]


def _poly_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    out = np.zeros(a.size + b.size - 1, dtype=np.uint8)
    for i, ai in enumerate(a):
        if ai:
            out[i : i + b.size] ^= gf_mul(b, ai)
    return out


def _poly_eval(p: np.ndarray, x_log: int) -> int:
    """Evaluate p at alpha^x_log (Horner, ascending coefficients)."""
    exp, log = gf_tables()
    acc = 0
    for c in p[::-1]:
        acc = (exp[(log[acc] + x_log) % 255] if acc else 0) ^ int(c)
    return acc


def _correct_with_erasures(
    cw: np.ndarray, syn: np.ndarray, erasures: tuple[int, ...]
) -> tuple[np.ndarray, int]:
    """Errors-and-erasures correction via the Sugiyama (extended Euclid)
    key-equation solver: corrects nu errors + e erasures whenever
    2*nu + e <= 20. Positions in `erasures` are byte indices into the
    207-byte codeword (0 = first transmitted byte, degree 206).

    Returns (corrected codeword, n_corrected); n = -1 if uncorrectable.
    """
    exp, log = gf_tables()
    e = len(erasures)
    if e > _NROOTS:
        return cw, -1

    # erasure locator Gamma(x) = prod (1 - X_i x), X_i = alpha^(206 - i)
    gamma = np.zeros(1, dtype=np.uint8)
    gamma[0] = 1
    for i in erasures:
        xi = exp[(_N - 1 - i) % 255]
        gamma = _poly_mul(gamma, np.array([1, xi], dtype=np.uint8))

    # modified syndrome Xi(x) = S(x) * Gamma(x) mod x^2t
    s_poly = np.asarray(syn, dtype=np.uint8)
    xi_poly = _poly_mul(s_poly, gamma)[:_NROOTS]

    # Sugiyama: Euclid on (x^2t, Xi) until deg(remainder) < (2t + e) / 2
    r_prev = np.zeros(_NROOTS + 1, dtype=np.uint8)
    r_prev[_NROOTS] = 1
    r_cur = _poly_trim(xi_poly.copy())
    t_prev = np.zeros(1, dtype=np.uint8)
    t_cur = np.ones(1, dtype=np.uint8)
    while r_cur.any() and 2 * (r_cur.size - 1) >= _NROOTS + e:
        # quotient/remainder of r_prev / r_cur
        rem = r_prev.copy()
        q = np.zeros(max(rem.size - r_cur.size + 1, 1), dtype=np.uint8)
        lead_log = log[int(r_cur[-1])]
        for d in range(rem.size - r_cur.size, -1, -1):
            c = int(rem[d + r_cur.size - 1])
            if c:
                qc = exp[(log[c] - lead_log) % 255]
                q[d] = qc
                rem[d : d + r_cur.size] ^= gf_mul(r_cur, qc)
        t_next = np.zeros(max(t_prev.size, q.size + t_cur.size - 1),
                          dtype=np.uint8)
        t_next[: t_prev.size] = t_prev
        t_next[: q.size + t_cur.size - 1] ^= _poly_mul(q, t_cur)
        r_prev, r_cur = r_cur, _poly_trim(rem)
        t_prev, t_cur = t_cur, _poly_trim(t_next)
    lam, omega = t_cur, r_cur
    if lam[0] == 0:
        return cw, -1
    inv0 = exp[255 - log[int(lam[0])]]
    lam = gf_mul(lam, inv0)
    omega = gf_mul(omega, inv0)
    # 2*deg(Lambda) + e must fit the parity budget
    if 2 * (lam.size - 1) + e > _NROOTS:
        return cw, -1

    psi = _poly_trim(_poly_mul(lam, gamma))  # combined locator

    # Chien search over the 207 valid positions
    pos = []
    for i in range(_N):
        x_inv_log = (255 - (_N - 1 - i)) % 255
        if _poly_eval(psi, x_inv_log) == 0:
            pos.append(i)
    if len(pos) != psi.size - 1:
        return cw, -1

    # Forney: Y_i = X_i * Omega(X_i^{-1}) / Psi'(X_i^{-1})
    out = cw.copy()
    n_changed = 0
    for i in pos:
        j = _N - 1 - i
        x_inv_log = (255 - j) % 255
        num = _poly_eval(omega, x_inv_log)
        den = 0
        for k in range(1, psi.size, 2):  # formal derivative: odd terms
            if psi[k]:
                den ^= exp[(log[int(psi[k])] + _gf_pow(x_inv_log, k - 1)) % 255]
        if den == 0:
            return cw, -1
        mag = gf_mul(gf_mul(num, exp[255 - log[den]]), exp[j % 255])
        if mag:
            out[i] ^= mag
            n_changed += 1
    if syndromes_np(out).any():
        return cw, -1
    return out, n_changed


def correct_segment_np(
    codeword: np.ndarray, erasures: tuple[int, ...] = ()
) -> tuple[np.ndarray, int]:
    """Correct byte errors (and optionally erasures) in one 207-byte
    codeword: up to 10 unknown errors, or any mix with 2*errors +
    erasures <= 20 when erasure positions are supplied (e.g. from the
    receiver's burst detector — erasures cost half an error's parity).

    Returns (corrected codeword, n_corrected); -1 if uncorrectable.
    Errors-only: classic Berlekamp-Massey -> Chien -> Forney; with
    erasures: Sugiyama key-equation solver on the modified syndrome.
    Numpy scalar (receiver-side utility; not on the TX hot path).
    """
    exp, log = gf_tables()
    cw = np.array(codeword, dtype=np.uint8)
    syn = syndromes_np(cw)
    if not syn.any():
        return cw, 0
    if erasures:
        out, n = _correct_with_erasures(cw, syn, tuple(erasures))
        if n >= 0:
            return out, n
        # erasure hints may be wrong/excessive — fall through and retry
        # as unknown-position errors (succeeds whenever true errors <= 10)

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


# == Device-side batched errors-only corrector ==========================
#
# At threshold SNR most of a field's 312 segments are dirty, and a
# per-segment host Python loop (one Berlekamp-Massey call each) costs
# seconds per step — wiping out the device decode throughput. The full
# errors-only decode runs on-device instead, vectorized over every
# segment of every channel at once with NO data-dependent control flow:
#
#  * GF(256) multiply = 8-step carryless shift/XOR on int32 lanes (pure
#    VPU work, no table gathers, which XLA lowers poorly on TPU);
#    inversion = Fermat a^254 by repeated squaring (13 multiplies).
#  * Berlekamp-Massey = the inversionless recurrence (the RiBM hardware
#    formulation): 20 fixed rounds, each round's x*K shift is a static
#    1-slot slide, the branch collapses to three `where`s. The scaled
#    locator C = c*Lambda shares Lambda's roots and the scale cancels
#    in Forney's Omega/Lambda' ratio, so no division is ever needed
#    inside the loop.
#  * Chien search and the Forney numerator/denominator evaluations at
#    all 207 codeword positions are GF(2)-LINEAR in the bits of the
#    polynomial coefficients, so each is ONE MXU bit-matmul against a
#    precomputed binary matrix — the same trick as syndrome_field.
#  * A decode is accepted only if L <= 10, #Chien roots == L, Lambda'
#    is non-zero at every root, and the re-computed syndromes of the
#    patched codeword are all zero; rejected segments return unchanged
#    with n = -1. Clean segments fall through untouched with n = 0
#    (delta stays 0 for all 20 rounds, so C = 1 and nothing matches).
#
# Erasure-assisted correction (the Sugiyama tier) deliberately stays on
# the host: burst-erasure events are rare and localized, while this
# path is the throughput-critical common case.

def _gf_mul_dev(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GF(256) multiply on device: carryless multiply with
    interleaved 0x11d reduction — 8 shift/mask/XOR rounds, no gathers."""
    b = b.astype(jnp.int32)
    cur = a.astype(jnp.int32)
    acc = jnp.zeros(jnp.broadcast_shapes(a.shape, b.shape), jnp.int32)
    for i in range(8):
        acc = acc ^ jnp.where(((b >> i) & 1) != 0, cur, 0)
        if i < 7:
            cur = ((cur << 1) & 0xFF) ^ jnp.where(
                (cur & 0x80) != 0, 0x1D, 0)
    return acc


def _gf_inv_dev(a: jnp.ndarray) -> jnp.ndarray:
    """Elementwise GF(256) inverse a^254 (Fermat); maps 0 -> 0 (callers
    must reject den == 0 explicitly)."""
    sq = _gf_mul_dev(a, a)          # a^2
    r = sq
    cur = sq
    for _ in range(6):              # a^4 .. a^128
        cur = _gf_mul_dev(cur, cur)
        r = _gf_mul_dev(r, cur)
    return r                        # a^(2+4+...+128) = a^254


def _xor_reduce(x: jnp.ndarray) -> jnp.ndarray:
    """XOR-reduce the last axis (log-depth fold)."""
    n = x.shape[-1]
    while n > 1:
        h = n // 2
        lo = x[..., :h] ^ x[..., h : 2 * h]
        x = (jnp.concatenate([lo, x[..., 2 * h :]], axis=-1)
             if n % 2 else lo)
        n = x.shape[-1]
    return x[..., 0]


@functools.lru_cache(maxsize=4)
def _eval_bit_matrix(kind: str) -> np.ndarray:
    """GF(2) matrix evaluating a coefficient vector at the 207 valid
    locator points alpha^{-j}, j = 206 - i (position i = first
    transmitted byte at i = 0, matching correct_segment_np):

    - 'chien':    (21*8, 207*8)  V[i] = sum_k C[k] alpha^{-j k}
    - 'omega':    (20*8, 207*8)  num[i] = sum_k Omega[k] alpha^{-j k}
    - 'lamprime': (21*8, 207*8)  den[i] = sum_{k odd} C[k] alpha^{-j (k-1)}
    """
    exp, _ = gf_tables()
    j = _N - 1 - np.arange(_N)                      # (207,) degrees
    ncoef = _NROOTS if kind == "omega" else _NROOTS + 1
    k = np.arange(ncoef)
    if kind == "lamprime":
        powlog = (-(j[None, :] * (k - 1)[:, None])) % 255
        active = (k % 2) == 1                       # formal derivative
    else:
        powlog = (-(j[None, :] * k[:, None])) % 255
        active = np.ones(ncoef, dtype=bool)
    m = np.zeros((ncoef * 8, _N * 8), dtype=np.int8)
    for kk in range(ncoef):
        if not active[kk]:
            continue
        base = exp[powlog[kk]].astype(np.uint8)     # (207,)
        for t in range(8):
            vals = gf_mul(np.uint8(1 << (7 - t)), base)
            m[kk * 8 + t] = np.unpackbits(vals)
    return m


@functools.lru_cache(maxsize=1)
def _alpha_j() -> np.ndarray:
    """(207,) int32 X_i = alpha^{j}, j = 206 - i (Forney's X_i factor)."""
    exp, _ = gf_tables()
    return exp[(_N - 1 - np.arange(_N)) % 255].astype(np.int32)


def rs_correct_field(
    codewords: jnp.ndarray, syn: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched errors-only RS correction, entirely on device.

    codewords: (..., 207) uint8; syn: (..., 20) uint8 (syndrome_field
    output for the same codewords; any leading batch shape, e.g.
    (B, 312) or (T, B, 312)). Returns (corrected (..., 207) uint8,
    n_errors (...,) int32): n >= 0 bytes corrected, -1 uncorrectable
    (codeword returned unchanged). Matches correct_segment_np without
    erasures on every segment (tests/test_rs_decode.py oracle check).
    """
    s = syn.astype(jnp.int32)
    cw = codewords.astype(jnp.int32)
    lead = syn.shape[:-1]

    # inversionless Berlekamp-Massey, 20 fixed rounds
    c = jnp.zeros(lead + (_NROOTS + 1,), jnp.int32).at[..., 0].set(1)
    k = c
    ell = jnp.zeros(lead, jnp.int32)
    gamma = jnp.ones(lead, jnp.int32)
    for r in range(_NROOTS):
        prod = _gf_mul_dev(c[..., : r + 1],
                           jnp.flip(s[..., : r + 1], axis=-1))
        delta = _xor_reduce(prod)
        xk = jnp.concatenate(
            [jnp.zeros(lead + (1,), jnp.int32), k[..., :-1]], axis=-1)
        c_new = (_gf_mul_dev(gamma[..., None], c)
                 ^ _gf_mul_dev(delta[..., None], xk))
        upd = (delta != 0) & (2 * ell <= r)
        k = jnp.where(upd[..., None], c, xk)
        gamma = jnp.where(upd, delta, gamma)
        ell = jnp.where(upd, r + 1 - ell, ell)
        c = c_new

    # Chien search at all 207 positions: one bit-matmul
    v = _bit_matmul(c, _eval_bit_matrix("chien"), _N)
    root = v == 0
    nroots = jnp.sum(root, axis=-1).astype(jnp.int32)

    # Omega = S(x) C(x) mod x^20 (21 vectorized GF multiplies)
    omega = jnp.zeros(lead + (_NROOTS,), jnp.int32)
    for kk in range(_NROOTS + 1):
        t = _gf_mul_dev(c[..., kk, None], s[..., : _NROOTS - kk])
        pad = jnp.zeros(lead + (kk,), jnp.int32)
        omega = omega ^ jnp.concatenate([pad, t], axis=-1)

    # Forney at all positions: num/den bit-matmuls + Fermat inversion
    num = _bit_matmul(omega, _eval_bit_matrix("omega"), _N)
    den = _bit_matmul(c, _eval_bit_matrix("lamprime"), _N)
    mag = _gf_mul_dev(_gf_mul_dev(num, _gf_inv_dev(den)),
                      jnp.asarray(_alpha_j()))

    ok = (
        (ell <= _NROOTS // 2)
        & (nroots == ell)
        & ~jnp.any(root & (den == 0), axis=-1)
    )
    corrected = jnp.where(root & ok[..., None], cw ^ mag, cw)
    syn2 = syndrome_field(corrected.astype(jnp.uint8))
    ok = ok & ~jnp.any(syn2 != 0, axis=-1)
    out = jnp.where(ok[..., None], corrected, cw).astype(jnp.uint8)
    n = jnp.where(ok, nroots, -1)
    return out, n


#: jitted singleton for host callers (Decoder, ShardedDecoder)
rs_correct_field_jit = jax.jit(rs_correct_field)
