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
