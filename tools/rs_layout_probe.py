"""Probe: does the RS corrector's Berlekamp-Massey loop benefit from a
lane-major layout?

The shipped `rs_correct_field` runs BM on (B, 312, 21) int32 arrays —
the 21-coefficient axis sits in the 128-wide lane dimension (21/128
utilization, 6x padding waste), with segments in sublanes. This probe
times a variant whose BM block operates on (21, B*312) arrays instead:
coefficients in sublanes, ALL segments of all channels packed densely
into lanes (B=256 -> 79,872 lanes = 624 full rows of 128). Everything
downstream of BM (Chien/Forney bit-matmuls) is unchanged — the locator
is transposed back once (6.7 MB, cheap).

Run on the attached chip:  python tools/rs_layout_probe.py [B]
"""

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from atsc_tpu import params as P
from atsc_tpu.ops.rs_decode import (
    _NROOTS, _N, _alpha_j, _bit_matmul, _eval_bit_matrix, _gf_inv_dev,
    _gf_mul_dev, rs_correct_field, syndrome_field,
)
from atsc_tpu.ops.rs_encode import rs_encode_field


def _xor_reduce0(x):
    """XOR-reduce axis 0 (log-depth fold)."""
    n = x.shape[0]
    while n > 1:
        h = n // 2
        lo = x[:h] ^ x[h : 2 * h]
        x = jnp.concatenate([lo, x[2 * h :]], axis=0) if n % 2 else lo
        n = x.shape[0]
    return x[0]


def rs_correct_field_lanemajor(codewords, syn):
    """rs_correct_field with the BM loop in (ncoef, M) layout."""
    lead = syn.shape[:-1]
    m_lanes = int(np.prod(lead))
    s_t = syn.astype(jnp.int32).reshape(m_lanes, _NROOTS).T  # (20, M)
    cw = codewords.astype(jnp.int32)

    c = jnp.zeros((_NROOTS + 1, m_lanes), jnp.int32).at[0].set(1)
    k = c
    ell = jnp.zeros((m_lanes,), jnp.int32)
    gamma = jnp.ones((m_lanes,), jnp.int32)
    for r in range(_NROOTS):
        prod = _gf_mul_dev(c[: r + 1], jnp.flip(s_t[: r + 1], axis=0))
        delta = _xor_reduce0(prod)
        xk = jnp.concatenate(
            [jnp.zeros((1, m_lanes), jnp.int32), k[:-1]], axis=0)
        c_new = (_gf_mul_dev(gamma[None], c)
                 ^ _gf_mul_dev(delta[None], xk))
        upd = (delta != 0) & (2 * ell <= r)
        k = jnp.where(upd[None], c, xk)
        gamma = jnp.where(upd, delta, gamma)
        ell = jnp.where(upd, r + 1 - ell, ell)
        c = c_new

    c = c.T.reshape(lead + (_NROOTS + 1,))
    s = syn.astype(jnp.int32)
    ell = ell.reshape(lead)

    v = _bit_matmul(c, _eval_bit_matrix("chien"), _N)
    root = v == 0
    nroots = jnp.sum(root, axis=-1).astype(jnp.int32)

    omega = jnp.zeros(lead + (_NROOTS,), jnp.int32)
    for kk in range(_NROOTS + 1):
        t = _gf_mul_dev(c[..., kk, None], s[..., : _NROOTS - kk])
        pad = jnp.zeros(lead + (kk,), jnp.int32)
        omega = omega ^ jnp.concatenate([pad, t], axis=-1)

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


def _barrier(x):
    float(jnp.sum(x.astype(jnp.float32)))


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    rng = np.random.default_rng(7)
    data = np.zeros(
        (batch, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES), np.uint8)
    data[..., : P.SEGMENT_BYTES] = rng.integers(
        0, 256, (batch, P.DATA_SEGMENTS, P.SEGMENT_BYTES), np.uint8)
    cw = np.array(rs_encode_field(jnp.asarray(data)))
    # corrupt 90% of segments with 5 byte errors each
    dirty = rng.random((batch, P.DATA_SEGMENTS)) < 0.9
    for b in range(batch):
        for s in np.nonzero(dirty[b])[0]:
            pos = rng.choice(P.SEGMENT_FEC_BYTES, 5, replace=False)
            cw[b, s, pos] ^= rng.integers(1, 256, 5, np.uint8)
    cwj = jnp.asarray(cw)
    syn = syndrome_field(cwj)
    _barrier(syn)

    old = jax.jit(rs_correct_field)
    new = jax.jit(rs_correct_field_lanemajor)
    out_o, n_o = old(cwj, syn)
    out_n, n_n = new(cwj, syn)
    same = bool(jnp.all(out_o == out_n)) and bool(jnp.all(n_o == n_n))
    print(f"outputs identical: {same}  "
          f"(corrected {int(jnp.sum(n_o > 0))} segs, "
          f"uncorrectable {int(jnp.sum(n_o < 0))})")
    assert same

    for name, fn in (("batch-major (shipped)", old),
                     ("lane-major BM", new)):
        o, _ = fn(cwj, syn)
        _barrier(o)
        t0 = time.perf_counter()
        for _ in range(20):
            o, _ = fn(cwj, syn)
        _barrier(o)
        dt = (time.perf_counter() - t0) / 20
        print(f"{name:24s} B={batch}: {dt * 1e3:7.2f} ms/dispatch")


if __name__ == "__main__":
    main()
