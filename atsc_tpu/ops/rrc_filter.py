"""Root-raised-cosine pulse-shaping FIR stage.

Behavioral spec: reference src/atsc/filter.h:9-69 — anti-causal forward
convolution out[i] = sum_{k=0..111} in[i+k] * c[k] for i in [0, 260416)
over the padded field (the 832-symbol field-sync pad supplies the 111-
sample lookahead exactly, making fields embarrassingly parallel).

TPU-first formulation: a short-FIR over a long stream maps onto the MXU as
a *banded matmul*. Partition the stream into 128-sample blocks A[j]; then

    out[j] = A[j] @ W_lo + A[j+1] @ W_hi

with W_lo[m, r] = c[m-r], W_hi[m, r] = c[128+m-r] (banded 128x128
constants). Two batched (2035, 128) x (128, 128) matmuls per field — ~2.3x
the FLOPs of the direct form but two orders of magnitude faster than XLA's
1D conv lowering on TPU, with no window materialization (the two operands
are plain shifted views of the same blocked array).

Full-fp32 precision (HIGHEST) keeps the output within the reference's
1e-6/component contract. The readable conv form is kept for cross-checking.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.rrc import rrc_taps

_BLK = 128
_NBLK_IN = P.PADDED_SYMBOLS // _BLK            # 2041 (exact)
_NBLK_OUT = -(-P.SYMBOLS_PER_FIELD // _BLK)    # 2035 (covers 260416, +64 slack)


@functools.lru_cache(maxsize=1)
def _band_matrices() -> tuple[np.ndarray, np.ndarray]:
    taps = rrc_taps().astype(np.float32)  # 112 entries, last is 0
    m = np.arange(_BLK)[:, None]
    r = np.arange(_BLK)[None, :]
    k_lo = m - r
    k_hi = _BLK + m - r
    w_lo = np.where(
        (k_lo >= 0) & (k_lo < P.RRC_TAPS), taps[np.clip(k_lo, 0, P.RRC_TAPS - 1)], 0.0
    )
    w_hi = np.where(k_hi < P.RRC_TAPS, taps[np.clip(k_hi, 0, P.RRC_TAPS - 1)], 0.0)
    return w_lo.astype(np.float32), w_hi.astype(np.float32)


def banded_fir(x: jnp.ndarray, n_out: int) -> jnp.ndarray:
    """Forward FIR out[i] = sum_k x[..., i+k] c[k] as MXU banded matmuls.

    x: (..., n_in) float32 with n_in >= n_out + 111. Returns (..., n_out).
    """
    *lead, n_in = x.shape
    nblk_out = -(-n_out // _BLK)
    nblk_in = nblk_out + 1
    pad = nblk_in * _BLK - n_in
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    w_lo, w_hi = _band_matrices()
    a = x[..., : nblk_in * _BLK].reshape(-1, nblk_in, _BLK)
    x_lo = a[:, :nblk_out].reshape(-1, _BLK)
    x_hi = a[:, 1 : nblk_out + 1].reshape(-1, _BLK)
    out = jnp.dot(
        x_lo, jnp.asarray(w_lo), precision=jax.lax.Precision.HIGHEST
    ) + jnp.dot(x_hi, jnp.asarray(w_hi), precision=jax.lax.Precision.HIGHEST)
    return out.reshape(*lead, nblk_out * _BLK)[..., :n_out]


@functools.lru_cache(maxsize=4)
def _band_matrices_for(taps_bytes: bytes, n_taps: int) -> tuple[np.ndarray, ...]:
    """Banded 128x128 matrices W_s[m, r] = taps[s*128 + m - r] for an
    arbitrary forward FIR (generalizes _band_matrices beyond 112 taps)."""
    taps = np.frombuffer(taps_bytes, dtype=np.float32)
    n_bands = -(-(n_taps + _BLK - 1) // _BLK)
    m = np.arange(_BLK)[:, None]
    r = np.arange(_BLK)[None, :]
    out = []
    for s in range(n_bands):
        k = s * _BLK + m - r
        w = np.where(
            (k >= 0) & (k < n_taps), taps[np.clip(k, 0, n_taps - 1)], 0.0
        )
        out.append(w.astype(np.float32))
    return tuple(out)


def banded_fir_taps(
    x: jnp.ndarray, taps: np.ndarray, n_out: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Forward FIR out[i] = sum_k x[..., i+k] taps[k] for arbitrary tap
    counts, as a sum of shifted 128-block MXU matmuls.

    x: (..., n_in) float32 with n_in >= n_out + len(taps) - 1.
    precision: HIGHEST (6-pass fp32, the transmit-side 1e-6 contract)
    down to DEFAULT (1-pass bf16 — fine for receive-side slicing, whose
    decision margin is ~1.0 level).
    """
    taps = np.ascontiguousarray(taps, dtype=np.float32)
    bands = _band_matrices_for(taps.tobytes(), taps.size)
    *lead, n_in = x.shape
    nblk_out = -(-n_out // _BLK)
    nblk_in = nblk_out + len(bands) - 1
    pad = nblk_in * _BLK - n_in
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, pad)])
    a = x[..., : nblk_in * _BLK].reshape(-1, nblk_in, _BLK)
    out = 0.0
    for s, w in enumerate(bands):
        out = out + jnp.dot(
            a[:, s : s + nblk_out].reshape(-1, _BLK),
            jnp.asarray(w),
            precision=precision,
        )
    return out.reshape(*lead, nblk_out * _BLK)[..., :n_out]


def banded_fir_wl(
    xr: jnp.ndarray, xi: jnp.ndarray, taps_r: np.ndarray, taps_i: np.ndarray,
    n_out: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Widely-linear two-plane FIR out[i] = sum_k xr[..,i+k] tr[k] +
    xi[..,i+k] ti[k], fused into one K=256 MXU dot per band (the receive
    equalizer's shape: both planes contract into one real output).

    xr, xi: (..., n_in) float32 with n_in >= n_out + len(taps) - 1.
    """
    taps_r = np.ascontiguousarray(taps_r, dtype=np.float32)
    taps_i = np.ascontiguousarray(taps_i, dtype=np.float32)
    assert taps_r.size == taps_i.size
    bands_r = _band_matrices_for(taps_r.tobytes(), taps_r.size)
    bands_i = _band_matrices_for(taps_i.tobytes(), taps_i.size)
    *lead, n_in = xr.shape
    nblk_out = -(-n_out // _BLK)
    nblk_in = nblk_out + len(bands_r) - 1
    pad = nblk_in * _BLK - n_in
    if pad > 0:
        padding = [(0, 0)] * len(lead) + [(0, pad)]
        xr = jnp.pad(xr, padding)
        xi = jnp.pad(xi, padding)
    ar = xr[..., : nblk_in * _BLK].reshape(-1, nblk_in, _BLK)
    ai = xi[..., : nblk_in * _BLK].reshape(-1, nblk_in, _BLK)
    out = 0.0
    for s, (wr, wi) in enumerate(zip(bands_r, bands_i)):
        a2 = jnp.concatenate(
            [
                ar[:, s : s + nblk_out].reshape(-1, _BLK),
                ai[:, s : s + nblk_out].reshape(-1, _BLK),
            ],
            axis=-1,
        )
        w2 = np.concatenate([wr, wi], axis=0)  # (256, 128)
        out = out + jnp.dot(a2, jnp.asarray(w2), precision=precision)
    return out.reshape(*lead, nblk_out * _BLK)[..., :n_out]


def rrc_filter_field(iq_planar: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, 261248) planar float32 -> (B, 2, 260480) planar float32 IQ.

    Output stays planar and 128-block padded (valid through sample 260,416)
    so the banded matmul writes its destination directly — interleaving to
    the reference's CF32 layout happens at the host boundary
    (models.encoder.iq_interleave).
    """
    return banded_fir(iq_planar, P.PADDED_OUT)


def rrc_filter_field_conv(iq_planar: jnp.ndarray) -> jnp.ndarray:
    """Readable XLA-conv fallback (identical semantics, used in tests)."""
    kernel = rrc_taps()[: P.RRC_NTAPS].reshape(1, 1, P.RRC_NTAPS)
    b = iq_planar.shape[0]
    planar = iq_planar.reshape(b * 2, 1, P.PADDED_SYMBOLS)
    out = jax.lax.conv_general_dilated(
        planar,
        jnp.asarray(kernel),
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        precision=jax.lax.Precision.HIGHEST,
    )
    out = out[:, 0, : P.PADDED_OUT]
    pad = P.PADDED_OUT - out.shape[-1]
    out = jnp.pad(out, ((0, 0), (0, pad)))
    return out.reshape(b, 2, P.PADDED_OUT)
