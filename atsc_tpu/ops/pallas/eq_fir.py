"""Fused derotate + widely-linear FIR + slicer Pallas kernel — the
receive-side twin of ops/pallas/offset_fir.py.

The XLA equalizer step (models/receiver.py `_eq_step_fn`) is
traffic-bound, not compute-bound: at B=64 it costs ~4.5 ms against a
~1 ms read-the-window floor, because the derotated planes materialize in
HBM and each FIR band re-reads them (tools/rx_stage_budget.py). Here the
window is read from HBM exactly once: derotation happens in VMEM, the
banded WL dots run on the MXU (bf16 operands / f32 accumulate — the same
arithmetic as the XLA fast tier's DEFAULT precision), and only the int8
symbols (or f32 soft levels) are written back.

Geometry: the window covers stream span [g0 - K, g0 - K + WIN_LEN(K)),
i.e. it starts exactly at the first sample the K-tap-support FIR reads,
so the FIR operand begins at block 0 — no offset slicing, no copies. The
output is padded to 2048 row-blocks (int8 stores need 32-row-multiple
blocks); samples [0, 260416) are the field. The per-chunk
lookahead (band count - 1 blocks) is read through a SECOND BlockSpec over
the *same* input array whose block is lookahead-sized — overlapping
windows cannot be expressed by one tiling, but two tilings of one HBM
buffer can, with zero extra copies.

Integer-code windows (cs16/cs8 wire formats) are consumed verbatim: the
kernel casts and folds the dequantization scale into the derotation
constant, exactly like the XLA step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atsc_tpu import params as P

_BLK = 128
OUT_BLKS = 2048                    # >= 260,416 / 128, 32-row divisible
OUT_LEN = OUT_BLKS * _BLK          # 262,144
_NCHUNK = 2
_ROWS = OUT_BLKS // _NCHUNK        # 1024
_HALO_BLKS = 8                     # halo tile rows (Mosaic 8-sublane min)

#: required window length for any supported K (the 8-block tail covers
#: the largest lookahead: bands-1 = 2K/128 <= 8, i.e. K <= 512; unused
#: tail rows may be zero)
WIN_LEN = (OUT_BLKS + _HALO_BLKS) * _BLK     # 263,168


def bands_for(eq_k: int) -> int:
    """Number of 128-wide FIR bands for one-sided tap support K."""
    return (2 * eq_k) // _BLK + 1


def win_len(eq_k: int) -> int:
    """Required window length (constant across supported K)."""
    assert bands_for(eq_k) - 1 <= _HALO_BLKS, eq_k
    return WIN_LEN


@functools.lru_cache(maxsize=8)
def _band_weights(eq_k: int, dtype: str = "bfloat16") -> np.ndarray:
    """(bands, 256, 128) per band s: rows 0:128 apply to the derotated
    real plane, rows 128:256 to the imaginary plane. dtype 'bfloat16'
    for the fast tier's DEFAULT arithmetic, 'float32' for exact."""
    from atsc_tpu.models.receiver import _wl_eq_taps
    from atsc_tpu.ops.rrc_filter import _band_matrices_for

    p_taps, q_taps = _wl_eq_taps(eq_k)
    p_taps = np.ascontiguousarray(p_taps, np.float32)
    q_taps = np.ascontiguousarray(q_taps, np.float32)
    br = _band_matrices_for(p_taps.tobytes(), p_taps.size)
    bi = _band_matrices_for(q_taps.tobytes(), q_taps.size)
    assert len(br) == bands_for(eq_k), (len(br), eq_k)
    w = np.stack([np.concatenate([r, i], axis=0) for r, i in zip(br, bi)])
    return w.astype(jnp.dtype(dtype))


def _kernel(win_ref, whalo_ref, osc_ref, ohalo_ref, w_ref, out_ref, *,
            rows, bands, inv_p2, soft, exact=False, soft_q=False):
    f32 = jnp.float32
    lk = bands - 1
    wr = win_ref[0, 0].astype(f32)
    wi = win_ref[0, 1].astype(f32)
    # the halo blocks come in _HALO_BLKS-row tiles (the Mosaic 8-sublane
    # block minimum); only the first lk rows are the real lookahead
    hr = whalo_ref[0, 0].astype(f32)
    hq = whalo_ref[0, 1].astype(f32)
    cr, ci = osc_ref[0], osc_ref[1]
    hcr, hci = ohalo_ref[0], ohalo_ref[1]
    s = f32(inv_p2)
    hre = jax.lax.slice_in_dim(hr * hcr + hq * hci, 0, lk, axis=0)
    him = jax.lax.slice_in_dim(hq * hcr - hr * hci, 0, lk, axis=0)
    # derotate by conj(osc), fold 1/P^2 (+ dequant): u = win * conj(osc)
    ur = jnp.concatenate([wr * cr + wi * ci, hre], axis=0) * s
    ui = jnp.concatenate([wi * cr - wr * ci, him], axis=0) * s
    if exact:
        # fp32 operands, HIGHEST (6-pass) matmuls: the exact tier's
        # arithmetic, reproducing the XLA path to f32 rounding
        urb, uib = ur, ui
        prec = jax.lax.Precision.HIGHEST
    else:
        # bf16 operands / f32 accumulate: the fast tier's DEFAULT
        urb = ur.astype(jnp.bfloat16)
        uib = ui.astype(jnp.bfloat16)
        prec = None
    lev = jnp.zeros((rows, _BLK), f32)
    for b_ in range(bands):
        a2 = jnp.concatenate(
            [jax.lax.slice_in_dim(urb, b_, b_ + rows, axis=0),
             jax.lax.slice_in_dim(uib, b_, b_ + rows, axis=0)], axis=1)
        lev = lev + jnp.dot(a2, w_ref[b_], precision=prec,
                            preferred_element_type=f32)
    if soft and soft_q:
        # int8 soft-level codes (ops.quantize SOFT_LEVEL_SCALE): quarters
        # the levels' HBM traffic through eq-write/gather/transpose; the
        # Viterbi kernel dequantizes per step
        from atsc_tpu.ops.quantize import SOFT_LEVEL_SCALE

        q = jnp.clip(jnp.round(lev * f32(SOFT_LEVEL_SCALE)), -127, 127)
        out_ref[0] = q.astype(jnp.int8)
    elif soft:
        out_ref[0] = lev
    else:
        sym = jnp.clip(
            jnp.round((lev - f32(P.PILOT_OFFSET - 7.0)) * 0.5), 0, 7)
        out_ref[0] = sym.astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("eq_k", "soft", "dequant", "interpret", "exact",
                     "soft_q"))
def eq_fir_fused(
    win: jnp.ndarray,
    osc: jnp.ndarray,
    eq_k: int = 128,
    soft: bool = False,
    dequant: float = 1.0,
    interpret: bool = False,
    exact: bool = False,
    soft_q: bool = False,
) -> jnp.ndarray:
    """win: (B, 2, win_len(eq_k)) planar window (float32 or cs16/cs8
    integer codes) covering stream span [g0 - eq_k, ...); osc: (2, same)
    float32 oscillator for the same span.

    Returns (B, 262144): int8 hard symbols (soft=False) or float32 soft
    levels; samples [0, 260416) are the field starting at g0.
    soft_q=True (soft only): int8 soft-level codes at
    ops.quantize.SOFT_LEVEL_SCALE — the throughput tier's wire format
    between the equalizer and the Viterbi kernel.
    """
    from atsc_tpu.models.receiver import _DEV_MARGIN  # noqa: F401 (doc)

    b = win.shape[0]
    bands = bands_for(eq_k)
    assert bands - 1 <= _HALO_BLKS, (
        f"eq_k={eq_k} needs {bands - 1} lookahead blocks; the halo tiling "
        f"covers {_HALO_BLKS} (K <= {_HALO_BLKS * _BLK // 2})")
    assert win.shape[-1] == WIN_LEN, (win.shape, WIN_LEN)
    assert osc.shape[-1] == WIN_LEN, (osc.shape, WIN_LEN)
    in_blks = OUT_BLKS + _HALO_BLKS
    inv_p2 = float(dequant / (P.OSC_AMPLITUDE ** 2))
    w = jnp.asarray(_band_weights(eq_k,
                                  "float32" if exact else "bfloat16"))

    # the halo (lookahead) blocks [c*R + R, c*R + R + lk) are addressed by
    # a second tiling of the SAME arrays in _HALO_BLKS-row blocks (the
    # Mosaic 8-sublane minimum; the kernel uses the first lk rows) — two
    # tilings of one HBM buffer express the overlap with zero copies
    hb = _HALO_BLKS
    assert _ROWS % hb == 0
    hstep = _ROWS // hb
    win4 = win.reshape(b, 2, in_blks, _BLK)
    osc4 = osc.reshape(2, in_blks, _BLK)

    kernel = functools.partial(
        _kernel, rows=_ROWS, bands=bands, inv_p2=inv_p2, soft=soft,
        exact=exact, soft_q=soft_q)
    out_dtype = jnp.float32 if (soft and not soft_q) else jnp.int8
    out = pl.pallas_call(
        kernel,
        grid=(_NCHUNK, b),
        in_specs=[
            pl.BlockSpec((1, 2, _ROWS, _BLK), lambda c, bb: (bb, 0, c, 0)),
            pl.BlockSpec((1, 2, hb, _BLK),
                         lambda c, bb: (bb, 0, (c + 1) * hstep, 0)),
            pl.BlockSpec((2, _ROWS, _BLK), lambda c, bb: (0, c, 0)),
            pl.BlockSpec((2, hb, _BLK),
                         lambda c, bb: (0, (c + 1) * hstep, 0)),
            pl.BlockSpec((bands, 2 * _BLK, _BLK), lambda c, bb: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, _ROWS, _BLK), lambda c, bb: (bb, c, 0)),
        out_shape=jax.ShapeDtypeStruct((b, OUT_BLKS, _BLK), out_dtype),
        interpret=interpret,
    )(win4, win4, osc4, osc4, w)
    return out.reshape(b, OUT_LEN)
