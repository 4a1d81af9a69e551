"""Fused level-map + pilot-offset + RRC-FIR Pallas kernel.

Replaces the back half of the pipeline (reference signal.h level map +
offset.h AVX complex multiply + filter.h 112-tap FIR) with one pass: the
int8 symbol-value field is read from HBM once (a quarter of the float
field's bytes), mapped to levels and modulated onto the oscillator in VMEM,
pushed through the banded-matmul FIR on the MXU, and written out as planar
float32 IQ — no intermediate field ever touches HBM, no padding copy on the
way in (261,248 = 2041 x 128 exactly), and no slice/transpose pass on the
way out (the (B, 2, 2040, 128) result IS the (B, 2, 261120) padded planar
output, valid through sample 260,416).

Per grid step (one 680-row output chunk of one channel) the banded FIR is
four fp32 MXU matmuls on (680, 128)-row operands:

    FIR_u[j] = U[j] @ W_lo + U[j+1] @ W_hi      (u = levels * osc_re)
    FIR_w[j] = W[j] @ W_lo + W[j+1] @ W_hi      (w = levels * osc_im)

and the per-field phase-continuity phasor rotates the *outputs*
(out_I = FIR_u*pr - FIR_w*pi, out_Q = FIR_u*pi + FIR_w*pr) — valid because
the real-tap FIR commutes with a complex scalar, and cheaper than rotating
the oscillator per (channel, component): the modulate prologue runs once
per channel instead of twice, and the component axis disappears from the
grid (measured ~9% faster than the rotate-inputs form on v5e).

The grid is (chunks, B) with the chunk axis OUTERMOST so the per-chunk
oscillator blocks stay VMEM-resident across all channel steps. fp32
(HIGHEST) matmuls are required: the 5e-6 golden bound rules out bf16
operand rounding (DEFAULT err 2.7e-3, 3-pass HIGH err 1.8e-5), and the
oscillator's float32-argument quirk rules out the bf16-exact "rotate the
taps" formulation (the table is NOT e^{j*theta*n}). See PERF.md for the
full measurement log.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atsc_tpu import params as P
from atsc_tpu.ops.offset import _osc_planar
from atsc_tpu.ops.quantize import QMAX, quantize_scale
from atsc_tpu.ops.rrc_filter import _band_matrices

_BLK = 128
_IN_BLKS = P.PADDED_SYMBOLS // _BLK   # 2041 (exact)
_OUT_BLKS = P.PADDED_OUT // _BLK      # 2040 (261,120 outputs >= 260,416)
# Chunk count: fewest chunks whose blocks still fit VMEM with Mosaic's
# double buffering — fewer, larger output DMAs measured fastest (B=384
# same-run sweep, tools/fir_probe.py: 3 chunks 8.62 ms, 5 chunks 8.77,
# 15 chunks 9.79, 17 chunks 9.95; see PERF.md round-3 log).
_NCHUNK = 3
_ROWS = _OUT_BLKS // _NCHUNK          # 680 rows (divisible by 8)

# Quantized (CS16/CS8) output geometry: int16 stores need 16-row-multiple
# blocks and int8 stores 32-row multiples, and 2040 has no such divisor, so
# the quantized grid rounds the output up to 2048 row-blocks (2 chunks x
# 1024 rows — same fewest-chunks rule: 7.21 ms vs 7.35 at 4 chunks, cs8
# B=384) and zero-pads the int8 input field by 8 blocks to feed the
# (garbage, never-read) outputs past block 2040.
_OUT_BLKS_Q = 2048
_NCHUNK_Q = 2
_ROWS_Q = _OUT_BLKS_Q // _NCHUNK_Q    # 1024 rows (divisible by 32)
_IN_BLKS_Q = _OUT_BLKS_Q + 1          # 2049
QUANT_FIELD_LEN = _IN_BLKS_Q * _BLK   # 262,272 (callers may pre-pad to this)

_LEVEL_BIAS = float(P.PILOT_OFFSET - 7.0)  # level = 2v - 7 + 1.25


@functools.lru_cache(maxsize=2)
def _osc_blocked(nblks: int = _IN_BLKS) -> np.ndarray:
    re, im = _osc_planar()
    osc = np.stack([re, im]).reshape(2, _IN_BLKS, _BLK)
    if nblks > _IN_BLKS:  # quantized grid: zero rows feeding unused outputs
        osc = np.concatenate(
            [osc, np.zeros((2, nblks - _IN_BLKS, _BLK), osc.dtype)], axis=1
        )
    return osc


def _kernel(phasor_ref, fa_ref, fb_ref, osc_a_ref, osc_b_ref,
            wlo_ref, whi_ref, out_ref, *, qscale=None, qmax=None,
            wire=None):
    # fa/fb: int8 field rows [cR, cR+R) and [cR+1, cR+R+1) of this channel
    # (view B is the one-row-shifted stream for the FIR's +128-sample
    # lookahead operand); osc_a/osc_b: matching oscillator rows, resident
    # across the inner channel grid axis.
    bb = pl.program_id(1)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    xa = fa_ref[0].astype(jnp.float32) * 2.0 + _LEVEL_BIAS
    xb = fb_ref[0].astype(jnp.float32) * 2.0 + _LEVEL_BIAS
    ua = xa * osc_a_ref[0]
    wa = xa * osc_a_ref[1]
    ub = xb * osc_b_ref[0]
    wb = xb * osc_b_ref[1]

    # HIGHEST: the MXU's default bf16 input rounding costs ~3e-3 absolute
    # error on +/-8-level symbols; fp32 passes keep us within the 5e-6
    # golden bound (matches the unfused rrc_filter op's precision).
    hp = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    fu = jnp.dot(
        ua, wlo_ref[...], precision=hp, preferred_element_type=f32
    ) + jnp.dot(ub, whi_ref[...], precision=hp, preferred_element_type=f32)
    fw = jnp.dot(
        wa, wlo_ref[...], precision=hp, preferred_element_type=f32
    ) + jnp.dot(wb, whi_ref[...], precision=hp, preferred_element_type=f32)
    out_i = fu * pr - fw * pi
    out_q = fu * pi + fw * pr
    if qscale is not None:
        # in-kernel CS16/CS8 quantization: round-to-nearest-even + clip,
        # matching ops.quantize.quantize_iq; halves/quarters the kernel's
        # bottleneck output-DMA bytes (PERF.md)
        s = jnp.float32(qscale)
        lim = jnp.float32(qmax)
        out_i = jnp.clip(jnp.round(out_i * s), -lim, lim)
        out_q = jnp.clip(jnp.round(out_q * s), -lim, lim)
    if wire is not None:
        # SDR wire layout straight from the kernel: each (I, Q) code
        # pair packed into ONE little-endian int lane, so the written
        # array's bytes ARE the interleaved wire stream — the host's
        # planar->interleaved pass (187 ms/step at B=384, PERF.md)
        # disappears. cs8: 2 bytes in an int16; cs16: 4 in an int32.
        ii = out_i.astype(jnp.int32)
        qq = out_q.astype(jnp.int32)
        if wire == "cs8":
            packed = (ii & 0xFF) | ((qq & 0xFF) << 8)
            # re-sign to int16 range before the narrowing cast (int32 ->
            # int16 conversion of out-of-range values is not defined as
            # a wrap on every backend)
            packed = packed - ((packed & 0x8000) << 1)
        else:
            packed = (ii & 0xFFFF) | (qq << 16)
        out_ref[0] = packed.astype(out_ref.dtype)
    else:
        out_ref[0, 0, :, :] = out_i.astype(out_ref.dtype)
        out_ref[0, 1, :, :] = out_q.astype(out_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("interpret", "out_format", "wire"))
def offset_fir_fused(
    field: jnp.ndarray,
    phasor: jnp.ndarray,
    interpret: bool = False,
    out_format: str = "cf32",
    wire: bool = False,
) -> jnp.ndarray:
    """field: (B, 261248) int8 symbol values; phasor: (B, 2) float32.

    out_format 'cf32' (default): (B, 2, 261120) planar float32 IQ
    (level map + pilot offset + RRC fused). 'cs16'/'cs8': the same IQ
    quantized in-kernel to int16/int8 codes at ops.quantize.quantize_scale,
    shape (B, 2, 262144). Either way samples [0, 260416) are the field's
    valid output.

    wire=True (quantized formats only): each (I, Q) pair is packed into
    one little-endian lane in-kernel — (B, 262144) int16 (cs8) / int32
    (cs16) whose raw bytes per channel ARE the interleaved SDR wire
    stream (reference atsc_encoder.cpp:89's interleaved contract), so
    the host writes them verbatim with no transpose pass.
    """
    b = field.shape[0]
    if out_format == "cf32":
        if wire:
            raise ValueError("wire layout applies to cs16/cs8 only "
                             "(cf32 stays planar; see iq_interleave)")
        in_blks, out_blks = _IN_BLKS, _OUT_BLKS
        nchunk, rows = _NCHUNK, _ROWS
        out_dtype = jnp.float32
        kernel = _kernel
    elif out_format in ("cs16", "cs8"):
        in_blks, out_blks = _IN_BLKS_Q, _OUT_BLKS_Q
        nchunk, rows = _NCHUNK_Q, _ROWS_Q
        if wire:
            out_dtype = jnp.int32 if out_format == "cs16" else jnp.int16
        else:
            out_dtype = jnp.int16 if out_format == "cs16" else jnp.int8
        kernel = functools.partial(
            _kernel,
            qscale=quantize_scale(out_format),
            qmax=QMAX[out_format],
            wire=out_format if wire else None,
        )
        if field.shape[1] < in_blks * _BLK:  # caller can pre-pad for free
            field = jnp.pad(
                field, ((0, 0), (0, in_blks * _BLK - field.shape[1]))
            )
    else:
        raise ValueError(f"unknown out_format {out_format!r}")
    f3 = field.reshape(b, in_blks, _BLK)
    fa = f3[:, :out_blks]
    fb = f3[:, 1 : out_blks + 1]
    osc = jnp.asarray(_osc_blocked(in_blks))
    osc_a = osc[:, :out_blks]
    osc_b = osc[:, 1 : out_blks + 1]
    w_lo, w_hi = _band_matrices()

    if wire:
        out_specs = pl.BlockSpec((1, rows, _BLK), lambda c, bb: (bb, c, 0))
        out_shape = jax.ShapeDtypeStruct((b, out_blks, _BLK), out_dtype)
    else:
        out_specs = pl.BlockSpec(
            (1, 2, rows, _BLK), lambda c, bb: (bb, 0, c, 0)
        )
        out_shape = jax.ShapeDtypeStruct((b, 2, out_blks, _BLK), out_dtype)
    out = pl.pallas_call(
        kernel,
        grid=(nchunk, b),
        in_specs=[
            # whole (B, 2) phasor table in SMEM (a per-batch (1, 2) block is
            # not a legal TPU block shape); kernel indexes row program_id(1)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, _BLK), lambda c, bb: (bb, c, 0)),
            pl.BlockSpec((1, rows, _BLK), lambda c, bb: (bb, c, 0)),
            pl.BlockSpec((2, rows, _BLK), lambda c, bb: (0, c, 0)),
            pl.BlockSpec((2, rows, _BLK), lambda c, bb: (0, c, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda c, bb: (0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda c, bb: (0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(phasor, fa, fb, osc_a, osc_b, jnp.asarray(w_lo), jnp.asarray(w_hi))

    if wire:
        return out.reshape(b, out_blks * _BLK)
    return out.reshape(b, 2, out_blks * _BLK)
