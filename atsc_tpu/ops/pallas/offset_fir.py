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

Per grid step (one output chunk of one channel x IQ component) the banded
FIR is two fp32 MXU matmuls on a (408, 128)-row operand:

    Out[j] = Mod[j] @ W_lo + Mod[j+1] @ W_hi

The grid is (chunks, B, 2) with the chunk axis OUTERMOST so the per-chunk
oscillator blocks stay VMEM-resident across all (channel, component) steps
(measured on v5e: this chunking pipelines the output DMA against the
VPU modulate + MXU passes noticeably better than one whole-channel step —
the kernel is within ~1.8x of the chip's measured Pallas HBM-write floor
for its output; the remainder is the fp32 (HIGHEST) matmul passes, which
the 5e-6 golden bound requires — the oscillator's float32-argument quirk
rules out the bf16-exact "rotate the taps" formulation since the table is
NOT e^{j*theta*n}, and 3-pass bf16 (HIGH) misses the bound at 1.8e-5).

The per-field phase-continuity phasor rides in SMEM; the rotation
coefficients are scalar-selected per component (a, b) so only two vector
multiplies touch the oscillator per element.
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
from atsc_tpu.ops.rrc_filter import _band_matrices

_BLK = 128
_IN_BLKS = P.PADDED_SYMBOLS // _BLK   # 2041 (exact)
_OUT_BLKS = P.PADDED_OUT // _BLK      # 2040 (261,120 outputs >= 260,416)
_NCHUNK = 5
_ROWS = _OUT_BLKS // _NCHUNK          # 408 rows (divisible by 8)

_LEVEL_BIAS = float(P.PILOT_OFFSET - 7.0)  # level = 2v - 7 + 1.25


@functools.lru_cache(maxsize=1)
def _osc_blocked() -> np.ndarray:
    re, im = _osc_planar()
    return np.stack([re, im]).reshape(2, _IN_BLKS, _BLK)


def _kernel(phasor_ref, fa_ref, fb_ref, osc_a_ref, osc_b_ref,
            wlo_ref, whi_ref, out_ref):
    # fa/fb: int8 field rows [cR, cR+R) and [cR+1, cR+R+1) of this channel
    # (view B is the one-row-shifted stream for the FIR's +128-sample
    # lookahead operand); osc_a/osc_b: matching oscillator rows, resident
    # across the inner (channel, component) grid axes.
    bb = pl.program_id(1)
    comp = pl.program_id(2)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    is0 = comp == 0
    a = jax.lax.select(is0, pr, pi)
    b = jax.lax.select(is0, -pi, pr)
    xa = fa_ref[0].astype(jnp.float32) * 2.0 + _LEVEL_BIAS
    xb = fb_ref[0].astype(jnp.float32) * 2.0 + _LEVEL_BIAS
    mod_a = xa * (osc_a_ref[0] * a + osc_a_ref[1] * b)
    mod_b = xb * (osc_b_ref[0] * a + osc_b_ref[1] * b)

    # HIGHEST: the MXU's default bf16 input rounding costs ~3e-3 absolute
    # error on +/-8-level symbols; fp32 passes keep us within the 5e-6
    # golden bound (matches the unfused rrc_filter op's precision).
    hp = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    out_ref[0, 0, :, :] = jnp.dot(
        mod_a, wlo_ref[...], precision=hp, preferred_element_type=f32
    ) + jnp.dot(
        mod_b, whi_ref[...], precision=hp, preferred_element_type=f32
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def offset_fir_fused(
    field: jnp.ndarray, phasor: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """field: (B, 261248) int8 symbol values; phasor: (B, 2) float32.

    Returns (B, 2, 261120) planar float32 IQ (level map + pilot offset +
    RRC fused); samples [0, 260416) are the field's valid output.
    """
    b = field.shape[0]
    f3 = field.reshape(b, _IN_BLKS, _BLK)
    fa = f3[:, :_OUT_BLKS]
    fb = f3[:, 1 : _OUT_BLKS + 1]
    osc = jnp.asarray(_osc_blocked())
    osc_a = osc[:, :_OUT_BLKS]
    osc_b = osc[:, 1 : _OUT_BLKS + 1]
    w_lo, w_hi = _band_matrices()

    out = pl.pallas_call(
        _kernel,
        grid=(_NCHUNK, b, 2),
        in_specs=[
            # whole (B, 2) phasor table in SMEM (a per-batch (1, 2) block is
            # not a legal TPU block shape); kernel indexes row program_id(1)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, _BLK), lambda c, bb, cc: (bb, c, 0)),
            pl.BlockSpec((1, _ROWS, _BLK), lambda c, bb, cc: (bb, c, 0)),
            pl.BlockSpec((2, _ROWS, _BLK), lambda c, bb, cc: (0, c, 0)),
            pl.BlockSpec((2, _ROWS, _BLK), lambda c, bb, cc: (0, c, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda c, bb, cc: (0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda c, bb, cc: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _ROWS, _BLK), lambda c, bb, cc: (bb, cc, c, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, _OUT_BLKS, _BLK), jnp.float32),
        interpret=interpret,
    )(phasor, fa, fb, osc_a, osc_b, jnp.asarray(w_lo), jnp.asarray(w_hi))

    return out.reshape(b, 2, P.PADDED_OUT)
