"""Fused level-map + pilot-offset + RRC-FIR Pallas kernel.

Replaces the back half of the pipeline (reference signal.h level map +
offset.h AVX complex multiply + filter.h 112-tap FIR) with one pass: the
int8 symbol-value field is read from HBM once (a quarter of the float
field's bytes), mapped to levels and modulated onto the oscillator in VMEM,
pushed through the banded-matmul FIR on the MXU, and written out as planar
float32 IQ — no intermediate field ever touches HBM, no padding copy on the
way in (261,248 = 2041 x 128 exactly), and no slice/transpose pass on the
way out (the (B, 2, 2035, 128) result IS the (B, 2, 260480) padded planar
output, valid through sample 260,416).

Per grid step (one channel) the banded FIR is two fp32 MXU matmuls per
component on a (2035, 128)-row operand:

    Out[j] = Mod[j] @ W_lo + Mod[j+1] @ W_hi     j = 0..2034

The oscillator table stays VMEM-resident across the whole grid
(constant index map); the per-field phase continuity phasor rides in SMEM.

At B=128 this kernel is within ~1.4x of the chip's HBM write floor for its
268 MB output; fp32 (HIGHEST) matmuls keep the result inside the 5e-6
golden bound (the oscillator's float32-argument quirk rules out the
bf16-exact "rotate the taps" formulation: the table is NOT e^{j*theta*n}).
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
_OUT_BLKS = P.PADDED_OUT // _BLK      # 2035 (260,480 outputs >= 260,416)

_LEVEL_BIAS = float(P.PILOT_OFFSET - 7.0)  # level = 2v - 7 + 1.25


@functools.lru_cache(maxsize=1)
def _osc_blocked() -> np.ndarray:
    re, im = _osc_planar()
    return np.stack([re, im]).reshape(2, _IN_BLKS, _BLK)


def _kernel(phasor_ref, field_ref, osc_ref, wlo_ref, whi_ref, out_ref):
    # grid = (B, 2): one channel x one IQ component per step. The split
    # component axis halves the per-step output block (1 MB), which
    # pipelines the output DMA noticeably better than a fused 2 MB write
    # (~20% faster end to end, bit-identical result).
    # field_ref: (1, IN_BLKS, BLK) int8 — whole channel; osc_ref:
    # (2, IN_BLKS, BLK) — resident across the grid; phasor_ref: (B, 2)
    # SMEM, indexed by program_id(0); out_ref: (1, 1, OUT_BLKS, BLK).
    bb = pl.program_id(0)
    comp = pl.program_id(1)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    x = field_ref[0].astype(jnp.int32).astype(jnp.float32) * 2.0 + _LEVEL_BIAS
    tr = osc_ref[0]
    ti = osc_ref[1]
    osc_rot = jnp.where(comp == 0, tr * pr - ti * pi, tr * pi + ti * pr)
    mod = x * osc_rot

    # HIGHEST: the MXU's default bf16 input rounding costs ~3e-3 absolute
    # error on +/-8-level symbols; fp32 passes keep us within the 5e-6
    # golden bound (matches the unfused rrc_filter op's precision).
    hp = jax.lax.Precision.HIGHEST
    f32 = jnp.float32
    out_ref[0, 0, :, :] = jnp.dot(
        mod[:_OUT_BLKS], wlo_ref[...], precision=hp, preferred_element_type=f32
    ) + jnp.dot(
        mod[1 : _OUT_BLKS + 1], whi_ref[...], precision=hp,
        preferred_element_type=f32,
    )


@functools.partial(jax.jit, static_argnames=("interpret",))
def offset_fir_fused(
    field: jnp.ndarray, phasor: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """field: (B, 261248) int8 symbol values; phasor: (B, 2) float32.

    Returns (B, 2, 260480) planar float32 IQ (level map + pilot offset +
    RRC fused); samples [0, 260416) are the field's valid output.
    """
    b = field.shape[0]
    f3 = field.reshape(b, _IN_BLKS, _BLK)
    w_lo, w_hi = _band_matrices()

    out = pl.pallas_call(
        _kernel,
        grid=(b, 2),
        in_specs=[
            # whole (B, 2) phasor table in SMEM (a per-batch (1, 2) block is
            # not a legal TPU block shape); kernel indexes row program_id(0)
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _IN_BLKS, _BLK), lambda bb, c: (bb, 0, 0)),
            pl.BlockSpec((2, _IN_BLKS, _BLK), lambda bb, c: (0, 0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda bb, c: (0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda bb, c: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, _OUT_BLKS, _BLK), lambda bb, c: (bb, c, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, 2, _OUT_BLKS, _BLK), jnp.float32),
        interpret=interpret,
    )(phasor, f3, jnp.asarray(_osc_blocked()), jnp.asarray(w_lo), jnp.asarray(w_hi))

    return out.reshape(b, 2, P.PADDED_OUT)
