"""Back-half write-gap experiments (VERDICT r2 item 5): variants of the
fused offset+FIR kernel measured head-to-head at B=384 cf32 on the real
chip, against the landed kernel.

The kernel's cost model (PERF.md): ~5.4 ms pure-write floor, ~9.5 ms
landed — the gap is the VPU modulate prologue (4 R-row multiply passes +
2 int8->f32 casts) and 4 HIGHEST matmuls that do not overlap the output
DMA. Variants attack the prologue and dispatch count:

  base      — the shipped kernel (ops/pallas/offset_fir.py)
  chunksN   — base on a finer grid (more, smaller blocks: better
              compute/DMA pipelining granularity)
  sharedmod — the b (lookahead) FIR operands derived in-kernel from the
              a operands (they overlap in R-1 rows): one modulate pass +
              one cast instead of two of each, plus a VMEM row-shift
  onedot    — the 4 matmuls fused into ONE MXU dispatch:
              [[Ua|Ub],[Wa|Wb]] (2R, 256) @ [[Wlo],[Whi]] (256, 128)
  combo     — sharedmod + onedot

Usage: python tools/fir_probe.py [--iters 30] [--batch 384]
Prints one JSON line per variant: {"variant", "ms", "max_err"}.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.ops.pallas.offset_fir import (  # noqa: E402
    _BLK,
    _IN_BLKS,
    _LEVEL_BIAS,
    _OUT_BLKS,
    _kernel as _base_kernel,
    _osc_blocked,
    offset_fir_fused,
)
from atsc_tpu.ops.rrc_filter import _band_matrices  # noqa: E402

HP = jax.lax.Precision.HIGHEST
F32 = jnp.float32


def _rotate_store(out_ref, fu, fw, pr, pi):
    out_ref[0, 0] = fu * pr - fw * pi
    out_ref[0, 1] = fu * pi + fw * pr


def _kernel_sharedmod(phasor_ref, fa_ref, fb_ref, osc_a_ref, osc_b_ref,
                      wlo_ref, whi_ref, out_ref, *, rows):
    bb = pl.program_id(1)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    xa = fa_ref[0].astype(F32) * 2.0 + _LEVEL_BIAS          # (R, 128)
    ua = xa * osc_a_ref[0]
    wa = xa * osc_a_ref[1]
    # b operands: rows [1, R) of the a products + one fresh last row
    xl = fb_ref[0, rows - 1 :].astype(F32) * 2.0 + _LEVEL_BIAS  # (1, 128)
    ul = xl * osc_b_ref[0, rows - 1 :]
    wl = xl * osc_b_ref[1, rows - 1 :]
    ub = jnp.concatenate([ua[1:], ul], axis=0)
    wb = jnp.concatenate([wa[1:], wl], axis=0)
    fu = jnp.dot(ua, wlo_ref[...], precision=HP, preferred_element_type=F32) \
        + jnp.dot(ub, whi_ref[...], precision=HP, preferred_element_type=F32)
    fw = jnp.dot(wa, wlo_ref[...], precision=HP, preferred_element_type=F32) \
        + jnp.dot(wb, whi_ref[...], precision=HP, preferred_element_type=F32)
    _rotate_store(out_ref, fu, fw, pr, pi)


def _kernel_onedot(phasor_ref, fa_ref, fb_ref, osc_a_ref, osc_b_ref,
                   w2_ref, out_ref, *, rows):
    bb = pl.program_id(1)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    xa = fa_ref[0].astype(F32) * 2.0 + _LEVEL_BIAS
    xb = fb_ref[0].astype(F32) * 2.0 + _LEVEL_BIAS
    ua = xa * osc_a_ref[0]
    wa = xa * osc_a_ref[1]
    ub = xb * osc_b_ref[0]
    wb = xb * osc_b_ref[1]
    v = jnp.concatenate([
        jnp.concatenate([ua, ub], axis=1),
        jnp.concatenate([wa, wb], axis=1),
    ], axis=0)                                              # (2R, 256)
    f = jnp.dot(v, w2_ref[...], precision=HP, preferred_element_type=F32)
    _rotate_store(out_ref, f[:rows], f[rows:], pr, pi)


def _kernel_combo(phasor_ref, fa_ref, fb_ref, osc_a_ref, osc_b_ref,
                  w2_ref, out_ref, *, rows):
    bb = pl.program_id(1)
    pr = phasor_ref[bb, 0]
    pi = phasor_ref[bb, 1]
    xa = fa_ref[0].astype(F32) * 2.0 + _LEVEL_BIAS
    ua = xa * osc_a_ref[0]
    wa = xa * osc_a_ref[1]
    xl = fb_ref[0, rows - 1 :].astype(F32) * 2.0 + _LEVEL_BIAS
    ul = xl * osc_b_ref[0, rows - 1 :]
    wl = xl * osc_b_ref[1, rows - 1 :]
    ub = jnp.concatenate([ua[1:], ul], axis=0)
    wb = jnp.concatenate([wa[1:], wl], axis=0)
    v = jnp.concatenate([
        jnp.concatenate([ua, ub], axis=1),
        jnp.concatenate([wa, wb], axis=1),
    ], axis=0)
    f = jnp.dot(v, w2_ref[...], precision=HP, preferred_element_type=F32)
    _rotate_store(out_ref, f[:rows], f[rows:], pr, pi)


_KERNELS = {
    "sharedmod": (_kernel_sharedmod, False),
    "onedot": (_kernel_onedot, True),
    "combo": (_kernel_combo, True),
}


@functools.partial(jax.jit, static_argnames=("variant", "nchunk", "interpret"))
def run_variant(field, phasor, variant, nchunk=5, interpret=False):
    b = field.shape[0]
    rows = _OUT_BLKS // nchunk
    f3 = field.reshape(b, _IN_BLKS, _BLK)
    fa = f3[:, :_OUT_BLKS]
    fb = f3[:, 1 : _OUT_BLKS + 1]
    osc = jnp.asarray(_osc_blocked(_IN_BLKS))
    osc_a = osc[:, :_OUT_BLKS]
    osc_b = osc[:, 1 : _OUT_BLKS + 1]
    w_lo, w_hi = _band_matrices()

    if variant == "base":
        kernel = _base_kernel
        weights = (jnp.asarray(w_lo), jnp.asarray(w_hi))
        wspecs = [pl.BlockSpec((_BLK, _BLK), lambda c, bb: (0, 0))] * 2
    else:
        kfn, single = _KERNELS[variant]
        kernel = functools.partial(kfn, rows=rows)
        if single:
            weights = (jnp.concatenate(
                [jnp.asarray(w_lo), jnp.asarray(w_hi)], axis=0),)
            wspecs = [pl.BlockSpec((2 * _BLK, _BLK), lambda c, bb: (0, 0))]
        else:
            weights = (jnp.asarray(w_lo), jnp.asarray(w_hi))
            wspecs = [pl.BlockSpec((_BLK, _BLK), lambda c, bb: (0, 0))] * 2

    out = pl.pallas_call(
        kernel,
        grid=(nchunk, b),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, rows, _BLK), lambda c, bb: (bb, c, 0)),
            pl.BlockSpec((1, rows, _BLK), lambda c, bb: (bb, c, 0)),
            pl.BlockSpec((2, rows, _BLK), lambda c, bb: (0, c, 0)),
            pl.BlockSpec((2, rows, _BLK), lambda c, bb: (0, c, 0)),
            *wspecs,
        ],
        out_specs=pl.BlockSpec(
            (1, 2, rows, _BLK), lambda c, bb: (bb, 0, c, 0)),
        out_shape=jax.ShapeDtypeStruct((b, 2, _OUT_BLKS, _BLK), F32),
        interpret=interpret,
    )(phasor, fa, fb, osc_a, osc_b, *weights)
    return out.reshape(b, 2, _OUT_BLKS * _BLK)


def _bar(x):
    float(jnp.sum(x.astype(jnp.float32)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode correctness check only")
    args = ap.parse_args()
    b = args.batch

    rng = np.random.default_rng(0)
    field = jnp.asarray(
        rng.integers(0, 8, size=(b, P.PADDED_SYMBOLS), dtype=np.int8))
    phasor = jnp.tile(jnp.asarray([[0.8, 0.6]], F32), (b, 1))

    want = None

    def probe(name, fn):
        nonlocal want
        try:
            out = fn()
            _bar(out)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = fn()
            _bar(out)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            if want is None:
                want = np.asarray(out[:2])
                err = 0.0
            else:
                err = float(np.abs(np.asarray(out[:2]) - want).max())
            print(json.dumps({"variant": name, "ms": round(ms, 2),
                              "max_err": err}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": repr(e)[:300]}), flush=True)

    ip = args.interpret
    probe("base", lambda: offset_fir_fused(field, phasor, interpret=ip))
    for nch in (15, 17):
        probe(f"base_chunks{nch}",
              lambda n=nch: run_variant(field, phasor, "base", n,
                                        interpret=ip))
    probe("onedot",
          lambda: run_variant(field, phasor, "onedot", interpret=ip))
    probe("sharedmod",
          lambda: run_variant(field, phasor, "sharedmod", interpret=ip))
    probe("combo",
          lambda: run_variant(field, phasor, "combo", interpret=ip))
    for nch in (15,):
        probe(f"combo_chunks{nch}",
              lambda n=nch: run_variant(field, phasor, "combo", n,
                                        interpret=ip))


if __name__ == "__main__":
    main()
