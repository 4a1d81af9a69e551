"""Prototype: the 12-way trellis encoder as ONE Pallas kernel.

ops/trellis.py runs as XLA ops: bit-plane algebra + 3 blocked-TRIU MXU
scans. Its 3.4 ms marginal cost at B=384 (tools/stage_budget.py) is ~4x
the 0.9 ms read+write traffic floor (25 MB in, 99 MB out) — the gap is
HBM intermediates between the XLA passes (bit planes, bf16 dot operands/
results). This kernel keeps everything per-channel-resident in VMEM:
one grid step = `chans` channels; loads (chans, 12, 5504) padded bytes,
does all plane algebra + both dots in VMEM, and writes int8 symbols.

Two output layouts probed:
  interleaved — the kernel emits stream-order symbols (12, 22016) via an
                in-VMEM (12, 5504, 4) -> (12, 22016) minor reshape
                (lane interleave; Mosaic relayout quality unknown)
  planemajor  — the kernel emits (12, 4, 5504) plane-major and XLA does
                transpose+reshape, which should fuse into the assemble
                relayout that follows anyway

Validated against ops/trellis.py in interpret mode, then timed on chip.

Usage: python tools/trellis_fuse_probe.py [--interpret] [--batch 384]
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
from atsc_tpu.ops.trellis import _TRIU_STRICT, trellis_encode_field  # noqa: E402

_BLK = 128
_NB = P.TRELLIS_BYTES_PER_ENCODER            # 5382
_QB = -(-_NB // _BLK)                        # 43
_NBP = _QB * _BLK                            # 5504 padded bytes
_NSP = _NBP * 4                              # 22016 padded symbols


def _kernel(il_ref, carry_ref, triu_ref, triu32_ref, sym_ref, *,
            chans, interleaved):
    c12 = chans * 12
    x = il_ref[...].reshape(c12, _NBP).astype(jnp.int32)

    x2 = [(x >> k) & 1 for k in (7, 5, 3, 1)]
    x1 = [(x >> k) & 1 for k in (6, 4, 2, 0)]
    s2 = x2[0] ^ x2[1] ^ x2[2] ^ x2[3]
    su = x1[0] ^ x1[2]
    sv = x1[1] ^ x1[3]

    # one MXU pass for all three in-block exclusive prefixes
    s_all = jnp.concatenate([s2, su, sv], axis=0)           # (3*c12, 5504)
    sb = s_all.reshape(3 * c12 * _QB, _BLK).astype(jnp.bfloat16)
    excl_in = jnp.dot(sb, triu_ref[...],
                      preferred_element_type=jnp.float32)   # ints <= 127
    # (bf16 operands, f32 acc: Mosaic requires 32-bit matmul accumulators)

    # cross-block exclusive carry: block totals via an all-ones lane
    # reduction (sum of s over the block = in-block INclusive total),
    # f32 TRIU dot over blocks (prefix sums <= 5504 need f32), parity.
    # (Formulated with matmuls/reductions only — lane indexing like
    # x[..., -1] lowers to dynamic_slice, which Mosaic rejects.)
    e3 = excl_in.reshape(3 * c12, _QB, _BLK)
    tot = jnp.sum(sb.astype(jnp.float32).reshape(3 * c12, _QB, _BLK),
                  axis=-1)                                   # (3c12, QB)
    zpad = jnp.zeros((3 * c12, _BLK - _QB), jnp.float32)
    totp = jnp.concatenate([tot, zpad], axis=-1)
    carry = jnp.dot(totp, triu32_ref[...],
                    preferred_element_type=jnp.float32)      # (3c12, 128)
    carry_par = jax.lax.slice_in_dim(
        carry.astype(jnp.int32), 0, _QB, axis=1) & 1

    e_all = (e3.astype(jnp.int32) + carry_par[..., None]) & 1
    e_all = e_all.reshape(3 * c12, _NBP)
    e2 = jax.lax.slice_in_dim(e_all, 0, c12, axis=0)
    eu = jax.lax.slice_in_dim(e_all, c12, 2 * c12, axis=0)
    ev = jax.lax.slice_in_dim(e_all, 2 * c12, 3 * c12, axis=0)

    # per-(channel, encoder) carried state, pre-broadcast over 128 lanes
    cref = carry_ref[...].astype(jnp.int32)    # (3, chans, 12, 128)
    call = cref.reshape(3 * c12, _BLK)
    dc = jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(call, 0, c12, axis=0), 0, 1, axis=1)
    d1c = jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(call, c12, 2 * c12, axis=0), 0, 1, axis=1)
    d2c = jax.lax.slice_in_dim(
        jax.lax.slice_in_dim(call, 2 * c12, 3 * c12, axis=0), 0, 1, axis=1)

    p2 = [x2[0], x2[0] ^ x2[1], x2[0] ^ x2[1] ^ x2[2], s2]
    z2 = [e2 ^ pp ^ dc for pp in p2]
    z0 = [
        ev ^ d1c,
        eu ^ x1[0] ^ d2c,
        ev ^ x1[1] ^ d1c,
        eu ^ x1[0] ^ x1[2] ^ d2c,
    ]
    planes = [
        (z2[p] * 4 + x1[p] * 2 + z0[p]).astype(jnp.int8) for p in range(4)
    ]
    if interleaved:
        sym = jnp.stack(planes, axis=-1).reshape(c12, _NSP)
        sym_ref[...] = sym.reshape(chans, 12, _NSP)
    else:
        sym = jnp.concatenate(planes, axis=0).reshape(4, c12, _NBP)
        sym_ref[...] = sym.transpose(1, 0, 2).reshape(chans, 12, 4, _NBP)


@functools.partial(
    jax.jit, static_argnames=("chans", "interleaved", "interpret"))
def trellis_fused(il_pad, d, d1, d2, chans=4, interleaved=True,
                  interpret=False):
    """il_pad: (B, 12, 5504) uint8 (bytes >= 5382 are don't-care);
    d/d1/d2: (B, 12) int32. Returns symbols (B, 12, 22016) int8
    stream-order (interleaved=True) or (B, 12, 4, 5504) plane-major."""
    b = il_pad.shape[0]
    carries = jnp.stack([d, d1, d2]).astype(jnp.int8)        # (3, B, 12)
    carries = jnp.broadcast_to(carries[..., None], (3, b, 12, _BLK))

    if interleaved:
        out_shape = jax.ShapeDtypeStruct((b, 12, _NSP), jnp.int8)
        out_spec = pl.BlockSpec((chans, 12, _NSP), lambda i: (i, 0, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((b, 12, 4, _NBP), jnp.int8)
        out_spec = pl.BlockSpec((chans, 12, 4, _NBP), lambda i: (i, 0, 0, 0))

    kernel = functools.partial(_kernel, chans=chans, interleaved=interleaved)
    return pl.pallas_call(
        kernel,
        grid=(b // chans,),
        in_specs=[
            pl.BlockSpec((chans, 12, _NBP), lambda i: (i, 0, 0)),
            pl.BlockSpec((3, chans, 12, _BLK), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda i: (0, 0)),
            pl.BlockSpec((_BLK, _BLK), lambda i: (0, 0)),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )(il_pad, carries,
      jnp.asarray(_TRIU_STRICT, jnp.bfloat16),
      jnp.asarray(_TRIU_STRICT, jnp.float32))


def _to_stream(sym, interleaved):
    """Either kernel layout -> (B, 12, 21528) stream order (XLA side)."""
    if interleaved:
        return sym[..., : 4 * _NB]
    b = sym.shape[0]
    return sym.transpose(0, 1, 3, 2).reshape(b, 12, _NSP)[..., : 4 * _NB]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--chans", type=int, default=4)
    args = ap.parse_args()
    b = args.batch

    rng = np.random.default_rng(0)
    il = rng.integers(0, 256, size=(b, 12, _NB), dtype=np.uint8)
    il_pad = np.zeros((b, 12, _NBP), np.uint8)
    il_pad[..., :_NB] = il
    d = jnp.asarray(rng.integers(0, 2, size=(b, 12), dtype=np.int32))
    d1 = jnp.asarray(rng.integers(0, 2, size=(b, 12), dtype=np.int32))
    d2 = jnp.asarray(rng.integers(0, 2, size=(b, 12), dtype=np.int32))
    ilj = jnp.asarray(il)
    ilpj = jnp.asarray(il_pad)

    want, wd, wd1, wd2 = jax.jit(trellis_encode_field)(ilj, d, d1, d2)
    want = np.asarray(want)

    def bar(x):
        float(jnp.sum(x.astype(jnp.float32)))

    for layout in (True, False):
        name = "interleaved" if layout else "planemajor"
        try:
            stream = jax.jit(
                lambda a, x, y, z, lay=layout: _to_stream(
                    trellis_fused(a, x, y, z, chans=args.chans,
                                  interleaved=lay,
                                  interpret=args.interpret), lay))
            got = stream(ilpj, d, d1, d2)
            ok = bool((np.asarray(got) == want).all())
            bar(got)
            t0 = time.perf_counter()
            for _ in range(args.iters):
                got = stream(ilpj, d, d1, d2)
            bar(got)
            ms = (time.perf_counter() - t0) / args.iters * 1e3
            print(json.dumps({"layout": name, "chans": args.chans,
                              "ms_to_stream": round(ms, 2),
                              "bit_exact": ok}), flush=True)
        except Exception as e:
            print(json.dumps({"layout": name,
                              "error": repr(e)[:400]}), flush=True)

    # reference op timing for the same comparison (includes its transpose-
    # free enc-major input path, as used by the encoder)
    ref = jax.jit(lambda a, x, y, z: trellis_encode_field(a, x, y, z)[0])
    out = ref(ilj, d, d1, d2)
    bar(out)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = ref(ilj, d, d1, d2)
    bar(out)
    print(json.dumps({
        "layout": "xla_reference",
        "ms_to_stream": round((time.perf_counter() - t0) / args.iters * 1e3, 2),
    }), flush=True)


if __name__ == "__main__":
    main()
