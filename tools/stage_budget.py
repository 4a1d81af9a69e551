"""Reproducible per-stage marginal-cost ablation of the encode pipeline on
the real chip (the source of PERF.md's stage-budget table).

Builds a family of jitted partial pipelines — each one stage longer — and
reports each stage's marginal ms at a given batch. Marginal cost inside
the fused whole is the honest metric on TPU: XLA fuses across stage
boundaries, so standalone stage timings double-count materialization.

Usage: python tools/stage_budget.py [--batch 384] [--iters 30]
Prints one JSON line per stage.
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

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import init_state  # noqa: E402
from atsc_tpu.ops import (  # noqa: E402
    randomize_field,
    rs_encode_field,
    trellis_encode_field,
)
from atsc_tpu.ops.assemble import assemble_field_structured  # noqa: E402
from atsc_tpu.ops.interleave import interleave_field_enc_major  # noqa: E402


@functools.partial(jax.jit, static_argnames=("upto", "out_format"))
def partial_pipeline(state, ts, upto, out_format="cf32"):
    """Stages in encode_field order; `upto` names the last stage run.
    Returns an array whose value depends on every stage up to `upto`."""
    rand = randomize_field(ts)
    if upto == "randomize":
        return rand
    rs = rs_encode_field(rand)
    if upto == "rs":
        return rs
    rs_flat = rs.reshape(rs.shape[0], -1)
    il = interleave_field_enc_major(rs_flat, state.prev_rs)
    il = jax.lax.optimization_barrier(il)
    if upto == "interleave":
        return il
    symbols, d, d1, d2 = trellis_encode_field(
        il, state.trellis_d, state.trellis_d1, state.trellis_d2
    )
    symbols = jax.lax.optimization_barrier(symbols)
    if upto == "trellis":
        return symbols
    from atsc_tpu.ops.pallas.offset_fir import (
        QUANT_FIELD_LEN,
        offset_fir_fused,
    )

    pad_to = P.PADDED_SYMBOLS if out_format == "cf32" else QUANT_FIELD_LEN
    field, _ = assemble_field_structured(
        symbols, state.parity, state.saved, pad_to=pad_to
    )
    if upto == "assemble":
        return field
    return offset_fir_fused(field, state.phasor, out_format=out_format)


STAGES = ("randomize", "rs", "interleave", "trellis", "assemble", "fused_fir")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--format", default="cf32",
                    choices=("cf32", "cs16", "cs8"))
    args = ap.parse_args()
    b = args.batch

    rng = np.random.default_rng(0)
    ts = jnp.asarray(
        rng.integers(0, 256, size=(b, P.FIELD_TS_BYTES), dtype=np.uint8))
    state = init_state(b)

    prev = 0.0
    for stage in STAGES:
        out = partial_pipeline(state, ts, stage, args.format)
        float(jnp.sum(out.astype(jnp.float32)))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = partial_pipeline(state, ts, stage, args.format)
        float(jnp.sum(out.astype(jnp.float32)))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({
            "upto": stage, "cumulative_ms": round(ms, 2),
            "marginal_ms": round(ms - prev, 2),
        }), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
