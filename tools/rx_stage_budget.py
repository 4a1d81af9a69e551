"""Receive-path marginal-cost ablation on the real chip (the RX twin of
tools/stage_budget.py): equalizer-step internals and decoder-step stages,
timed at a given batch with on-device inputs (no H2D in the loop).

Usage: python tools/rx_stage_budget.py [--batch 64] [--iters 20]
Prints one JSON line per probe.
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


def _bar(x):
    float(jnp.sum(x.astype(jnp.float32)))


def _time(fn, iters):
    out = fn()
    _bar(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    _bar(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()
    b = args.batch

    from atsc_tpu.models.receiver import (
        _DEV_MARGIN,
        _N,
        _device_eq_step,
        _eq_step_fn,
        _osc_planar,
        EQ_PROFILES,
    )

    rng = np.random.default_rng(0)
    w = _N + 2 * _DEV_MARGIN
    win = jnp.asarray(rng.normal(size=(b, 2, w)).astype(np.float32))
    osc = jnp.asarray(_osc_planar(-_DEV_MARGIN, _N + _DEV_MARGIN, 0))
    _bar(win)

    # -- equalizer tiers + internal ablations ---------------------------
    for prof in ("fast", "exact"):
        ms = _time(lambda p=prof: _device_eq_step(False, profile=p)(win, osc),
                   args.iters)
        print(json.dumps({"probe": f"eq_{prof}", "ms": round(ms, 2)}),
              flush=True)

    # derotate-only: the elementwise front of the eq step
    @jax.jit
    def derot(win, osc):
        wr = win[:, 0]
        wi = win[:, 1]
        cr, ci = osc[0], osc[1]
        return jnp.stack([wr * cr + wi * ci, wi * cr - wr * ci], axis=1)

    ms = _time(lambda: derot(win, osc), args.iters)
    print(json.dumps({"probe": "eq_derotate_only", "ms": round(ms, 2)}),
          flush=True)

    # fir with fewer bands: patch the fast profile's tap support down
    from atsc_tpu.ops.rrc_filter import banded_fir_wl
    from atsc_tpu.models.receiver import _wl_eq_taps

    for kk in (63, 128):
        p_t, q_t = _wl_eq_taps(kk)

        @functools.partial(jax.jit, static_argnames=())
        def eq_k(win, osc, p_t=p_t, q_t=q_t, kk=kk):
            wr = win[:, 0]
            wi = win[:, 1]
            cr, ci = osc[0], osc[1]
            ur = wr * cr + wi * ci
            ui = wi * cr - wr * ci
            start = _DEV_MARGIN - kk
            ur = jax.lax.slice_in_dim(ur, start, ur.shape[-1], axis=-1)
            ui = jax.lax.slice_in_dim(ui, start, ui.shape[-1], axis=-1)
            lev = banded_fir_wl(ur, ui, p_t, q_t, _N,
                                precision=jax.lax.Precision.DEFAULT)
            from atsc_tpu.ops.slicer import slice_symbols
            return slice_symbols(lev)

        ms = _time(lambda f=eq_k: f(win, osc), args.iters)
        nb = 2 * kk // 128 + 1
        print(json.dumps({"probe": f"eq_K{kk}_bands{nb}", "ms": round(ms, 2)}),
              flush=True)

    # -- decoder stages --------------------------------------------------
    from atsc_tpu.models.decoder import init_decoder_state
    from atsc_tpu.ops.decode import (
        decommutate_field,
        deinterleave_field,
        enc_major_to_round_major,
        trellis_decode_field,
    )
    from atsc_tpu.ops.rs_decode import syndrome_field

    field = jnp.asarray(
        rng.integers(0, 8, size=(b, P.SYMBOLS_PER_FIELD), dtype=np.int8))
    st = init_decoder_state(b)

    @functools.partial(jax.jit, static_argnames=("upto",))
    def dec_partial(state, field, upto):
        syms = decommutate_field(field)
        if upto == "decommutate":
            return syms
        bytes_enc, z2 = trellis_decode_field(syms, state.z2_prev)
        if upto == "trellis":
            return bytes_enc
        cur_il = enc_major_to_round_major(bytes_enc)
        if upto == "reorder":
            return cur_il
        rs = deinterleave_field(cur_il, state.prev_il)
        if upto == "deinterleave":
            return rs
        cw = rs.reshape(rs.shape[0], P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
        return syndrome_field(cw)

    prev = 0.0
    for stage in ("decommutate", "trellis", "reorder", "deinterleave",
                  "syndromes"):
        ms = _time(lambda s=stage: dec_partial(st, field, s), args.iters)
        print(json.dumps({"probe": f"dec_{stage}",
                          "cumulative_ms": round(ms, 2),
                          "marginal_ms": round(ms - prev, 2)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
