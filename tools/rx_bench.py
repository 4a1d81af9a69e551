"""Receive-path throughput measurement on the real chip.

Times the two jitted device cores (widely-linear equalizer step,
symbol-field decoder step) and the composed host-side IqReceiver.push
loop, at a given channel batch. Prints one JSON line per probe with
fields/s and the real-time channel count (41.327 fields/s/channel).

Timing rule (PERF.md): value-fetch barrier via float(jnp.sum(...)) —
block_until_ready returns early over the axon tunnel.

Usage:
    python tools/rx_bench.py [--batch 64] [--iters 10] [--mode hard]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax.numpy as jnp  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import Encoder, iq_to_complex  # noqa: E402

FIELD_RATE = P.SAMPLE_RATE / P.SYMBOLS_PER_FIELD  # 41.327 fields/s


def _report(name: str, batch: int, dt: float, iters: int) -> None:
    per_step = dt / iters
    fps = batch / per_step
    print(json.dumps({
        "probe": name, "batch": batch, "ms_per_step": round(per_step * 1e3, 3),
        "fields_per_s": round(fps, 1),
        "realtime_channels": round(fps / FIELD_RATE, 1),
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--fields", type=int, default=3)
    ap.add_argument("--mode", default="hard", choices=("hard", "soft"))
    ap.add_argument("--chunks", type=int, default=1,
                    help="soft mode: chunk-parallel Viterbi (ops/viterbi.py)")
    ap.add_argument("--eq-profile", default="auto",
                    choices=("auto", "exact", "fast"),
                    help="ZF equalizer tier (models/receiver.py EQ_PROFILES)")
    ap.add_argument("--wire", default="cf32", choices=("cf32", "cs16", "cs8"),
                    help="input wire format for the e2e probe (quantized "
                         "formats upload integer codes: 2-4x less H2D)")
    args = ap.parse_args()
    b = args.batch

    rng = np.random.default_rng(3)
    ts = rng.integers(0, 256, size=(args.fields, 1, P.FIELD_TS_BYTES),
                      dtype=np.uint8)
    ts[..., ::188] = 0x47
    enc = Encoder(batch=1, donate=False)
    iq1 = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k])))
         for k in range(args.fields)], axis=-1)
    iq = np.broadcast_to(iq1, (b, iq1.shape[1])).copy()

    # -- probe 1: device equalizer step alone (one field window; the
    #    production dispatch — fused Pallas kernel on TPU backends) ------
    from atsc_tpu.models.receiver import (
        IqReceiver, _device_eq_step, device_eq_step, eq_window_bounds,
        field_window,
    )
    soft = args.mode == "soft"
    lo_off, wlen = eq_window_bounds(args.eq_profile)
    win, osc = field_window(iq, 0, margin=-lo_off, length=wlen)
    winj, oscj = jnp.asarray(win), jnp.asarray(osc)
    step = device_eq_step(soft, profile=args.eq_profile)
    float(jnp.sum(step(winj, oscj).astype(jnp.float32)))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(winj, oscj)
    float(jnp.sum(out.astype(jnp.float32)))
    _report(f"equalizer_step_{args.mode}_{args.eq_profile}", b,
            time.perf_counter() - t0, args.iters)
    if args.eq_profile == "auto":
        # cross-check the production tier against exact on-device:
        # identical hard decisions expected on clean loopback signal
        wx, ox = field_window(iq, 0)
        he = _device_eq_step(False, profile="exact")(
            jnp.asarray(wx), jnp.asarray(ox))
        hf = step(winj, oscj) if not soft else device_eq_step(
            False, profile=args.eq_profile)(winj, oscj)
        mism = int(jnp.sum((he != hf).astype(jnp.int32)))
        print(json.dumps({"probe": "eq_fast_vs_exact_symbol_mismatches",
                          "batch": b, "count": mism}), flush=True)

    # -- probe 1b: adaptive equalizer field step (RLS update + solve +
    #    apply), plain and with the decision-directed second pass --------
    from atsc_tpu.ops.adaptive_eq import AdaptiveEqualizer
    for dd in (False, True):
        eq = AdaptiveEqualizer(batch=b, decision_directed=dd)
        out = eq.process_field(win, osc, 0, soft=soft)  # compile+warm
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = eq.process_field(win, osc, 0, soft=soft)
        float(np.sum(out.astype(np.float32)))
        _report(f"adaptive_eq_step{'_dd' if dd else ''}", b,
                time.perf_counter() - t0, args.iters)

    # -- probe 2: decoder device core (decommutate+trellis+deinterleave
    #    +syndromes) ------------------------------------------------------
    from atsc_tpu.models.decoder import Decoder, SoftDecoder
    dec = (SoftDecoder(batch=b, viterbi_chunks=args.chunks) if soft
           else Decoder(batch=b))
    field = np.asarray(step(winj, oscj))
    fj = jnp.asarray(field)
    st, cw, syn = dec._step(dec._state, fj)
    float(jnp.sum(syn.astype(jnp.float32)))  # compile+warm
    t0 = time.perf_counter()
    for _ in range(args.iters):
        st, cw, syn = dec._step(dec._state, fj)
    float(jnp.sum(syn.astype(jnp.float32)))
    suffix = f"_c{args.chunks}" if soft and args.chunks > 1 else ""
    _report(f"decoder_step_{args.mode}{suffix}", b,
            time.perf_counter() - t0, args.iters)

    # -- probe 3: composed IqReceiver.push (host buffer management, window
    #    assembly, H2D, device steps, RS host check, derandomize) --------
    def make_rx():
        return IqReceiver(batch=b, trellis=args.mode, wire_format=args.wire,
                          eq_profile=args.eq_profile)

    if args.wire == "cf32":
        payload = iq
        push = lambda rx, x: rx.push(x)  # noqa: E731
    else:
        from atsc_tpu.ops.quantize import QMAX, quantize_scale
        s = quantize_scale(args.wire)
        codes = np.stack([iq.real, iq.imag], axis=-1) * s
        payload = np.clip(np.round(codes), -QMAX[args.wire],
                          QMAX[args.wire]).astype(
            np.int16 if args.wire == "cs16" else np.int8)
        push = lambda rx, x: rx.push_codes(x)  # noqa: E731
    warm = make_rx()
    push(warm, payload)  # warm all jits + prime state
    rx2 = make_rx()
    n_fields = args.fields
    t0 = time.perf_counter()
    got = push(rx2, payload) + rx2.flush()
    dt = time.perf_counter() - t0
    assert len(got) == n_fields - 1
    _report(f"iq_receiver_e2e_{args.mode}_{args.wire}", b, dt, n_fields)


if __name__ == "__main__":
    main()
