"""Multi-host pod-slice decode driver — the receive twin of
tools/distributed_encode.py (SURVEY.md §5.8: the distributed runtime the
single-process reference never had).

Every host runs THIS script with the same arguments plus its own
--process-id; `jax.distributed` wires the processes into one runtime and
the global channel mesh spans every chip in the slice. Each host reads
the IQ captures and writes the TS for exactly the channels its chips own
(`local_channel_slice`); the only cross-host traffic is the decoder's
O(1)-per-channel ring state (previous interleaved field + precoder bits
+ soft path metrics).

Topology: pure channel parallelism (mesh (1, n_chips)), matching the
encode driver; per-host IO assignment is a contiguous channel range.
Reed-Solomon correction and de-randomization run per host on its OWN
addressable shards — no host ever touches another host's data.

Usage (run once per host):
    python tools/distributed_decode.py 'cap_ch{ch}.iq' \
        --coordinator host0:1234 --num-processes 2 --process-id $I \
        --channels 8 -o 'out_ch{ch}.ts' [--trellis viterbi] \
        [--fields-per-step 4]

Inputs: a cf32 interleaved capture per channel ('{ch}' template or an
explicit per-channel list) — exactly what distributed_encode.py emits.
Field-aligned captures (the zf equalizer is sample-synchronous; for
unaligned/impaired captures condition with the sequential
`cli decode --align/--cfo/--sro` first, or per channel).

Verified end-to-end by tests/test_distributed.py::
test_two_process_cli_decode — two real processes through this driver,
outputs byte-compared against the transmitted transport streams.
"""

from __future__ import annotations

import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("inputs", nargs="+",
                    help="cf32 capture template with '{ch}' or one file "
                         "per channel")
    ap.add_argument("--coordinator", required=True, metavar="HOST:PORT")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("-c", "--channels", type=int, required=True,
                    help="global channel count (divisible by chip count)")
    ap.add_argument("-o", "--output", required=True,
                    help="per-channel TS output template containing '{ch}'")
    ap.add_argument("--trellis", default="hard",
                    choices=("hard", "viterbi"))
    ap.add_argument("--eq-profile", default="auto")
    ap.add_argument("--first-field", type=int, default=0)
    ap.add_argument("--fields-per-step", type=int, default=4)
    args = ap.parse_args(argv)
    if "{ch}" not in args.output:
        raise ValueError("-o must contain '{ch}' (one file per channel)")

    from atsc_tpu.parallel.distributed import initialize

    initialize(args.coordinator, num_processes=args.num_processes,
               process_id=args.process_id)

    import jax
    import jax.numpy as jnp
    import numpy as np

    from atsc_tpu import params as P
    from atsc_tpu.models.receiver import field_window
    from atsc_tpu.ops.decode import derandomize_field
    from atsc_tpu.ops.rs_decode import rs_correct_field_jit
    from atsc_tpu.parallel.distributed import (
        local_channel_slice,
        pod_mesh,
        put_global,
    )
    from atsc_tpu.parallel.rx_shard import ShardedReceiver

    mesh = pod_mesh(n_time=1)
    rx = ShardedReceiver(
        mesh, batch=args.channels,
        fields_per_device=args.fields_per_step,
        first_field=args.first_field, eq_profile=args.eq_profile,
        trellis="soft" if args.trellis == "viterbi" else "hard",
    )
    sl = local_channel_slice(mesh, args.channels)
    t = rx.t_total
    n = P.SYMBOLS_PER_FIELD
    bl = sl.stop - sl.start

    if len(args.inputs) == 1 and "{ch}" in args.inputs[0]:
        local_paths = [args.inputs[0].format(ch=c)
                       for c in range(sl.start, sl.stop)]
    elif len(args.inputs) == args.channels:
        local_paths = args.inputs[sl]
    else:
        raise ValueError(f"{len(args.inputs)} inputs for "
                         f"{args.channels} channels (want a '{{ch}}' "
                         "template or one per channel)")
    readers = [open(p, "rb") for p in local_paths]
    sinks = {c: open(args.output.format(ch=c), "wb")
             for c in range(sl.start, sl.stop)}
    derand = jax.jit(derandomize_field)
    next_field = args.first_field
    emitted = 0          # decoder output fields produced so far
    fields_done = 0      # real input fields consumed

    def run_step(iq_ext: np.ndarray, valid: int) -> None:
        """One sharded step over iq_ext (bl, l_ctx + t*N + r_ctx)
        complex64 — t fields plus REAL stream context on both edges (the
        receiver's FIR support; zero-filled only at the true capture
        ends, matching the sequential CLI). Writes the TS of the first
        `valid` emitted fields (minus the cold-start virtual field)."""
        nonlocal next_field, emitted
        wins = np.zeros((t, args.channels, 2, rx.window), np.float32)
        oscs = np.empty((t, 2, rx.window), np.float32)
        for f in range(t):
            w, o = field_window(iq_ext, f * n, first_field=next_field,
                                stream_offset=-l_ctx,
                                margin=rx.eq_margin, length=rx.window)
            wins[f, sl] = w
            oscs[f] = o
        parity = jnp.int32(next_field % 2)
        next_field += t
        wj = put_global(wins, rx.win_sharding)
        oj = put_global(oscs, rx.osc_sharding)
        rx._state, cw_g, syn_g = rx._step(rx._state, wj, oj, parity)
        # emitted field k (of this step) = TS field (emitted + k - 1),
        # which needs received fields through emitted + k: valid for
        # k < `valid`; skip the cold-start virtual field (index 0)
        ks = [k for k in range(valid) if emitted + k != 0]
        # correct + derandomize this host's own shards only
        for cw_s, syn_s in zip(cw_g.addressable_shards,
                               syn_g.addressable_shards):
            cw = jnp.asarray(cw_s.data)          # (t, bl_shard, 312, 207)
            syn = jnp.asarray(syn_s.data)
            if bool(jnp.any(syn != 0)):
                cw, _ = rs_correct_field_jit(cw, syn)
            tb = cw.shape[0] * cw.shape[1]
            ts = np.asarray(derand(cw.reshape(
                tb, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES))
            ).reshape(t, cw.shape[1], P.FIELD_TS_BYTES)
            ch0 = (cw_s.index[1].start or 0)
            for k in ks:
                for j in range(ts.shape[1]):
                    sinks[ch0 + j].write(ts[k, j].tobytes())
        emitted += t

    # rolling sample buffer: l_ctx of left context carries across steps
    # and r_ctx of lookahead is read ahead, so every window sees REAL
    # stream context at step seams (zero-fill only at the capture ends)
    l_ctx = rx.eq_margin
    r_ctx = rx.window - n - l_ctx
    left = np.zeros((bl, l_ctx), np.complex64)
    pend = np.zeros((bl, 0), np.complex64)
    eof = False
    while True:
        while not eof and pend.shape[1] < t * n + r_ctx:
            bufs = [rd.read(t * n * 8) for rd in readers]
            got = min(len(b) // 8 for b in bufs)
            if got:
                new = np.empty((bl, got), np.complex64)
                for j, b_ in enumerate(bufs):
                    pairs = np.frombuffer(
                        b_[: got * 8], np.float32).reshape(got, 2)
                    new[j] = pairs[:, 0] + 1j * pairs[:, 1]
                pend = np.concatenate([pend, new], axis=1)
            if min(len(b) for b in bufs) < t * n * 8:
                eof = True
        local_whole = min(t, pend.shape[1] // n)
        if args.num_processes > 1:
            # every process must run the SAME number of sharded steps
            # (the decode body contains collectives): agree on the step
            # size so a short capture on one host cannot wedge the rest
            from jax.experimental import multihost_utils

            whole = int(multihost_utils.process_allgather(
                np.asarray(local_whole)).min())
        else:
            whole = local_whole
        if whole == 0:
            break
        ext = np.zeros((bl, l_ctx + t * n + r_ctx), np.complex64)
        ext[:, :l_ctx] = left
        take = min(pend.shape[1], t * n + r_ctx)
        ext[:, l_ctx : l_ctx + take] = pend[:, :take]
        run_step(ext, valid=whole)
        fields_done += whole
        if whole < t:
            break        # final partial step (tail state saw zero pads)
        left = ext[:, whole * n : whole * n + l_ctx]
        pend = pend[:, whole * n :]
    for f in readers:
        f.close()
    for f in sinks.values():
        f.close()
    print(f"process {args.process_id}: decoded {fields_done} fields x "
          f"channels [{sl.start}, {sl.stop})", flush=True)


if __name__ == "__main__":
    main()
