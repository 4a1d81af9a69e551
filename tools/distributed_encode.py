"""Multi-host pod-slice encode driver — the production entry point for
SURVEY.md §5.8 / BASELINE config[4] (N hosts x chips, 64+ channels).

Every host runs THIS script with the same arguments plus its own
--process-id; `jax.distributed` wires the processes into one runtime and
the global channel mesh spans every chip in the slice. Each host ingests
transport streams and writes IQ for exactly the channels its chips own
(`local_channel_slice`), so the host boundary scales like per-host data
loading in an SPMD training job; the only cross-host traffic is the
encoder's O(1)-per-channel state exchange.

Topology: pure channel parallelism (mesh (1, n_chips)) — each host's
shards cover whole channels, so per-host IO assignment is a contiguous
channel range. Time-block sharding composes at the library level
(parallel/field_shard.py) but splits a channel's fields across hosts,
which is the wrong shape for per-host file IO.

Usage (run once per host):
    python tools/distributed_encode.py in.ts \
        --coordinator host0:1234 --num-processes 2 --process-id $I \
        --channels 8 -o 'out_ch{ch}.iq' [--format cs8] [--fields-per-step 4]

Inputs: one TS file (replicated to every channel) or exactly --channels
files (one per channel; each host opens only the files of the channels
it owns). Outputs: one IQ file per owned channel ('{ch}' is the global
channel index).

Verified end-to-end by tests/test_distributed.py::
test_two_process_cli_encode — two real processes through this driver,
outputs byte-identical to the sequential encoder.
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
                    help="one TS file (replicated) or one per channel")
    ap.add_argument("--coordinator", required=True, metavar="HOST:PORT")
    ap.add_argument("--num-processes", type=int, required=True)
    ap.add_argument("--process-id", type=int, required=True)
    ap.add_argument("-c", "--channels", type=int, required=True,
                    help="global channel count (divisible by chip count)")
    ap.add_argument("-o", "--output", required=True,
                    help="per-channel output template containing '{ch}'")
    ap.add_argument("--format", dest="out_format", default="cf32",
                    choices=("cf32", "cs16", "cs8"))
    ap.add_argument("--fields-per-step", type=int, default=4)
    ap.add_argument("--max-fields", type=int, default=0)
    args = ap.parse_args(argv)
    if "{ch}" not in args.output:
        raise ValueError("-o must contain '{ch}' (one file per channel)")

    from atsc_tpu.parallel.distributed import initialize

    initialize(args.coordinator, num_processes=args.num_processes,
               process_id=args.process_id)

    import jax
    import numpy as np

    from atsc_tpu import params as P
    from atsc_tpu.models.encoder import init_state, iq_interleave
    from atsc_tpu.parallel.distributed import (
        local_channel_slice,
        pod_mesh,
        put_global,
    )
    from atsc_tpu.parallel.field_shard import ShardedEncoder

    mesh = pod_mesh(n_time=1)
    enc = ShardedEncoder(mesh, batch=args.channels,
                         fields_per_device=args.fields_per_step,
                         out_format=args.out_format)
    sl = local_channel_slice(mesh, args.channels)
    t = enc.t_total
    fb = P.FIELD_TS_BYTES

    if len(args.inputs) == 1:
        replicate = True
        local_paths = args.inputs * (sl.stop - sl.start)
    elif len(args.inputs) == args.channels:
        replicate = False
        local_paths = args.inputs[sl]
    else:
        raise ValueError(f"{len(args.inputs)} inputs for "
                         f"{args.channels} channels (want 1 or B)")
    readers = [open(p, "rb") for p in
               (args.inputs[:1] if replicate else local_paths)]
    sinks = {c: open(args.output.format(ch=c), "wb")
             for c in range(sl.start, sl.stop)}

    state_g = put_global(init_state(args.channels), enc.state_sharding)
    fields_done = 0
    n = P.SYMBOLS_PER_FIELD
    while True:
        # read this step's TS for the channels this host owns; other
        # hosts' channel slots can be anything (put_global materializes
        # only the local shards)
        bufs = [r.read(fb * t) for r in readers]
        whole = min(len(b) // fb for b in bufs)
        if whole == 0:
            break
        ts = np.zeros((t, args.channels, fb), np.uint8)
        for j, c in enumerate(range(sl.start, sl.stop)):
            src = bufs[0] if replicate else bufs[j]
            arr = np.frombuffer(src[: whole * fb], np.uint8).reshape(
                whole, fb)
            ts[:whole, c] = arr
        ts_g = put_global(ts, enc.ts_sharding)
        state_g, iq = enc._step(state_g, ts_g)
        # drain: this host's addressable shards ARE its channels
        for shard in iq.addressable_shards:
            data = np.asarray(shard.data)      # (t, ch_shard, 2, >=N)
            ch0 = shard.index[1].start or 0
            for k in range(whole):
                for j in range(data.shape[1]):
                    sinks[ch0 + j].write(
                        iq_interleave(data[k, j]).tobytes())
        fields_done += whole
        if whole < t or (args.max_fields and fields_done >= args.max_fields):
            break
    for f in readers:
        f.close()
    for f in sinks.values():
        f.close()
    print(f"process {args.process_id}: encoded {fields_done} fields x "
          f"channels [{sl.start}, {sl.stop})", flush=True)


if __name__ == "__main__":
    main()
