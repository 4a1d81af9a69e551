"""FDM mux/demux throughput on the real chip.

Times the jitted multiplex and demultiplex block cores at a given slot
count, reporting multiplex-seconds of signal per wall-second (1.0 = one
whole B-channel band in real time). Timing rule (PERF.md): value-fetch
barrier via float(jnp.sum(...)).

Usage:
    python tools/mux_bench.py [--slots 8] [--iters 20]
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.ops.mux import (  # noqa: E402
    RESAMPLE_DOWN,
    RESAMPLE_UP,
    SLOT_HZ,
    _HALO,
    _demux_halo,
    demux_blocks,
    mux_blocks,
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--blocks", type=int, default=512,
                    help="513-sample input blocks per step")
    args = ap.parse_args()
    b, k = args.slots, args.blocks

    rng = np.random.default_rng(0)
    halo = _HALO
    n_in = k * RESAMPLE_DOWN
    iq = jnp.asarray(rng.normal(
        0, 1, (b, 2, n_in + 2 * halo)).astype(np.float32))
    step = jax.jit(mux_blocks)
    out = step(iq)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = step(iq)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / args.iters
    signal_s = n_in / P.SAMPLE_RATE
    print(json.dumps({
        "probe": f"fdm_mux_{b}slots", "ms_per_step": round(dt * 1e3, 3),
        "realtime_bands": round(signal_s / dt, 1),
    }), flush=True)

    dh = _demux_halo(b)
    m_in = k * RESAMPLE_UP * b
    mux = jnp.asarray(rng.normal(
        0, 1, (2, m_in + 2 * dh)).astype(np.float32))
    dstep = jax.jit(lambda x: demux_blocks(x, b))
    out = dstep(mux)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = dstep(mux)
    float(jnp.sum(out))
    dt = (time.perf_counter() - t0) / args.iters
    signal_s = m_in / (b * SLOT_HZ)
    print(json.dumps({
        "probe": f"fdm_demux_{b}slots", "ms_per_step": round(dt * 1e3, 3),
        "realtime_bands": round(signal_s / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
