"""Receiver noise-threshold characterization: hard slicing vs Viterbi.

Sweeps AWGN SNR at the receiver input (the encoder's own baseband as the
signal) and reports, per trellis mode, the post-RS outcome — the 8VSB
analog of a TOV (threshold-of-visibility) measurement. Commercial 8VSB
receivers quote ~15.2 dB white-noise threshold; this measures where this
framework's chain stands and quantifies the Viterbi path's coding gain.

Measured (4 fields, seed 7, real TPU, 2026-08-17): hard slicing is exact
down to 20 dB (fails at 18); soft Viterbi is exact down to 12 dB (856
RS-corrected segments there, none uncorrectable; fails at 11) — 3 dB
below the commercial threshold, ~8 dB coding gain over hard slicing.

Usage:
    python tools/rx_threshold.py [--fields 4] [--snrs 22,20,18,17,16,15,14]
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import Encoder, iq_to_complex  # noqa: E402
from atsc_tpu.models.receiver import IqReceiver  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--fields", type=int, default=4)
    ap.add_argument("--snrs", default="22,20,18,17,16,15,14")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--modes", default="hard,soft",
                    help="comma list of trellis modes to sweep "
                         "(hard, soft, soft-i8)")
    ap.add_argument("--backend", default="device",
                    choices=("device", "adaptive", "adaptive-dd"),
                    help="equalizer under test: the known-chain ZF device "
                         "path (default), sync-trained RLS, or RLS + "
                         "decision-directed refinement")
    args = ap.parse_args()
    snrs = [float(s) for s in args.snrs.split(",")]

    rng = np.random.default_rng(args.seed)
    ts = rng.integers(0, 256, size=(args.fields, 1, P.FIELD_TS_BYTES),
                      dtype=np.uint8)
    for k in range(args.fields):
        ts[k, :, ::188] = 0x47
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k]))) for k in
         range(args.fields)], axis=-1,
    )
    p_sig = float(np.mean(np.abs(iq) ** 2))

    thresholds = {}
    for mode in args.modes.split(","):
        thresholds[mode] = None
        for snr in snrs:
            sigma = np.sqrt(p_sig / 10 ** (snr / 10) / 2)
            noise = (rng.normal(size=iq.shape) +
                     1j * rng.normal(size=iq.shape)) * sigma
            rx = IqReceiver(batch=1, trellis=mode, backend=args.backend)
            got = rx.push(iq + noise) + rx.flush()
            byte_errs = sum(
                int(np.sum(out != ts[k])) for k, (out, _) in enumerate(got)
            )
            ok = byte_errs == 0 and all(
                (nerr >= 0).all() for _, nerr in got
            )
            print(json.dumps({
                "mode": mode, "snr_db": snr, "post_rs_byte_errors": byte_errs,
                "uncorrectable_segments": rx.decoder.segments_uncorrectable,
                "rs_corrected_segments": rx.decoder.segments_corrected,
                "exact": ok,
            }), flush=True)
            if ok:
                thresholds[mode] = snr
    print(json.dumps({"threshold_db": thresholds,
                      "note": "lowest swept SNR with exact TS recovery"}))


if __name__ == "__main__":
    main()
