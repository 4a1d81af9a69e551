"""Impairment gauntlet on the REAL chip.

The CPU test suite proves the receive conditioning logic, but the CPU
backend computes DEFAULT-precision matmuls in f32 — it never exercises
the genuine bf16 rounding of the TPU's fused equalizer / fast tier at
operating SNRs. This tool runs a compact impairment sweep end-to-end on
the attached chip and asserts exact TS recovery:

  clean        — loopback, hard path (fused eq kernel)
  cs8          — int8 wire capture, in-kernel dequant
  awgn15_vit   — 15 dB AWGN, soft fused eq + Viterbi (3 dB above the
                 CPU-measured 12 dB soft threshold)
  awgn13_vit   — 13 dB AWGN, 1 dB above threshold
  awgn13_i8    — 13 dB AWGN, quantized soft tier (trellis="soft-i8":
                 int8 level codes, in-kernel dequant)
  cci_ntsc     — 0.5x-RMS co-channel tone at the comb null, ntsc="comb"
                 (16-state PR Viterbi)
  multipath_dd — multipath+complex gain, adaptive-dd equalizer (XLA path)

The B=1 soft/NTSC probes run the fused Pallas ACS/traceback kernels via
the batch-padding wrapper (ops/pallas/viterbi_acs.py _pad_batch), so
this gauntlet compiles and proves them on the real device every run.

Usage: python tools/chip_gauntlet.py
Prints one JSON line per probe; exits non-zero if any probe fails.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import Encoder, iq_to_complex  # noqa: E402
from atsc_tpu.models.receiver import IqReceiver  # noqa: E402


def _capture(nfields: int = 4, seed: int = 17):
    rng = np.random.default_rng(seed)
    ts = rng.integers(0, 256, size=(nfields, 1, P.FIELD_TS_BYTES),
                      dtype=np.uint8)
    ts[..., :: P.MPEG2_BYTES] = 0x47
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k]))) for k in range(nfields)],
        axis=-1)
    return ts, iq, rng


def _check(name: str, got: list, ts: np.ndarray) -> bool:
    """got: [(ts_field (B, 58656), nerr (B, 312)), ...] — expect fields
    0..len(got)-1 to equal the transmitted fields, fully corrected."""
    ok = len(got) >= ts.shape[0] - 1
    unc = 0
    for k, (tsf, nerr) in enumerate(got):
        unc += int((nerr < 0).sum())
        ok = ok and bool((tsf == ts[k]).all())
    print(json.dumps({"probe": name, "ok": bool(ok and unc == 0),
                      "fields_decoded": len(got),
                      "segments_uncorrectable": unc}), flush=True)
    return bool(ok and unc == 0)


def main() -> None:
    results = []
    ts, iq, rng = _capture()

    r = IqReceiver(batch=1)
    results.append(_check("clean_hard", r.push(iq) + r.flush(), ts))

    # cs8 wire capture through push_codes (in-kernel dequant)
    from atsc_tpu.ops.quantize import QMAX, quantize_scale
    s = quantize_scale("cs8")
    codes = np.stack([iq.real, iq.imag], axis=-1) * s
    codes = np.clip(np.round(codes), -QMAX["cs8"], QMAX["cs8"]).astype(np.int8)
    r = IqReceiver(batch=1, wire_format="cs8")
    results.append(_check("cs8_hard", r.push_codes(codes) + r.flush(), ts))

    # AWGN + soft Viterbi at 15 and 13 dB SNR
    p_sig = float(np.mean(np.abs(iq) ** 2))
    for snr in (15.0, 13.0):
        sigma = np.sqrt(p_sig / 10 ** (snr / 10.0) / 2.0)
        noisy = iq + (rng.normal(size=iq.shape)
                      + 1j * rng.normal(size=iq.shape)) * sigma
        r = IqReceiver(batch=1, trellis="soft")
        results.append(_check(f"awgn{snr:g}_viterbi",
                              r.push(noisy.astype(np.complex64)) + r.flush(),
                              ts))

    # quantized soft tier at 13 dB: int8 level codes end-to-end
    sigma = np.sqrt(p_sig / 10 ** (13.0 / 10.0) / 2.0)
    noisy = iq + (rng.normal(size=iq.shape)
                  + 1j * rng.normal(size=iq.shape)) * sigma
    r = IqReceiver(batch=1, trellis="soft-i8")
    results.append(_check("awgn13_viterbi_i8",
                          r.push(noisy.astype(np.complex64)) + r.flush(),
                          ts))

    # analog co-channel tone at the comb's first null, NTSC-rejection
    # tier (comb + fused 16-state PR Viterbi kernel)
    n = np.arange(iq.shape[1])
    f = P.SAMPLE_RATE / 12 + P.OSC_FREQUENCY
    rms = np.sqrt(p_sig)
    cci = 0.5 * rms * np.exp(2j * np.pi * f * n / P.SAMPLE_RATE + 0.4j)
    r = IqReceiver(batch=1, ntsc="comb")
    results.append(_check("cci_ntsc",
                          r.push((iq + cci).astype(np.complex64))
                          + r.flush(), ts))

    # multipath + complex gain, adaptive decision-directed equalizer
    y = np.convolve(iq[0], [0.9 * np.exp(0.6j), 0, 0.1 * np.exp(-1.0j)])
    y = y[: iq.shape[1]][None]
    r = IqReceiver(batch=1, backend="adaptive-dd")
    results.append(_check("multipath_adaptive_dd",
                          r.push(y.astype(np.complex64)) + r.flush(), ts))

    sys.exit(0 if all(results) else 1)


if __name__ == "__main__":
    main()
