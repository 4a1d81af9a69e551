"""Streaming arbitrary-rate polyphase resampler (ops/resample.py) and its
CLI integration (`decode --rate`, streaming numeric `--sro`). The reference
is transmit-only and always runs at the exact symbol rate (SoapySDR setup,
util/atsc_encoder.cpp:70); real receive hardware rarely does — this is the
capture-rate front end the reference has no counterpart for."""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.resample import (
    SYMBOL_RATE_FRACTION,
    StreamResampler,
    capture_rate,
)
from tests.test_decoder import _random_ts
from tests.test_receiver import _encode_iq


def test_stream_matches_whole_capture_kernel():
    """One-shot StreamResampler output matches resample_stream (the
    whole-capture reference implementation of the same Kaiser-sinc
    interpolator) on every sample both emit."""
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(11)
    n = 120_000
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    rate = 1.0 + 37e-6
    ref = resample_stream(iq, rate)
    rs = StreamResampler(rate, batch=1)
    out = np.concatenate([rs.push(iq[None]), rs.flush()], axis=-1)
    m = min(ref.shape[1], out.shape[1])
    assert m >= ref.shape[1]  # streaming emits at least the reference set
    np.testing.assert_allclose(out[:, :m], ref[:, :m], atol=1e-5)


def test_stream_chunked_equals_one_shot():
    """Push boundaries are invisible: any chunking emits bit-identical
    output (the carried rational position is exact)."""
    rng = np.random.default_rng(12)
    n = 100_000
    iq = (rng.standard_normal((2, n)) + 1j * rng.standard_normal((2, n))
          ).astype(np.complex64)
    rate = capture_rate(16_000_000)  # 16 MS/s capture
    one = StreamResampler(rate, batch=2)
    ref = np.concatenate([one.push(iq), one.flush()], axis=-1)
    chunked = StreamResampler(rate, batch=2)
    outs, pos = [], 0
    for c in (1, 999, 65_536, 17, 33_447):
        outs.append(chunked.push(iq[:, pos:pos + c]))
        pos += c
    outs.append(chunked.push(iq[:, pos:]))
    outs.append(chunked.flush())
    got = np.concatenate(outs, axis=-1)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(got, ref)


def test_exact_rational_position_never_drifts():
    """The carried position is an exact rational: after 10^8 outputs the
    interpolation point equals the closed form exactly (a float64 cursor
    would be ~1e-2 samples off by then and growing)."""
    from fractions import Fraction

    rate = capture_rate(20_000_000)
    assert rate == Fraction(2860, 1539)
    rs = StreamResampler(rate, batch=1)
    n = 100_000_000
    base, ph = rs._pos(n)
    exact = Fraction(2860, 1539) * n + 16
    assert base == exact.numerator // exact.denominator
    frac = exact - base
    assert ph == min(round(frac * 512), 511)
    # the ATSC symbol rate itself round-trips exactly
    assert capture_rate(SYMBOL_RATE_FRACTION) == 1


def test_state_roundtrip_resumes_bit_identically():
    """state()/load_state() + re-reading the capture tail from in_base
    continues the emission bit-identically (the checkpoint contract)."""
    rng = np.random.default_rng(13)
    n = 150_000
    iq = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64
    )
    rs = StreamResampler((2860, 1539), batch=1)
    rs.push(iq[None, :70_000])
    st = rs.state()
    cont = np.concatenate(
        [rs.push(iq[None, 70_000:]), rs.flush()], axis=-1
    )
    rs2 = StreamResampler.load_state(st)
    cont2 = np.concatenate(
        [rs2.push(iq[None, st["in_base"]:]), rs2.flush()], axis=-1
    )
    assert cont.shape == cont2.shape
    np.testing.assert_array_equal(cont, cont2)


def test_cli_decode_rate(tmp_path):
    """`decode --rate 12e6`: a capture recorded at 12 MS/s (synthesized by
    resampling the nominal-rate IQ up) decodes to the exact transport
    stream through the streaming rate-conversion front end."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(107)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts) * (0.95 * np.exp(0.3j))
    cap = resample_stream(iq, float(P.SAMPLE_RATE) / 12e6)[0]
    path = tmp_path / "cap12.iq"
    np.stack([cap.real, cap.imag], axis=-1).astype(np.float32).tofile(path)
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(path), "--rate", "12e6", "-o", str(out)]
    )
    summary = run_decode(args)
    assert summary["fields_decoded"] >= 2
    assert summary["segments_uncorrectable"] == 0
    assert abs(summary["resample_rate"] - 12e6 / P.SAMPLE_RATE) < 1e-9
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1:1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_push_planar_matches_push():
    """push_planar (the TX-side zero-conversion entry) emits the same
    samples as the complex push for the same stream."""
    rng = np.random.default_rng(21)
    n = 80_000
    iq = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
          ).astype(np.complex64)
    a = StreamResampler((1539, 2000), batch=3)  # upsample ~1.3x
    want = np.concatenate([a.push(iq), a.flush()], axis=-1)
    b = StreamResampler((1539, 2000), batch=3)
    planar = np.stack([iq.real, iq.imag], axis=1).astype(np.float32)
    got = np.concatenate(
        [b.push_planar(planar), b.flush_planar()], axis=-1
    )
    np.testing.assert_array_equal(got[:, 0] + 1j * got[:, 1], want)


def test_cli_encode_rate_decode_rate_loopback(tmp_path):
    """`encode --rate 16e6` -> `decode --rate 16e6`: the TX-side output
    resampler (new; the reference pins the SDR to the symbol rate) round-
    trips with the RX-side rate front end to the exact transport stream."""
    from atsc_tpu.cli import build_decode_argparser, main, run_decode

    rng = np.random.default_rng(211)
    ts = _random_ts(rng, 5, 1)
    ts_path = tmp_path / "in.ts"
    ts_path.write_bytes(ts[:, 0].tobytes())
    cap = tmp_path / "cap16.iq"
    assert main([str(ts_path), "-o", str(cap), "--rate", "16e6"]) == 0
    # the emitted sample count matches the rate conversion
    n_out = cap.stat().st_size // 8
    n_in = 5 * P.SYMBOLS_PER_FIELD
    assert abs(n_out - n_in * 16e6 / float(P.SAMPLE_RATE)) < 64

    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(cap), "--rate", "16e6", "-o", str(out)]
    )
    summary = run_decode(args)
    assert summary["fields_decoded"] >= 2
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1 : 1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_encode_rate_checkpoint_resume(tmp_path):
    """--rate composes with --checkpoint/--resume: the resampler's carry
    (exact-rational position + buffered input window) is part of the
    checkpoint, so the split run is byte-identical to the full run."""
    from atsc_tpu.cli import main
    from tests.conftest import GOLDEN_PATH

    golden_in = np.load(GOLDEN_PATH)["input"]
    ts = tmp_path / "in.ts"
    ts.write_bytes(golden_in.reshape(-1).tobytes())
    full, p1, p2 = (tmp_path / n for n in ("full.iq", "p1.iq", "p2.iq"))
    ck = tmp_path / "state.npz"
    assert main([str(ts), "-o", str(full), "--rate", "12e6"]) == 0
    assert main([str(ts), "-o", str(p1), "--rate", "12e6",
                 "--max-fields", "2", "--checkpoint", str(ck)]) == 0
    assert main([str(ts), "-o", str(p2), "--rate", "12e6", "--resume",
                 "--checkpoint", str(ck)]) == 0
    assert p1.read_bytes() + p2.read_bytes() == full.read_bytes()


def test_cli_encode_mux_rate_matches_one_shot(tmp_path):
    """--mux --rate: the wideband multiplex is resampled from its native
    channels*6 MHz to the SDR master clock; byte-identical to a one-shot
    StreamResampler pass over the nominal-rate multiplex (push-boundary
    invariance)."""
    from fractions import Fraction

    from atsc_tpu.cli import main
    from tests.conftest import GOLDEN_PATH

    golden_in = np.load(GOLDEN_PATH)["input"]
    ts = tmp_path / "in.ts"
    ts.write_bytes(golden_in[:2].reshape(-1).tobytes())
    nom, res = tmp_path / "mux.iq", tmp_path / "mux16.iq"
    assert main([str(ts), "--channels", "2", "--mux", "-o", str(nom)]) == 0
    assert main([str(ts), "--channels", "2", "--mux", "-o", str(res),
                 "--rate", "16e6"]) == 0
    wide = np.fromfile(nom, np.float32).reshape(-1, 2)
    rs = StreamResampler(Fraction(12_000_000) / Fraction(16_000_000),
                         batch=1)
    planar = np.ascontiguousarray(wide.T)[None]
    want = np.concatenate(
        [rs.push_planar(planar), rs.flush_planar()], axis=-1
    )[0]
    got = np.fromfile(res, np.float32).reshape(-1, 2).T
    np.testing.assert_array_equal(got, want)


def test_cli_encode_ppm_decode_sro_roundtrip(tmp_path):
    """`encode --ppm 37` emulates a 37 ppm fast transmit DAC; `decode
    --sro 37` is its exact inverse — the TS round-trips exactly (the TX
    mirror of the receiver's SRO handling; generates controlled-SRO
    captures for receiver testing without an impaired SDR)."""
    from atsc_tpu.cli import build_decode_argparser, main, run_decode

    rng = np.random.default_rng(223)
    ts = _random_ts(rng, 5, 1)
    ts_path = tmp_path / "in.ts"
    ts_path.write_bytes(ts[:, 0].tobytes())
    cap = tmp_path / "cap_ppm.iq"
    assert main([str(ts_path), "-o", str(cap), "--ppm", "37"]) == 0
    # 37 ppm fast: ~37e-6 more samples than the nominal capture
    n_out = cap.stat().st_size // 8
    n_in = 5 * P.SYMBOLS_PER_FIELD
    assert n_in < n_out < n_in * (1 + 60e-6)

    out = tmp_path / "out.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(cap), "--sro", "37", "-o", str(out)]
    ))
    assert summary["fields_decoded"] >= 2
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1 : 1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_encode_rate_rejections():
    """--rate guardrails: quantized wire formats and clocks below the
    occupied band are refused before any output is produced."""
    import pytest

    from atsc_tpu.cli import run
    from atsc_tpu.utils.config import EncoderConfig

    with pytest.raises(ValueError, match="cf32 only"):
        run(EncoderConfig(rate=16e6, out_format="cs8"), ["/dev/null"])
    with pytest.raises(ValueError, match="occupied"):
        run(EncoderConfig(rate=4e6), ["/dev/null"])


def test_cli_decode_sro_numeric_streams(tmp_path):
    """Numeric `--sro 37` now streams (no whole-capture read): same exact
    decode as the `--sro auto` path on a 37 ppm fast capture."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(109)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts) * (0.9 * np.exp(0.8j))
    cap = resample_stream(iq, 1.0 / (1.0 + 37e-6))[0]
    path = tmp_path / "cap.iq"
    np.stack([cap.real, cap.imag], axis=-1).astype(np.float32).tofile(path)
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(path), "--sro", "37", "-o", str(out)]
    )
    summary = run_decode(args)
    assert summary["sro_ppm"] == 37.0
    assert summary["fields_decoded"] >= 2
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1:1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_encode_rate_multichannel_requires_mux():
    """Per-channel resampled streams have variable per-field lengths; a
    channel-interleaved layout would be silently unparseable, so the CLI
    refuses --rate/--ppm with --channels > 1 unless --mux combines them
    into one wideband stream."""
    import pytest

    from atsc_tpu.cli import run
    from atsc_tpu.utils.config import EncoderConfig

    with pytest.raises(ValueError, match="requires\\s+--mux"):
        run(EncoderConfig(channels=2, rate=16e6), ["/dev/null"])
    with pytest.raises(ValueError, match="requires\\s+--mux"):
        run(EncoderConfig(channels=2, ppm=30.0), ["/dev/null"])


def test_resampler_flushed_state_refuses_resume():
    """full_state() after flush carries a flushed marker; load_full_state
    refuses it — the zero tail pad baked into the buffer would otherwise
    replay as spurious near-zero samples at the resume seam."""
    from fractions import Fraction

    import pytest

    from atsc_tpu.ops.resample import StreamResampler

    rs = StreamResampler(Fraction(10_762_238, 12_000_000), batch=1)
    rs.push_planar(np.zeros((1, 2, 4096), np.float32))
    mid = rs.full_state()
    assert int(mid["flushed"]) == 0
    StreamResampler.load_full_state(mid)  # mid-stream state resumes fine

    rs.flush_planar()
    post = rs.full_state()
    assert int(post["flushed"]) == 1
    with pytest.raises(ValueError, match="flush"):
        StreamResampler.load_full_state(post)
