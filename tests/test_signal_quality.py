"""Physics-level signal validation, independent of the golden vectors:
the encoded baseband must actually look like an 8VSB signal — pilot tone
at the (quirk-replicated) oscillator frequency, energy confined to the
~5.38 MHz vestigial sideband, deep stopband outside it.

The reference has no such test; it only compares against its own dumps.
This catches whole classes of "consistently wrong" bugs (wrong oscillator
sign, taps order, level map) that golden-vector self-consistency cannot.
"""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_to_complex


def _spectrum(iq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    x = iq * np.hanning(iq.size)
    spec = np.fft.fftshift(np.fft.fft(x))
    freqs = np.fft.fftshift(np.fft.fftfreq(iq.size, d=1.0 / P.SAMPLE_RATE))
    return freqs, np.abs(spec) ** 2


def test_pilot_tone_and_band_occupancy(golden):
    enc = Encoder(batch=1)
    iq = iq_to_complex(np.asarray(enc.encode(golden["input"][0][None])))[0]
    freqs, psd = _spectrum(iq)

    # pilot: a strong narrow tone at OSC_FREQUENCY (-2.690589 MHz)
    pilot_bin = np.argmin(np.abs(freqs - P.OSC_FREQUENCY))
    win = psd[pilot_bin - 2 : pilot_bin + 3].sum()
    total = psd.sum()
    # the pilot carries the +1.25 DC bias of a +-7-level signal: a few
    # percent of total power, concentrated in a handful of bins
    assert win / total > 0.01, "pilot tone missing or misplaced"
    near = psd[pilot_bin - 50 : pilot_bin + 51].sum()
    assert win / near > 0.5, "pilot not a narrow tone"

    # occupied band: 8VSB spans [pilot, pilot + 5.38 MHz] nominally; the
    # RRC rolloff adds alpha/2 ~ 6% transition. 99% of power must be in
    # the padded band, and the far stopband must be deeply suppressed.
    f_lo = P.OSC_FREQUENCY - 0.2e6
    f_hi = P.OSC_FREQUENCY + P.SAMPLE_RATE / 2.0 + 0.2e6
    inband = psd[(freqs >= f_lo) & (freqs <= f_hi)].sum()
    assert inband / total > 0.99, "energy outside the vestigial sideband"

    stop = psd[freqs < P.OSC_FREQUENCY - 0.5e6].sum()
    assert stop / total < 1e-3, "stopband leakage below the pilot edge"


def test_constant_modulus_of_oscillator_path(golden):
    """The same TS encoded with phasor at field k vs a fresh encoder at
    field_index=k must match exactly (closed-form phase == recurrence)."""
    enc = Encoder(batch=1)
    for f in range(3):
        iq_seq = np.asarray(enc.encode(golden["input"][f][None]))
    enc2 = Encoder(batch=1, field_index=2)
    # replay interleaver/trellis state by hand: encode fields 0,1 first on
    # a scratch encoder to produce the same data-dependent state
    scratch = Encoder(batch=1)
    scratch.encode(golden["input"][0][None])
    scratch.encode(golden["input"][1][None])
    st = scratch.state
    enc2.state = enc2.state._replace(
        prev_rs=st.prev_rs, trellis_d=st.trellis_d, trellis_d1=st.trellis_d1,
        trellis_d2=st.trellis_d2, saved=st.saved,
    )
    iq_jump = np.asarray(enc2.encode(golden["input"][2][None]))
    np.testing.assert_array_equal(iq_seq, iq_jump)


def test_burst_flags_device_matches_host():
    """ops/erasures.py: the jitted device burst detector and the host
    reference produce the same flag runs (dilation is exactly identical;
    only the baseline median is subsampled on device) on a field with
    two injected bursts over realistic slicer noise."""
    from atsc_tpu.ops.erasures import (
        burst_erasure_flags,
        burst_erasure_flags_dev,
    )

    rng = np.random.default_rng(71)
    n = P.SYMBOLS_PER_FIELD
    sym = rng.integers(0, 8, size=(2, n)).astype(np.float64)
    lev = sym * 2.0 - 7.0 + P.PILOT_OFFSET + rng.normal(size=(2, n)) * 0.18
    for b, (s, ln) in enumerate([(40_000, 2_500), (190_000, 900)]):
        lev[b, s : s + ln] += rng.normal(size=ln) * 5.0

    host = burst_erasure_flags(lev)
    dev = np.asarray(burst_erasure_flags_dev(lev))
    assert host.shape == dev.shape
    # both must fully cover the injected bursts ...
    assert host[0, 40_000 : 42_500].all() and dev[0, 40_000 : 42_500].all()
    assert host[1, 190_000 : 190_900].all() and dev[1, 190_000 : 190_900].all()
    # ... and agree essentially everywhere (baseline subsampling may move
    # a run edge by a window or two on borderline hot windows)
    assert np.mean(host != dev) < 1e-3


def test_cli_analyze_clean_capture(tmp_path):
    """`analyze` on a clean epoch-aligned capture: zero offsets, high MER
    via the ZF path, decodable verdict."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from tests.test_decoder import _random_ts
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(41)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    path = tmp_path / "cap.iq"
    np.stack([iq.real, iq.imag], axis=-1).astype(np.float32).tofile(path)

    out = run_analyze(build_analyze_argparser().parse_args([str(path)]))
    assert out["align_offset"] == 0 and out["align_parity"] == 0
    assert abs(out["cfo_hz"]) < 5
    assert abs(out.get("sro_ppm", 0.0)) < 2.0
    assert out["mer_method"] == "zf"
    assert out["mer_db"] > 30
    assert out["decodable"]
    assert out["decode_flags"] == ""   # clean capture: no flags needed


def test_cli_analyze_impaired_capture(tmp_path):
    """`analyze` on a mid-stream capture with CFO, SRO and noise: the
    estimators report the impairments and MER comes from the adaptive
    path (unknown oscillator epoch)."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from atsc_tpu.models.receiver import resample_stream
    from tests.test_decoder import _random_ts
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(43)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts)[0]
    cut = 7_000                                  # mid-field start
    y = iq[cut:] * np.exp(
        2j * np.pi * 250.0 / P.SAMPLE_RATE * np.arange(iq.size - cut))
    y = resample_stream(y, 1.0 / (1.0 + 30e-6))[0]     # 30 ppm fast
    p = float(np.mean(np.abs(y) ** 2))
    y = y + (rng.normal(size=y.size) + 1j * rng.normal(size=y.size)) \
        * np.sqrt(p / 10 ** (28.0 / 10.0) / 2.0)       # 28 dB SNR
    path = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.complex64().real.dtype
                                               ).tofile(path)

    out = run_analyze(build_analyze_argparser().parse_args([str(path)]))
    # CFO is measured after the SRO resample, so it is the true carrier
    # offset (not biased by the SRO-scaled pilot shift)
    assert abs(out["cfo_hz"] - 250.0) < 30
    assert abs(out["sro_ppm"] - 30.0) < 3
    assert out["align_offset"] > 0
    assert out["mer_method"] == "adaptive"
    assert out["mer_db"] > 20       # 28 dB SNR capture, equalized
    assert out["decodable"]


def test_cli_analyze_demux_per_slot(tmp_path):
    """`analyze --demux B` on a wideband FDM multiplex: a per-slot MER
    report (the headend monitoring view). All slots decodable, adaptive
    MER (the demux filter is a linear channel)."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze, run
    from atsc_tpu.utils.config import EncoderConfig
    from tests.test_decoder import _random_ts

    b = 2
    rng = np.random.default_rng(47)
    ts = _random_ts(rng, 4, b)
    tsp = []
    for ch in range(b):
        p = tmp_path / f"in{ch}.ts"
        ts[:, ch].reshape(-1).tofile(p)
        tsp.append(str(p))
    cap = tmp_path / "wide.iq"
    run(EncoderConfig(channels=b, mux=True, sink=str(cap)), tsp)

    out = run_analyze(build_analyze_argparser().parse_args(
        [str(cap), "--demux", str(b), "--fields", "3"]))
    assert out["slots"] == b and out["multiplex_rate"] == b * 6e6
    assert len(out["per_slot"]) == b
    assert out["decode_flags"] == f"--demux {b}"   # band-level advice
    for s in out["per_slot"]:
        assert s["mer_method"] == "adaptive"
        assert s["mer_db"] > 20
        assert s["decodable"]
        assert "decode_flags" not in s   # not actionable under --demux


def test_cli_analyze_rate_capture(tmp_path):
    """`analyze --rate 14e6` on a capture at a 14 MS/s SDR clock: the
    stream resampler brings it to the symbol rate first; clean metrics."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze, run
    from atsc_tpu.utils.config import EncoderConfig
    from tests.test_decoder import _random_ts

    rng = np.random.default_rng(53)
    ts = _random_ts(rng, 4, 1)
    p = tmp_path / "in.ts"
    ts[:, 0].reshape(-1).tofile(p)
    cap = tmp_path / "cap14.iq"
    run(EncoderConfig(sink=str(cap), rate=14e6), [str(p)])

    out = run_analyze(build_analyze_argparser().parse_args(
        [str(cap), "--rate", "14e6", "--fields", "3"]))
    # the resampler's bulk delay clips the first sync, so a few ppm of
    # edge-refinement bias in sro_ppm is expected (and not corrected)
    assert abs(out.get("sro_ppm", 0.0)) < 5.0
    assert out["decode_flags"].startswith("--rate 14e6")
    assert "--sro" not in out["decode_flags"]   # interpolator noise, not SRO
    assert abs(out["cfo_hz"]) < 5
    assert out["mer_db"] > 25
    assert out["decodable"]


def test_cli_analyze_frame_boundary_cut(tmp_path):
    """A capture cut at a FRAME boundary (2 fields in) has off==0 and
    parity==0 but a ~pi oscillator epoch offset: the ZF MER is garbage
    and analyze must fall back to the adaptive measurement instead of
    issuing a false not-decodable verdict."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from tests.test_decoder import _random_ts
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(59)
    ts = _random_ts(rng, 6, 1)
    iq = _encode_iq(ts)[0][2 * P.SYMBOLS_PER_FIELD :]   # drop one frame
    path = tmp_path / "cap.iq"
    np.stack([iq.real, iq.imag], axis=-1).astype(np.float32).tofile(path)

    out = run_analyze(build_analyze_argparser().parse_args([str(path)]))
    assert out["align_offset"] == 0 and out["align_parity"] == 0
    assert out["mer_method"] == "adaptive"    # ZF rejected by fallback
    assert out["mer_db"] > 25
    assert out["decodable"]


def test_cli_analyze_subnominal_rate(tmp_path):
    """--rate below the symbol rate but above the 6 MHz occupied band
    (e.g. a 10 MS/s Airspy grab) is valid — decode accepts it, so the
    triage tool must too; genuinely-too-narrow rates are refused."""
    import pytest

    from atsc_tpu.cli import build_analyze_argparser, run_analyze, run
    from atsc_tpu.utils.config import EncoderConfig
    from tests.test_decoder import _random_ts

    rng = np.random.default_rng(61)
    ts = _random_ts(rng, 4, 1)
    p = tmp_path / "in.ts"
    ts[:, 0].reshape(-1).tofile(p)
    cap = tmp_path / "cap10.iq"
    run(EncoderConfig(sink=str(cap), rate=10e6), [str(p)])

    out = run_analyze(build_analyze_argparser().parse_args(
        [str(cap), "--rate", "10e6", "--fields", "3"]))
    assert out["decodable"] and out["mer_db"] > 20

    with pytest.raises(ValueError, match="occupied"):
        run_analyze(build_analyze_argparser().parse_args(
            [str(cap), "--rate", "5e6"]))


def test_cli_analyze_small_genuine_sro(tmp_path):
    """A genuine 4 ppm clock offset (ordinary TCXO error) must be
    corrected — the old 5 ppm gate left a blind band where the MER
    collapsed to ~15.7 and the advice omitted --sro auto."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from atsc_tpu.models.receiver import resample_stream
    from tests.test_decoder import _random_ts
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(67)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts)[0]
    y = resample_stream(iq, 1.0 / (1.0 + 4e-6))[0]     # 4 ppm fast
    path = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(path)

    out = run_analyze(build_analyze_argparser().parse_args([str(path)]))
    assert abs(out["sro_ppm"] - 4.0) < 2.0
    assert "--sro auto" in out["decode_flags"]
    assert out["mer_db"] > 25, out      # corrected, not blind-banded
    assert out["decodable"]
