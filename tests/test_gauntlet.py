"""The full-gauntlet integration test: every capture impairment at once,
decoded with every conditioning feature at once.

Impairments (in realistic order): multipath channel with complex gain ->
carrier frequency offset -> sample-rate offset -> AWGN -> a strong
impulse-noise burst -> mid-field capture start. Decode: `--sro auto`
(implies align + adaptive equalizer) + `--cfo auto` + `--trellis
viterbi` + `--erasures burst`. Proves the conditioning front end
composes — each estimator must still lock on a capture the *other*
impairments have already mangled.
"""

import numpy as np

from atsc_tpu import params as P
from tests.test_decoder import _random_ts
from tests.test_receiver import _encode_iq

N = P.SYMBOLS_PER_FIELD


def test_cli_decode_full_gauntlet(tmp_path):
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(131)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts)[0]

    # multipath + complex gain
    y = np.convolve(iq, [0.85 * np.exp(0.7j), 0, 0.12 * np.exp(-1.1j), 0,
                         0.05j])[: iq.size]
    # 400 Hz tuner offset
    y = y * np.exp(2j * np.pi * 400.0 / P.SAMPLE_RATE * np.arange(y.size))
    # 25 ppm fast capture clock
    y = resample_stream(y, 1.0 / (1.0 + 25e-6))[0]
    # 24 dB AWGN
    p_sig = float(np.mean(np.abs(y) ** 2))
    sigma = np.sqrt(p_sig / 10 ** (24.0 / 10.0) / 2.0)
    y = y + (rng.normal(size=y.size) + 1j * rng.normal(size=y.size)) * sigma
    # 2600-sample impulse burst in field 2's data region
    s0 = 2 * N + 97_000
    y[s0 : s0 + 2600] += (
        rng.normal(size=2600) + 1j * rng.normal(size=2600)
    ) * 4.0
    # capture starts mid-field-0
    y = y[77_777:]

    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(cap), "--sro", "auto", "--cfo", "auto",
         "--trellis", "viterbi", "--erasures", "burst", "-o", str(out)]
    )
    summary = run_decode(args)
    assert abs(summary["sro_ppm"] - 25.0) < 1.0, summary
    assert abs(summary["cfo_hz"] - 400.0) < 2.0, summary
    assert summary["segments_uncorrectable"] == 0, summary
    assert summary["fields_decoded"] >= 2
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1 : 1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_analyze_burst_advice_enables_decode(tmp_path):
    """Advice-to-outcome contract for the burst tier: on a clean capture
    with one strong impulse burst, analyze must advise `--erasures
    burst` and NOT `--trellis viterbi` (the burst-excluded MER is high —
    white noise is not the problem), the unadvised decode must leave
    uncorrectable segments, and decoding with exactly the advised flag
    set must recover the exact TS."""
    from atsc_tpu.cli import (
        build_analyze_argparser,
        build_decode_argparser,
        run_analyze,
        run_decode,
    )

    rng = np.random.default_rng(137)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0].copy()
    s0 = 40_000                       # inside the measured field's data
    iq[s0 : s0 + 3000] += (
        rng.normal(size=3000) + 1j * rng.normal(size=3000)
    ) * 6.0
    cap = tmp_path / "cap.iq"
    np.stack([iq.real, iq.imag], axis=-1).astype(np.float32).tofile(cap)

    rep = run_analyze(build_analyze_argparser().parse_args([str(cap)]))
    assert rep["burst_symbols"] >= 192, rep
    assert "--erasures burst" in rep["decode_flags"], rep
    assert "--trellis viterbi" not in rep["decode_flags"], rep
    assert rep["mer_clean_db"] > 20.0, rep   # burst-excluded air is clean

    out_plain = tmp_path / "plain.ts"
    s_plain = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_plain), "--stats"]
    ))
    assert s_plain["segments_uncorrectable"] > 0, s_plain

    out_adv = tmp_path / "adv.ts"
    argv = ([str(cap), "-o", str(out_adv), "--stats"]
            + rep["decode_flags"].split())
    s_adv = run_decode(build_decode_argparser().parse_args(argv))
    assert s_adv["segments_uncorrectable"] == 0, s_adv
    got = np.fromfile(out_adv, dtype=np.uint8)
    want = ts[: s_adv["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_analyze_gap_filled_capture(tmp_path):
    """A capture that is largely zero-filled (the SDR source zero-fills
    overflow gaps) must not trip the impulse blanker into blanking the
    signal itself (the median over a mostly-zero envelope is ~0; the
    blanker uses the non-zero median + an RMS floor instead)."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze

    rng = np.random.default_rng(151)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)[0]
    y = np.concatenate([np.zeros(N, np.complex64), iq])  # leading gap
    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)
    rep = run_analyze(build_analyze_argparser().parse_args([str(cap)]))
    assert rep.get("blanked_samples", 0) < 1000, rep
    # +-1: the correlator may lock one sample early at the synthetic
    # zero/signal edge; the equalizer absorbs that as a delay tap
    assert abs(rep["align_offset"] - N) <= 1, rep
    assert rep["decodable"], rep


def test_cli_analyze_on_gauntlet_capture(tmp_path):
    """`analyze` triages the same everything-at-once capture: its
    estimates must agree with decode's conditioning (it is the tool that
    predicts which decode flags a capture needs)."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(131)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts)[0]
    y = np.convolve(iq, [0.85 * np.exp(0.7j), 0, 0.12 * np.exp(-1.1j), 0,
                         0.05j])[: iq.size]
    y = y * np.exp(2j * np.pi * 400.0 / P.SAMPLE_RATE * np.arange(y.size))
    y = resample_stream(y, 1.0 / (1.0 + 25e-6))[0]
    p_sig = float(np.mean(np.abs(y) ** 2))
    sigma = np.sqrt(p_sig / 10 ** (24.0 / 10.0) / 2.0)
    y = y + (rng.normal(size=y.size) + 1j * rng.normal(size=y.size)) * sigma
    y = y[77_777:]

    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)
    out = run_analyze(build_analyze_argparser().parse_args([str(cap)]))
    assert abs(out["sro_ppm"] - 25.0) < 3.0, out
    # apparent CFO at this point includes the multipath/noise estimate
    # error; analyze measures it after the SRO resample
    assert abs(out["cfo_hz"] - 400.0) < 30.0, out
    assert out["align_offset"] > 0
    assert out["mer_method"] == "adaptive"
    assert out["decodable"], out     # 24 dB multipath capture: adaptive
    #                                  equalized MER well above threshold
    for f in ("--sro auto", "--cfo auto", "--align auto"):
        assert f in out["decode_flags"], out


def test_cli_analyze_soft_advice_enables_decode(tmp_path):
    """Advice-to-outcome contract for the soft tier: on an AWGN capture
    near the hard-slicing threshold, analyze must advise `--trellis
    viterbi` (measured MER below the ~20 dB advice gate) and neither
    burst nor NTSC advice, the unadvised (hard) decode must leave
    uncorrectable segments, and decoding with exactly the advised flag
    set must recover the exact TS — the ~3.5 dB Viterbi coding gain is
    what closes the gap."""
    from atsc_tpu.cli import (
        build_analyze_argparser,
        build_decode_argparser,
        run_analyze,
        run_decode,
    )

    rng = np.random.default_rng(157)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    p_sig = float(np.mean(np.abs(iq) ** 2))
    sigma = np.sqrt(p_sig / 10 ** (13.0 / 10.0) / 2.0)  # 13 dB SNR
    y = iq + (rng.normal(size=iq.size)
              + 1j * rng.normal(size=iq.size)) * sigma
    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)

    rep = run_analyze(build_analyze_argparser().parse_args([str(cap)]))
    assert rep["mer_db"] < 20.0, rep
    assert "--trellis viterbi" in rep["decode_flags"], rep
    assert "--erasures burst" not in rep["decode_flags"], rep
    assert "--ntsc auto" not in rep["decode_flags"], rep

    out_plain = tmp_path / "plain.ts"
    s_plain = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_plain), "--stats"]
    ))
    assert s_plain["segments_uncorrectable"] > 0, s_plain

    out_adv = tmp_path / "adv.ts"
    argv = ([str(cap), "-o", str(out_adv), "--stats"]
            + rep["decode_flags"].split())
    s_adv = run_decode(build_decode_argparser().parse_args(argv))
    assert s_adv["segments_uncorrectable"] == 0, s_adv
    got = np.fromfile(out_adv, dtype=np.uint8)
    want = ts[: s_adv["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_cli_analyze_ntsc_advice_enables_decode(tmp_path):
    """Advice-to-outcome contract for the NTSC tier: a co-channel tone
    at 0.5x signal RMS must make analyze advise `--ntsc auto` (and drop
    the erasure/soft-trellis advice it supersedes), the unadvised decode
    must fail, and decoding with the advised flags must recover the TS
    exactly."""
    from atsc_tpu.cli import (
        build_analyze_argparser,
        build_decode_argparser,
        run_analyze,
        run_decode,
    )

    rng = np.random.default_rng(149)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0].copy()
    rms = np.sqrt(np.mean(np.abs(iq) ** 2))
    f = P.SAMPLE_RATE / 12 + P.OSC_FREQUENCY
    n = np.arange(iq.shape[-1])
    iq = iq + 0.5 * rms * np.exp(2j * np.pi * f * n / P.SAMPLE_RATE + 0.4j)
    cap = tmp_path / "cap.iq"
    np.stack([iq.real, iq.imag], axis=-1).astype(np.float32).tofile(cap)

    rep = run_analyze(build_analyze_argparser().parse_args([str(cap)]))
    assert rep["ntsc_detected"], rep
    assert "--ntsc auto" in rep["decode_flags"], rep
    assert "--trellis viterbi" not in rep["decode_flags"], rep
    assert "--erasures burst" not in rep["decode_flags"], rep

    out_plain = tmp_path / "plain.ts"
    s_plain = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_plain), "--stats"]
    ))
    assert s_plain["segments_uncorrectable"] > 0, s_plain

    out_adv = tmp_path / "adv.ts"
    argv = ([str(cap), "-o", str(out_adv), "--stats"]
            + rep["decode_flags"].split())
    s_adv = run_decode(build_decode_argparser().parse_args(argv))
    assert s_adv["segments_uncorrectable"] == 0, s_adv
    assert s_adv["ntsc_comb"] is True, s_adv
    got = np.fromfile(out_adv, dtype=np.uint8)
    want = ts[: s_adv["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)
