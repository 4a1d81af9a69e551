"""Adaptive (training-sequence) equalizer: decode through unknown linear
channels — multipath echoes, complex gain/phase — that the fixed ZF
equalizer cannot handle. No reference counterpart (transmit-only)."""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.receiver import IqReceiver
from tests.test_decoder import _random_ts
from tests.test_receiver import _encode_iq

N = P.SYMBOLS_PER_FIELD


def _apply_channel(iq: np.ndarray, h: np.ndarray) -> np.ndarray:
    """y[b, n] = sum_m h[m] iq[b, n-m] (causal FIR channel, zero history)."""
    return np.stack(
        [np.convolve(row, h)[: iq.shape[1]] for row in iq]
    )


def test_adaptive_loopback_clean():
    """Identity channel: the learned equalizer matches the ZF path —
    exact TS recovery with no RS corrections."""
    rng = np.random.default_rng(43)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    rx = IqReceiver(batch=1, backend="adaptive")
    got = rx.push(iq) + rx.flush()
    assert len(got) == 3
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    assert rx.decoder.segments_corrected == 0


def test_adaptive_decodes_through_multipath():
    """Multipath + complex gain + noise: the ZF backend falls over, the
    trained equalizer recovers the transport stream exactly."""
    rng = np.random.default_rng(47)
    ts = _random_ts(rng, 4, 2)
    h = np.zeros(24, np.complex128)
    h[0] = 0.85 * np.exp(0.4j)          # bulk complex gain/phase
    h[7] = 0.2 * np.exp(-1.3j)          # near echo
    h[23] = -0.1 + 0.05j                # far echo
    iq = _apply_channel(_encode_iq(ts), h)
    iq = iq + (rng.normal(size=iq.shape) + 1j * rng.normal(size=iq.shape)) * 0.01

    zf = IqReceiver(batch=2, backend="device")
    zf_out = zf.push(iq) + zf.flush()
    zf_ok = all(
        (nerr >= 0).all() and np.array_equal(out, ts[k])
        for k, (out, nerr) in enumerate(zf_out)
    )
    assert not zf_ok, "channel too benign: ZF already decodes it"

    rx = IqReceiver(batch=2, backend="adaptive")
    got = rx.push(iq) + rx.flush()
    assert len(got) == 3
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])


def test_adaptive_tracks_channel_step():
    """A phase/gain step mid-stream: with forgetting=0 each field trains
    purely on its own 2,068 sync symbols (still 5x overdetermined vs the
    ~369-dim feature span), so the equalizer re-converges within the
    step field itself and every field decodes exactly."""
    rng = np.random.default_rng(53)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts).copy()
    iq[:, 2 * N :] *= 0.8 * np.exp(0.9j)   # step before field 2
    rx = IqReceiver(batch=1, backend="adaptive", forgetting=0.0)
    got = rx.push(iq) + rx.flush()
    assert len(got) == 4
    # field 2 (the step field) trains on its own syncs before being
    # equalized, so even it must decode; RS may do some correcting there
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])


def test_cli_decode_adaptive(tmp_path):
    """`decode --equalizer adaptive` recovers the TS from a capture the
    default ZF frontend cannot handle (complex gain + echo)."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(61)
    ts = _random_ts(rng, 3, 1)
    h = np.array([0.8 * np.exp(0.7j), 0, 0, 0, 0.18 - 0.1j])
    iq = _apply_channel(_encode_iq(ts), h)[0]
    cap = tmp_path / "cap.iq"
    np.stack([iq.real, iq.imag], axis=-1).astype(np.float32).tofile(cap)
    out = tmp_path / "out.ts"
    assert main(["decode", str(cap), "--equalizer", "adaptive",
                 "-o", str(out)]) == 0
    got = np.fromfile(out, dtype=np.uint8)
    np.testing.assert_array_equal(got, ts[:2, 0].reshape(-1))


def test_find_field_sync_iq_phase_robust():
    """Alignment directly on the raw capture survives a 90-degree channel
    rotation (which nulls the real-projection correlator) plus an echo."""
    from atsc_tpu.models.receiver import find_field_sync_iq

    rng = np.random.default_rng(67)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)[0]
    y = np.convolve(iq, [1j, 0, 0, 0.2 * np.exp(0.3j)])[: iq.size]
    for cut, want_off, want_par in ((0, 0, 0), (1000, N - 1000, 1),
                                    (N + 7, N - 7, 0)):
        off, par = find_field_sync_iq(y[cut:])
        assert off == want_off, (cut, off)
        assert par == want_par, (cut, par)


def test_cli_decode_align_auto(tmp_path):
    """`decode --align auto` on a capture that starts mid-field and went
    through a rotated multipath channel: recovers every fully-contained
    TS field."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(71)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    y = np.convolve(iq, [0.9j, 0, 0.15 * np.exp(-0.8j)])[: iq.size]
    cut = 123_457  # mid-field-0: first boundary in the capture = field 1
    cap = tmp_path / "cap.iq"
    seg = y[cut:]
    np.stack([seg.real, seg.imag], axis=-1).astype(np.float32).tofile(cap)
    out = tmp_path / "out.ts"
    assert main(["decode", str(cap), "--align", "auto", "-o", str(out)]) == 0
    got = np.fromfile(out, dtype=np.uint8)
    # received fields 1..3 -> decoded TS fields 1..2 (one-field latency
    # exactly covers the missing interleaver history of field 0)
    np.testing.assert_array_equal(got, ts[1:3, 0].reshape(-1))

    # summary stats count emitted fields only (the discarded pre-start
    # field is pure garbage at a mid-stream start and must not pollute)
    from atsc_tpu.cli import build_decode_argparser, run_decode

    args = build_decode_argparser().parse_args(
        [str(cap), "--align", "auto", "-o", str(out)]
    )
    summary = run_decode(args)
    assert summary["fields_decoded"] == 2
    assert summary["align_offset"] == N - cut % N
    assert summary["align_parity"] == 1
    assert summary["segments_uncorrectable"] == 0


def test_estimate_cfo_from_pilot():
    """Pilot-tone CFO estimation: sub-Hz accuracy from a 2-field capture
    with a deliberately fractional offset."""
    from atsc_tpu.models.receiver import estimate_cfo

    rng = np.random.default_rng(73)
    ts = _random_ts(rng, 2, 1)
    iq = _encode_iq(ts)[0]
    for cfo in (517.3, -1204.8, 0.0):
        n = np.arange(iq.size)
        y = iq * np.exp(2j * np.pi * cfo / P.SAMPLE_RATE * n)
        got = estimate_cfo(y)
        assert abs(got - cfo) < 1.0, (cfo, got)


def test_cli_decode_cfo_auto(tmp_path):
    """`decode --cfo auto --align auto`: a capture with a 400 Hz tuner
    offset, channel distortion, and a mid-field start still yields the
    exact transport stream."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(79)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    y = np.convolve(iq, [0.9 * np.exp(0.6j), 0, 0.12j])[: iq.size]
    y = y * np.exp(2j * np.pi * 400.0 / P.SAMPLE_RATE * np.arange(y.size))
    seg = y[55_555:]
    cap = tmp_path / "cap.iq"
    np.stack([seg.real, seg.imag], axis=-1).astype(np.float32).tofile(cap)
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(cap), "--cfo", "auto", "--align", "auto", "-o", str(out)]
    )
    summary = run_decode(args)
    assert abs(summary["cfo_hz"] - 400.0) < 1.0
    assert summary["fields_decoded"] == 2
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, dtype=np.uint8)
    np.testing.assert_array_equal(got, ts[1:3, 0].reshape(-1))


def test_estimate_sro_and_resample_roundtrip():
    """Sample-rate-offset estimation from sync-peak drift: a capture
    synthesized 37 ppm fast is estimated to < 1 ppm, and rate-1.0
    resampling is an exact (delayed) copy."""
    from atsc_tpu.models.receiver import estimate_sro, resample_stream

    rng = np.random.default_rng(101)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    assert abs(estimate_sro(iq) - 1.0) * 1e6 < 0.5  # no offset -> ~1.0
    cap = resample_stream(iq, 1.0 / (1.0 + 37e-6))
    est = estimate_sro(cap)
    assert abs((est - 1.0) * 1e6 - 37.0) < 1.0, est
    ident = resample_stream(iq, 1.0)
    np.testing.assert_allclose(
        ident[0, :1000], iq[0, 16 : 16 + 1000], atol=1e-9
    )


def test_cli_decode_sro_auto(tmp_path):
    """`decode --sro auto`: a capture recorded with a 37 ppm fast clock
    (plus a rotated channel) is resampled, aligned, and decoded to the
    exact transport stream."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.receiver import resample_stream

    rng = np.random.default_rng(103)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts) * (0.9 * np.exp(0.8j))
    cap = resample_stream(iq, 1.0 / (1.0 + 37e-6))[0]
    path = tmp_path / "cap.iq"
    np.stack([cap.real, cap.imag], axis=-1).astype(np.float32).tofile(path)
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(path), "--sro", "auto", "-o", str(out)]
    )
    summary = run_decode(args)
    assert abs(summary["sro_ppm"] - 37.0) < 1.0, summary
    assert summary["fields_decoded"] >= 2
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, dtype=np.uint8)
    want = ts[1 : 1 + summary["fields_decoded"], 0].reshape(-1)
    np.testing.assert_array_equal(got, want)


def test_train_every_cadence_decodes_multipath():
    """Retrain-cadence tier (train_every=4): one solve serves the next
    3 fields through the apply-only path — a static multipath channel
    still decodes exactly, the cached-tap fields produce the SAME
    symbols as a per-field-trained run (static channel + forgetting=1.0
    means every solve sees the same normal equations), and the solve
    count actually drops (the cadence is real, not cosmetic)."""
    from atsc_tpu.ops import adaptive_eq as ae

    rng = np.random.default_rng(311)
    ts = _random_ts(rng, 8, 1)
    h = np.zeros(24, np.complex128)
    h[0] = 0.9 * np.exp(0.3j)
    h[9] = 0.15 * np.exp(-0.9j)
    iq = _apply_channel(_encode_iq(ts), h)

    rx = IqReceiver(batch=1, backend="adaptive", train_every=4)
    got = rx.push(iq) + rx.flush()
    assert len(got) == 7
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    eq = rx._adaptive
    assert eq.train_every == 4 and eq._fields_seen == 8
    # fields 0 and 4 trained; 1-3 and 5-7 rode the cached taps
    assert eq.taps is not None


def test_train_every_checkpoint_resume_byte_identical(tmp_path):
    """A cadence decode killed mid-stream and resumed from its
    checkpoint must emit byte-identical TS (the cached taps + field
    counter round-trip through save_receiver/load_receiver)."""
    from atsc_tpu.utils.checkpoint import load_receiver, save_receiver

    rng = np.random.default_rng(313)
    ts = _random_ts(rng, 6, 1)
    h = np.zeros(16, np.complex128)
    h[0] = 0.95
    h[5] = 0.18 * np.exp(1.1j)
    iq = _apply_channel(_encode_iq(ts), h)

    full_rx = IqReceiver(batch=1, backend="adaptive", train_every=3)
    full = full_rx.push(iq) + full_rx.flush()

    rx = IqReceiver(batch=1, backend="adaptive", train_every=3)
    split = 3 * N + 1234
    part1 = rx.push(iq[:, :split])
    path = str(tmp_path / "cadence.npz")
    save_receiver(path, rx)
    rx2 = load_receiver(path)
    assert rx2._adaptive.train_every == 3
    assert rx2._adaptive._fields_seen == rx._adaptive._fields_seen
    part2 = rx2.push(iq[:, split:]) + rx2.flush()
    got = part1 + part2
    assert len(got) == len(full)
    for k in range(len(full)):
        np.testing.assert_array_equal(got[k][0], full[k][0])


def test_adaptive_batch_lanes_train_independently():
    """Each batch lane carries its own normal equations: one receiver
    with a clean lane and a heavily-distorted lane decodes both (the
    solved tap vectors must differ — shared taps could not)."""
    rng = np.random.default_rng(59)
    ts = _random_ts(rng, 3, 2)
    iq = _encode_iq(ts).copy()
    iq[1] = np.convolve(iq[1], [0.7 * np.exp(0.5j), 0, 0, 0.15j], "full")[
        : iq.shape[1]
    ]
    rx = IqReceiver(batch=2, backend="adaptive")
    got = rx.push(iq) + rx.flush()
    assert len(got) == 2
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    w = rx._adaptive.taps
    assert np.abs(w[0] - w[1]).max() > 0.1


def test_decision_directed_extends_sensitivity():
    """adaptive-dd near threshold: at 20 dB AWGN over a multipath
    channel the sync-only solve's estimation noise still costs
    uncorrectable segments; the decision-directed second pass (~32k
    reliability-weighted training rows) removes them — exact TS.
    (Measured sweep: plain/dd uncorrectables 932/920 @17 dB, 730/529
    @18, 156/23 @19, 9/0 @20 — a consistent ~1 dB shift.)"""
    rng = np.random.default_rng(61)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    y = np.convolve(
        iq[0], [0.9 * np.exp(0.5j), 0, 0.2 * np.exp(-1.3j), 0, 0.08j]
    )[: iq.shape[1]][None]
    p = float(np.mean(np.abs(y) ** 2))
    noise = rng.normal(size=y.shape) + 1j * rng.normal(size=y.shape)
    cap = y + noise * np.sqrt(p / 10 ** (20.0 / 10.0) / 2.0)

    plain = IqReceiver(batch=1, backend="adaptive")
    got = plain.push(cap) + plain.flush()
    assert plain.decoder.segments_uncorrectable > 0  # sync-only fails here

    dd = IqReceiver(batch=1, backend="adaptive-dd")
    got = dd.push(cap) + dd.flush()
    assert dd.decoder.segments_uncorrectable == 0
    for k, (out, nerr) in enumerate(got):
        np.testing.assert_array_equal(out, ts[k])


def test_slice_built_windows_match_gather():
    """The slice/reshape-built design-matrix windows (_training_windows,
    _strided_windows — the gather-free TPU path) are bit-identical to
    the jnp.take formulation they replaced, on both the sync training
    set and the decision-directed stride-8 set."""
    import jax.numpy as jnp

    from atsc_tpu.ops.adaptive_eq import (
        EQ_HALF,
        EQ_TAPS,
        WINDOW_MARGIN,
        _strided_windows,
        _training_set,
        _training_window_plan,
        _training_windows,
    )

    assert _training_window_plan() is not None  # the structure holds
    rng = np.random.default_rng(5)
    u = jnp.asarray(
        rng.normal(size=(2, N + 2 * WINDOW_MARGIN)).astype(np.float32))

    pos, _ = _training_set()
    idx = (np.asarray(pos)[:, None] + (WINDOW_MARGIN - EQ_HALF)
           + np.arange(EQ_TAPS))
    ref = jnp.take(u, jnp.asarray(idx), axis=-1)
    np.testing.assert_array_equal(
        np.asarray(_training_windows(u, WINDOW_MARGIN)), np.asarray(ref))

    stride = 8
    dd_pos = np.arange(EQ_HALF, N - EQ_HALF, stride)
    idx2 = (dd_pos[:, None] + (WINDOW_MARGIN - EQ_HALF)
            + np.arange(EQ_TAPS))
    ref2 = jnp.take(u, jnp.asarray(idx2), axis=-1)
    got2 = _strided_windows(u, WINDOW_MARGIN, len(dd_pos), stride, EQ_TAPS)
    np.testing.assert_array_equal(np.asarray(got2), np.asarray(ref2))
