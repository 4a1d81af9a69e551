"""IQ-domain receiver: ZF-VSB equalizer loopback from the encoder's
complex baseband back to transport-stream bytes, burst-error resilience,
and field-sync detection."""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_to_complex
from atsc_tpu.models.receiver import (
    IqReceiver,
    equalize_span,
    find_field_sync,
    slice_levels,
)
from tests.test_decoder import _encode_symbol_fields, _random_ts

N = P.SYMBOLS_PER_FIELD


def _encode_iq(ts: np.ndarray) -> np.ndarray:
    """(T, B, 58656) -> (B, T*260416) complex64 baseband stream."""
    t, b = ts.shape[:2]
    enc = Encoder(batch=b, donate=False)
    return np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k]))) for k in range(t)],
        axis=-1,
    )


def test_iq_receiver_loopback():
    rng = np.random.default_rng(17)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    rx = IqReceiver(batch=1)
    got = []
    # arbitrary odd chunking exercises the buffer/trim path
    for pos in range(0, iq.shape[1], 100_003):
        got += rx.push(iq[:, pos : pos + 100_003])
    got += rx.flush()
    assert len(got) == 3  # 4 received fields, 1-field latency
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all()
        np.testing.assert_array_equal(out, ts[k])
    # clean loopback needs no RS corrections at all
    assert rx.decoder.segments_corrected == 0


def test_iq_receiver_corrects_burst_dropout():
    rng = np.random.default_rng(23)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts).copy()
    iq[:, int(1.5 * N) : int(1.5 * N) + 30] = 0  # 30-sample dropout
    rx = IqReceiver(batch=1)
    got = rx.push(iq) + rx.flush()
    assert len(got) == 3
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    assert rx.decoder.segments_corrected > 0  # the burst really hit data


def test_equalized_levels_match_transmitted_symbols():
    rng = np.random.default_rng(29)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    fields = _encode_symbol_fields(ts)
    lev = equalize_span(iq, N, first_field=0)  # field 1, full context
    sym = slice_levels(lev)
    np.testing.assert_array_equal(sym[0], fields[1, 0, :N])
    # residual stays well inside the 1.0 decision margin (osc quirk bound)
    true_lev = fields[1, 0, :N].astype(np.float64) * 2 - 7 + P.PILOT_OFFSET
    assert np.abs(lev[0] - true_lev).max() < 0.5


def test_find_field_sync():
    rng = np.random.default_rng(31)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    lev = equalize_span(iq, 0, n_out=3 * N)[0]
    for cut, want_off, want_par in ((0, 0, 0), (1000, N - 1000, 1), (N + 7, N - 7, 0)):
        off, par = find_field_sync(lev[cut:])
        assert off == want_off, (cut, off)
        assert par == want_par, (cut, par)


def test_equalize_field_device_matches_numpy():
    from atsc_tpu.models.receiver import equalize_field_device

    rng = np.random.default_rng(37)
    ts = _random_ts(rng, 3, 2)
    iq = _encode_iq(ts)
    fields = _encode_symbol_fields(ts)
    sym_dev = equalize_field_device(iq, N, first_field=0)
    np.testing.assert_array_equal(sym_dev, fields[1, :, :N])
    np.testing.assert_array_equal(
        sym_dev, slice_levels(equalize_span(iq, N, first_field=0))
    )


def test_eq_profiles_agree():
    """The 'fast' tier (+-128-tap truncation, fused WL dot, reduced matmul
    precision) must slice identically to 'exact' on clean signal and keep
    its soft levels within the truncation bound (~0.03 level worst-case,
    far inside the 1.0 decision margin)."""
    import jax.numpy as jnp

    from atsc_tpu.models.receiver import _device_eq_step, field_window

    rng = np.random.default_rng(41)
    ts = _random_ts(rng, 2, 2)
    iq = _encode_iq(ts)
    win, osc = field_window(iq, 0)
    winj, oscj = jnp.asarray(win), jnp.asarray(osc)
    hard_exact = np.asarray(_device_eq_step(False, profile="exact")(winj, oscj))
    hard_fast = np.asarray(_device_eq_step(False, profile="fast")(winj, oscj))
    np.testing.assert_array_equal(hard_exact, hard_fast)
    soft_exact = np.asarray(_device_eq_step(True, profile="exact")(winj, oscj))
    soft_fast = np.asarray(_device_eq_step(True, profile="fast")(winj, oscj))
    assert np.abs(soft_exact - soft_fast).max() < 0.1

    # end-to-end: the explicit fast profile recovers the TS exactly
    rx = IqReceiver(batch=2, eq_profile="fast")
    got = rx.push(iq) + rx.flush()
    assert len(got) == 1
    np.testing.assert_array_equal(got[0][0], ts[0])


def test_receiver_checkpoint_resume(tmp_path):
    """A receiver checkpointed mid-stream and reloaded continues
    byte-identically (decoder state, stream window, RS stats)."""
    from atsc_tpu.utils.checkpoint import load_receiver, save_receiver

    rng = np.random.default_rng(43)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts).copy()
    iq[:, int(1.5 * N) : int(1.5 * N) + 25] = 0  # force RS corrections

    ref = IqReceiver(batch=1)
    want = ref.push(iq) + ref.flush()

    cut = N + 12345  # mid-field split point
    rx = IqReceiver(batch=1)
    got = rx.push(iq[:, :cut])
    path = str(tmp_path / "rx.npz")
    save_receiver(path, rx)
    rx2 = load_receiver(path)
    got += rx2.push(iq[:, cut:]) + rx2.flush()

    assert len(got) == len(want) == 3
    for (a, na), (b, nb) in zip(got, want):
        np.testing.assert_array_equal(a, b)
        np.testing.assert_array_equal(na, nb)
    assert rx2.decoder.segments_corrected == ref.decoder.segments_corrected


def test_cli_decode_checkpoint_resume(tmp_path):
    from atsc_tpu.cli import main

    rng = np.random.default_rng(47)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    cap = tmp_path / "cap.iq"
    cap.write_bytes(
        np.stack([iq.real, iq.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    ck = tmp_path / "rx.npz"
    # run 1: stop after the first decoded field, checkpointing
    main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
          "--checkpoint-every", "1", "--max-fields", "1"])
    assert ck.exists()
    # run 2: resume to completion; output file is appended
    main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
          "--resume"])
    got = np.fromfile(out, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    assert got.shape[0] == 3
    for k in range(3):
        np.testing.assert_array_equal(got[k], ts[k, 0])


def test_cli_decode_roundtrip(tmp_path):
    from atsc_tpu.cli import main

    rng = np.random.default_rng(41)
    ts = _random_ts(rng, 4, 1)
    ts_path, iq_path, out_path = (
        tmp_path / "in.ts", tmp_path / "cap.iq", tmp_path / "out.ts"
    )
    ts_path.write_bytes(ts[:, 0].tobytes())
    for fmt in ("cf32", "cs8"):
        assert main([str(ts_path), "-o", str(iq_path), "--format", fmt]) == 0
        assert main(["decode", str(iq_path), "-o", str(out_path),
                     "--format", fmt]) == 0
        got = np.fromfile(out_path, dtype=np.uint8)
        # decoder drops the virtual pre-start field -> T-1 fields out
        np.testing.assert_array_equal(
            got, ts[:3, 0].reshape(-1), err_msg=f"format {fmt}"
        )


def test_iq_receiver_burst_erasures_recover_impulse_noise():
    """A 3000-sample strong impulse burst overwhelms errors-only RS
    (measured: ~51 uncorrectable segments) but decodes exactly when the
    slicer-residual burst detector flags it and RS runs with erasures
    (2*errors + erasures <= 20 per segment)."""
    rng = np.random.default_rng(11)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts).copy()
    s0 = N + 40_000
    iq[:, s0 : s0 + 3000] += (
        rng.normal(size=3000) + 1j * rng.normal(size=3000)
    ) * 6.0
    rx = IqReceiver(batch=1, erasures="burst")
    got = rx.push(iq) + rx.flush()
    assert len(got) == 3
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    assert rx.decoder.segments_uncorrectable == 0
    assert rx.decoder.segments_erasure_assisted > 40


def test_iq_receiver_quantized_code_path():
    """push_codes: cs16/cs8 integer wire samples buffered and decoded
    without host dequantization (the equalizer step dequantizes via its
    folded derotation constant) — exact TS either way."""
    from atsc_tpu.ops.quantize import QMAX, quantize_scale

    rng = np.random.default_rng(47)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    for fmt, dt in (("cs16", np.int16), ("cs8", np.int8)):
        s = quantize_scale(fmt)
        codes = np.stack([iq.real, iq.imag], axis=-1) * s
        codes = np.clip(np.round(codes), -QMAX[fmt], QMAX[fmt]).astype(dt)
        rx = IqReceiver(batch=1, wire_format=fmt)
        got = rx.push_codes(codes[:, :100_003]) + rx.push_codes(
            codes[:, 100_003:]
        ) + rx.flush()
        assert len(got) == 2, fmt
        for k, (out, nerr) in enumerate(got):
            assert (nerr >= 0).all(), (fmt, k)
            np.testing.assert_array_equal(out, ts[k], err_msg=fmt)


def test_planar_stream_windows_and_trim():
    from atsc_tpu.models.receiver import _PlanarStream

    rng = np.random.default_rng(53)
    iq = rng.normal(size=(2, 1000)) + 1j * rng.normal(size=(2, 1000))
    st = _PlanarStream(2)
    st.append(iq[:, :137])
    st.append(iq[:, 137:612])
    st.append(iq[:, 612:])
    assert st.end == 1000
    # window spanning all three chunks plus out-of-range context
    w = st.window(-50, 1100)
    assert w.shape == (2, 2, 1150) and w.dtype == np.float32
    np.testing.assert_allclose(w[:, 0, 50:1050], iq.real, atol=1e-7)
    np.testing.assert_allclose(w[:, 1, 50:1050], iq.imag, atol=1e-7)
    assert not w[:, :, :50].any() and not w[:, :, 1050:].any()
    # trim drops whole chunks strictly below keep_from; reads at or
    # above keep_from stay exact
    st.trim(400)
    w2 = st.window(450, 700)  # spans retained chunks 2 and 3
    np.testing.assert_allclose(w2[:, 0], iq.real[:, 450:700], atol=1e-7)
    st.trim(2000)
    assert st.window(0, 10).sum() == 0 and st.base == 1000


def test_cli_decode_multichannel(tmp_path):
    """decode --channels 2: a two-channel interleaved capture (as the
    encoder CLI writes it) decodes both lanes exactly, through the
    quantized cs8 code path."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(59)
    ts = _random_ts(rng, 3, 2)
    a, b, cap, out = (tmp_path / n for n in
                      ("a.ts", "b.ts", "cap.iq", "out.ts"))
    a.write_bytes(ts[:, 0].tobytes())
    b.write_bytes(ts[:, 1].tobytes())
    assert main([str(a), str(b), "-o", str(cap), "--format", "cs8"]) == 0
    assert main(["decode", str(cap), "--channels", "2", "--format", "cs8",
                 "-o", str(out)]) == 0
    got = np.fromfile(out, dtype=np.uint8).reshape(-1, 2, P.FIELD_TS_BYTES)
    np.testing.assert_array_equal(got, ts[:2])


def test_mer_measurement(tmp_path):
    """MER reporting: ~inf-ish on clean loopback, ~SNR under AWGN, and
    surfaced through `decode --stats`."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(53)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)

    rx = IqReceiver(batch=1, measure_mer=True)
    rx.push(iq)
    rx.flush()
    assert rx.mer is not None and rx.mer[0] > 30  # clean: quirk-limited

    # AWGN at ~20 dB SNR in the level domain should read as ~20 dB MER
    sig = np.sqrt(np.mean(np.abs(iq) ** 2))
    noisy = iq + (rng.normal(0, 1, iq.shape) + 1j * rng.normal(0, 1, iq.shape)
                  ) * sig * 10 ** (-20 / 20) / np.sqrt(2)
    rx2 = IqReceiver(batch=1, measure_mer=True)
    rx2.push(noisy)
    rx2.flush()
    assert 17 < rx2.mer[0] < 23

    cap = tmp_path / "cap.iq"
    cap.write_bytes(
        np.stack([iq[0].real, iq[0].imag], -1).astype(np.float32).tobytes()
    )
    args = build_decode_argparser().parse_args(
        [str(cap), "-o", str(tmp_path / "o.ts"), "--stats"]
    )
    summary = run_decode(args)
    assert summary["mer_db"][0] > 30


def test_cli_decode_resume_truncates_post_checkpoint_output(tmp_path):
    """Fields flushed to the output after the last checkpoint must not be
    duplicated on resume: the resume path truncates the file back to the
    checkpointed decode position."""
    import pytest

    from atsc_tpu.cli import main

    rng = np.random.default_rng(59)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    cap = tmp_path / "cap.iq"
    cap.write_bytes(
        np.stack([iq.real, iq.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    ck = tmp_path / "rx.npz"
    main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
          "--checkpoint-every", "1", "--max-fields", "1"])
    # simulate a crash after further fields were flushed post-checkpoint
    with open(out, "ab") as f:
        f.write(bytes(P.FIELD_TS_BYTES))
    main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
          "--resume"])
    got = np.fromfile(out, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    assert got.shape[0] == 3
    for k in range(3):
        np.testing.assert_array_equal(got[k], ts[k, 0])

    # --resume without --checkpoint must refuse, not truncate the output
    with pytest.raises(ValueError, match="requires --checkpoint"):
        main(["decode", str(cap), "-o", str(out), "--resume"])
    assert out.stat().st_size == 3 * P.FIELD_TS_BYTES

    # wrong --format on resume must refuse upfront
    with pytest.raises(ValueError, match="input format"):
        main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
              "--resume", "--format", "cs16"])


def test_cli_decode_resume_restores_numeric_cfo(tmp_path):
    """A numeric --cfo used when the checkpoint was written is restored
    on resume without re-passing the flag (and phase stays continuous)."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(61)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)[0]
    n = np.arange(iq.size)
    cfo = 80.0
    cap_iq = iq * np.exp(2j * np.pi * cfo * n / P.SAMPLE_RATE)
    cap = tmp_path / "cap.iq"
    cap.write_bytes(
        np.stack([cap_iq.real, cap_iq.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    ck = tmp_path / "rx.npz"
    main(["decode", str(cap), "-o", str(out), "--cfo", str(cfo),
          "--checkpoint", str(ck), "--checkpoint-every", "1",
          "--max-fields", "1"])
    main(["decode", str(cap), "-o", str(out), "--checkpoint", str(ck),
          "--resume"])  # no --cfo: must come from the checkpoint
    got = np.fromfile(out, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    assert got.shape[0] == 3
    for k in range(3):
        np.testing.assert_array_equal(got[k], ts[k, 0])
