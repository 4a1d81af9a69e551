"""FDM multiplexer (ops/mux.py): exact 6-MHz slot raster, streaming
continuity, CLI integration, and the demux round trip back to exact TS
bytes through the adaptive receiver."""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder
from atsc_tpu.models.receiver import IqReceiver
from atsc_tpu.ops.mux import SLOT_HZ, FdmMuxer, demux_slot
from tests.test_decoder import _random_ts

N = P.SYMBOLS_PER_FIELD


def _mux_fields(ts: np.ndarray) -> np.ndarray:
    """(T, B, 58656) -> (2, M) planar multiplex at B*6 MHz."""
    t, b = ts.shape[:2]
    enc = Encoder(batch=b, donate=False)
    mux = FdmMuxer(b)
    chunks = [
        mux.push(np.asarray(enc.encode(ts[k]))[:, :, :N]) for k in range(t)
    ]
    chunks.append(mux.flush())
    return np.concatenate(chunks, axis=-1)


def test_mux_rate_and_pilots():
    """Output sample count matches the exact 286*B/513 ratio and every
    slot's pilot tone lands at slot_center + the pilot offset."""
    rng = np.random.default_rng(107)
    b, t = 3, 2
    ts = _random_ts(rng, t, b)
    m = _mux_fields(ts)
    n_in = t * N
    expect = int(np.ceil(n_in / 513)) * 286 * b
    assert m.shape == (2, expect)

    x = m[0] + 1j * m[1]
    n = min(x.size, 1 << 20)
    spec = np.abs(np.fft.fft(x[:n] * np.hanning(n)))
    freqs = np.fft.fftfreq(n, 1.0 / (b * SLOT_HZ))
    half = b * SLOT_HZ / 2
    for k in range(b):
        f_exp = (k - (b - 1) / 2) * SLOT_HZ + P.OSC_FREQUENCY
        f_exp = (f_exp + half) % (2 * half) - half     # wrap into Nyquist
        band = np.nonzero(np.abs(freqs - f_exp) <= 50e3)[0]
        pk = band[np.argmax(spec[band])]
        assert abs(freqs[pk] - f_exp) < 200.0, (k, freqs[pk], f_exp)
        assert spec[pk] > 0.5 * spec.max()             # a real pilot peak


def test_mux_demux_roundtrip_exact_ts():
    """Every slot of a 3-channel multiplex decodes back to its exact
    transport stream (demux -> adaptive equalizer), with zero RS
    corrections — the mux+demux chain is transparent."""
    rng = np.random.default_rng(109)
    b, t = 3, 3
    ts = _random_ts(rng, t, b)
    m = _mux_fields(ts)
    for slot in range(b):
        bb = demux_slot(m, slot, b)
        rx = IqReceiver(batch=1, backend="adaptive")
        got = rx.push(bb[None]) + rx.flush()
        assert rx.decoder.segments_uncorrectable == 0
        assert len(got) >= t - 1
        for k in range(t - 1):
            np.testing.assert_array_equal(got[k][0][0], ts[k, slot])


def test_mux_streaming_continuity():
    """Pushing in odd-sized chunks equals one-shot multiplexing (the
    513-block remainder and resampler halo carry across pushes)."""
    rng = np.random.default_rng(113)
    b = 2
    ts = _random_ts(rng, 2, b)
    enc = Encoder(batch=b, donate=False)
    iq = np.concatenate(
        [np.asarray(enc.encode(ts[k]))[:, :, :N] for k in range(2)], axis=-1
    )
    one = FdmMuxer(b)
    whole = np.concatenate([one.push(iq), one.flush()], axis=-1)
    chunked = FdmMuxer(b)
    parts = []
    for pos in range(0, iq.shape[-1], 77_777):
        parts.append(chunked.push(iq[:, :, pos : pos + 77_777]))
    parts.append(chunked.flush())
    np.testing.assert_allclose(
        np.concatenate(parts, axis=-1), whole, atol=1e-6
    )


def test_cli_encode_mux(tmp_path):
    """`encode --mux` emits one wideband stream; demuxing a slot decodes
    to the input TS."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(127)
    ts = _random_ts(rng, 3, 2)
    a, c = tmp_path / "a.ts", tmp_path / "b.ts"
    a.write_bytes(ts[:, 0].tobytes())
    c.write_bytes(ts[:, 1].tobytes())
    out = tmp_path / "wide.iq"
    assert main([str(a), str(c), "-o", str(out), "--mux"]) == 0
    raw = np.fromfile(out, np.float32).reshape(-1, 2)
    m = np.stack([raw[:, 0], raw[:, 1]])
    assert m.shape[1] == int(np.ceil(3 * N / 513)) * 286 * 2
    bb = demux_slot(m, 1, 2)
    rx = IqReceiver(batch=1, backend="adaptive")
    got = rx.push(bb[None]) + rx.flush()
    assert rx.decoder.segments_uncorrectable == 0
    for k in range(2):
        np.testing.assert_array_equal(got[k][0][0], ts[k, 1])


def test_cli_mux_checkpoint_resume(tmp_path):
    """`encode --mux --checkpoint` + `--resume`: the muxer's carry
    (resampler halo + block remainder) rides the checkpoint, so the
    concatenated interrupted+resumed multiplex equals the uninterrupted
    run byte-for-byte. A mid-stream checkpointed stop must NOT flush the
    carry (the resumed run renders it from real data)."""
    from atsc_tpu.cli import main

    rng = np.random.default_rng(137)
    ts = _random_ts(rng, 4, 2)
    a, c = tmp_path / "a.ts", tmp_path / "b.ts"
    a.write_bytes(ts[:, 0].tobytes())
    c.write_bytes(ts[:, 1].tobytes())
    full, p1, p2 = (tmp_path / n for n in ("full.iq", "p1.iq", "p2.iq"))
    ck = str(tmp_path / "state.npz")
    assert main([str(a), str(c), "-o", str(full), "--mux"]) == 0
    # --fields-per-step 1 makes --max-fields a true mid-stream interrupt
    # (with the default 8-field step the whole input encodes in one step)
    assert main([str(a), str(c), "-o", str(p1), "--mux",
                 "--fields-per-step", "1",
                 "--max-fields", "2", "--checkpoint", ck]) == 0
    assert main([str(a), str(c), "-o", str(p2), "--mux",
                 "--resume", "--checkpoint", ck]) == 0
    assert p1.stat().st_size and p2.stat().st_size  # a genuine split
    got = p1.read_bytes() + p2.read_bytes()
    assert got == full.read_bytes()

    # mismatched resume modes are refused
    import pytest

    with pytest.raises(ValueError, match="disagree"):
        main([str(a), str(c), "-o", str(p2), "--resume",
              "--checkpoint", ck])


def test_fdm_demuxer_device_roundtrip():
    """The device-side demuxer (banded-matmul filter/resample + period-2B
    mixdown) recovers every slot exactly through one batched adaptive
    receiver, and streams chunk-size-independently."""
    from atsc_tpu.ops.mux import FdmDemuxer

    rng = np.random.default_rng(131)
    b, t = 3, 3
    ts = _random_ts(rng, t, b)
    m = _mux_fields(ts)

    dmx = FdmDemuxer(b)
    bb = np.concatenate([dmx.push(m), dmx.flush()], axis=-1)
    rx = IqReceiver(batch=b, backend="adaptive")
    got = rx.push(bb) + rx.flush()
    assert rx.decoder.segments_uncorrectable == 0
    for k in range(t - 1):
        np.testing.assert_array_equal(got[k][0], ts[k])

    d2 = FdmDemuxer(b)
    parts = [d2.push(m[:, p : p + 99_991])
             for p in range(0, m.shape[-1], 99_991)]
    parts.append(d2.flush())
    bb2 = np.concatenate(parts, axis=-1)
    np.testing.assert_allclose(bb2[:, : bb.shape[-1]], bb, atol=1e-6)


def test_cli_decode_demux(tmp_path):
    """`decode --demux B` turns a wideband multiplex capture back into
    B channel-interleaved transport streams."""
    from atsc_tpu.cli import build_decode_argparser, main, run_decode

    rng = np.random.default_rng(137)
    ts = _random_ts(rng, 3, 2)
    a, c = tmp_path / "a.ts", tmp_path / "b.ts"
    a.write_bytes(ts[:, 0].tobytes())
    c.write_bytes(ts[:, 1].tobytes())
    wide = tmp_path / "wide.iq"
    assert main([str(a), str(c), "-o", str(wide), "--mux"]) == 0
    out = tmp_path / "out.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(wide), "-o", str(out), "--demux", "2", "--stats"]
    ))
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, np.uint8).reshape(-1, 2, P.FIELD_TS_BYTES)
    assert got.shape[0] == 2
    for k in range(2):
        np.testing.assert_array_equal(got[k], ts[k])


def test_cli_decode_demux_first_field(tmp_path):
    """`decode --demux --first-field 1` decodes a multiplex capture whose
    stream starts at an odd field (regression: the flag used to be
    silently dropped by the demux path, leaving parity/oscillator epoch
    at 0)."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(139)
    b, t = 2, 3
    ts = _random_ts(rng, t, b)
    enc = Encoder(batch=b, donate=False)
    iq = np.concatenate(
        [np.asarray(enc.encode(ts[k]))[:, :, :N] for k in range(t)], axis=-1
    )
    # drop field 0: the capture now begins at field 1 (odd parity,
    # oscillator epoch at global sample N)
    mux = FdmMuxer(b)
    m = np.concatenate([mux.push(iq[:, :, N:]), mux.flush()], axis=-1)
    wide = tmp_path / "odd.iq"
    np.stack([m[0], m[1]], axis=-1).astype(np.float32).tofile(wide)
    out = tmp_path / "out.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(wide), "-o", str(out), "--demux", str(b), "--first-field", "1"]
    ))
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, np.uint8).reshape(-1, b, P.FIELD_TS_BYTES)
    assert got.shape[0] >= t - 2
    for k in range(t - 2):
        np.testing.assert_array_equal(got[k], ts[k + 1])


def test_cli_decode_demux_rate(tmp_path):
    """`encode --mux --rate 16e6` -> `decode --demux 2 --rate 16e6`: a
    wideband headend capture at an arbitrary SDR master clock decodes
    every slot back to exact TS (streaming rate conversion to the 12 MHz
    multiplex rate, PN511 band alignment off slot 0, adaptive
    equalization absorbing the conversion's fractional bulk delay). The
    round-trip resampler delay pushes the capture epoch past field 0's
    sync, so decoding starts at field 1 (the mid-stream contract)."""
    from atsc_tpu.cli import build_decode_argparser, main, run_decode

    rng = np.random.default_rng(151)
    t, b = 4, 2
    ts = _random_ts(rng, t, b)
    a, c = tmp_path / "a.ts", tmp_path / "b.ts"
    a.write_bytes(ts[:, 0].tobytes())
    c.write_bytes(ts[:, 1].tobytes())
    cap = tmp_path / "wide16.iq"
    assert main([str(a), str(c), "--mux", "-o", str(cap),
                 "--rate", "16e6"]) == 0
    out = tmp_path / "out.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(cap), "--demux", "2", "--rate", "16e6", "-o", str(out)]
    ))
    assert summary["segments_uncorrectable"] == 0
    assert summary["align_parity"] == 1
    assert abs(summary["resample_rate"] - 16e6 / 12e6) < 1e-12
    m = summary["fields_decoded"]
    assert m >= t - 2
    got = np.fromfile(out, np.uint8).reshape(-1, b, P.FIELD_TS_BYTES)
    for k in range(m):
        np.testing.assert_array_equal(got[k], ts[k + 1])


def test_cli_decode_demux_flag_validation(tmp_path):
    """Usage errors on the demux path fail fast and do NOT clobber an
    existing output file (regression: fout used to be opened/truncated
    before the receiver validated its flag combination)."""
    import pytest

    from atsc_tpu.cli import build_decode_argparser, run_decode

    cap = tmp_path / "cap.iq"
    cap.write_bytes(b"\0" * 64)
    out = tmp_path / "out.ts"
    payload = b"precious bytes"
    out.write_bytes(payload)

    def parse(*extra):
        return build_decode_argparser().parse_args(
            [str(cap), "-o", str(out), *extra]
        )

    with pytest.raises(ValueError, match="slot count"):
        run_decode(parse("--demux", "-2"))
    with pytest.raises(ValueError, match="resume"):
        run_decode(parse("--demux", "2", "--resume"))
    with pytest.raises(ValueError, match="soft trellis"):
        run_decode(parse("--demux", "2", "--viterbi-chunks", "24"))
    with pytest.raises(ValueError):
        run_decode(parse("--demux", "2", "--ntsc", "comb",
                         "--erasures", "burst"))
    assert out.read_bytes() == payload  # no truncation on any usage error


def test_write_planar_preserves_full_chunk_length():
    """_write_planar must not truncate a multiplex/resampled chunk to one
    field's sample count on the raw-sink branch (regression:
    iq_interleave slices to SYMBOLS_PER_FIELD, dropping the surplus)."""
    from atsc_tpu.cli import _write_planar

    class StubSink:
        def __init__(self):
            self.samples = 0

        def write(self, arr):
            assert arr.shape[-1] == 2  # interleaved (I, Q) wire layout
            self.samples += arr.shape[-2] * arr.shape[0]

    m = N + 29_588  # a realistic B=2 per-field multiplex chunk length
    sink = StubSink()
    _write_planar(sink, np.zeros((1, 2, m), np.float32))
    assert sink.samples == m


def test_cli_demux_checkpoint_resume(tmp_path):
    """`decode --demux --checkpoint` + `--resume`: the demuxer carry and
    the wideband read cursor ride the receiver checkpoint, so the
    interrupted+resumed decode writes the same bytes as the
    uninterrupted run."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(139)
    ts = _random_ts(rng, 5, 2)
    m = _mux_fields(ts)
    cap = tmp_path / "wide.iq"
    np.ascontiguousarray(
        np.stack([m[0], m[1]], -1).astype(np.float32)
    ).tofile(cap)

    full = tmp_path / "full.ts"
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "--demux", "2", "-o", str(full)]
    ))
    part = tmp_path / "part.ts"
    ck = str(tmp_path / "rx.npz")
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "--demux", "2", "-o", str(part),
         "--checkpoint", ck, "--checkpoint-every", "1",
         "--max-fields", "2"]
    ))
    assert 0 < part.stat().st_size < full.stat().st_size  # a real split
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "--demux", "2", "-o", str(part),
         "--checkpoint", ck, "--resume"]
    ))
    assert part.read_bytes() == full.read_bytes()
    got = np.frombuffer(full.read_bytes(), np.uint8).reshape(
        -1, 2, P.FIELD_TS_BYTES
    )
    for k in range(got.shape[0]):
        np.testing.assert_array_equal(got[k], ts[k])
