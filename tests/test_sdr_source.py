"""SoapySdrSource (runtime/io.py): the live SDR receive input for the
decode CLI. Hardware is absent in CI, so a fake `SoapySDR` module serves
a canned capture — exercising the byte-exact read contract, the stream
hiccup handling, and the full live decode paths (plain and wideband
--demux) including the device rate/bandwidth configuration."""

import sys
import types

import numpy as np
import pytest

from atsc_tpu import params as P
from tests.test_decoder import _random_ts

N = P.SYMBOLS_PER_FIELD


def _install_fake_soapy(monkeypatch, samples: np.ndarray, mtu: int = 4096,
                        hiccups: int = 0, gap_at: int | None = None,
                        gap_len: int = 0, stamp: bool = False) -> dict:
    """Install a fake `SoapySDR` module whose single RX device serves
    `samples` ((n, 2) component pairs) mtu-limited, preceded by `hiccups`
    alternating timeout/overflow results. Reading past the served capture
    raises (a hang becomes a test failure). Returns the dict of recorded
    device settings.

    gap_at/gap_len: after serving gap_at samples, report one overflow
    and silently drop gap_len samples of stream time (the remaining
    samples continue gap_len later). stamp: buffers carry timeNs
    (computed from the virtual stream position at the configured rate),
    letting the source measure such gaps exactly."""
    calls = {}
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = "RX"
    mod.SOAPY_SDR_TX = "TX"
    mod.SOAPY_SDR_TIMEOUT = -1
    mod.SOAPY_SDR_OVERFLOW = -2
    mod.SOAPY_SDR_HAS_TIME = 1 << 2

    class _Result:
        def __init__(self, ret, time_ns=0):
            self.ret = ret
            self.timeNs = time_ns
            self.flags = mod.SOAPY_SDR_HAS_TIME if time_ns else 0

    class Device:
        def __init__(self, dev_args):
            calls["driver"] = dev_args["driver"]
            self._pos = 0
            self._vpos = 0       # virtual stream position (incl. gaps)
            self._gapped = False
            self._hiccups = hiccups

        def setBandwidth(self, d, ch, v):
            calls["bandwidth"] = v

        def setSampleRate(self, d, ch, v):
            calls["rate"] = v

        def setFrequency(self, d, ch, v):
            calls["frequency"] = v

        def setGain(self, d, ch, v):
            calls["gain"] = v

        def setupStream(self, d, fmt):
            calls["format"] = fmt
            return "stream"

        def activateStream(self, s):
            pass

        def getStreamMTU(self, s):
            return mtu

        def readStream(self, s, bufs, num):
            if self._hiccups > 0:
                self._hiccups -= 1
                return _Result(-1 if self._hiccups % 2 else -2)
            if gap_at is not None and not self._gapped and self._pos >= gap_at:
                self._gapped = True
                self._vpos += gap_len  # the drop the overflow reports
                return _Result(-2)
            if self._pos >= samples.shape[0]:
                raise AssertionError("read past the served capture")
            got = min(num, mtu, samples.shape[0] - self._pos)
            if gap_at is not None and not self._gapped:
                got = min(got, gap_at - self._pos)
            t = (int(1e15 + self._vpos / calls["rate"] * 1e9)
                 if stamp else 0)
            bufs[0][:got] = samples[self._pos:self._pos + got]
            self._pos += got
            self._vpos += got
            return _Result(got, t)

        def writeStream(self, s, bufs, num):
            calls["tx_samples"] = calls.get("tx_samples", 0) + num
            return _Result(num)

        def deactivateStream(self, s):
            calls["deactivated"] = True

        def closeStream(self, s):
            calls["closed"] = True

    mod.Device = Device
    monkeypatch.setitem(sys.modules, "SoapySDR", mod)
    return calls


def test_sdr_source_reads_exact_bytes(monkeypatch):
    """read(n) returns exactly n wire bytes across MTU-limited,
    hiccuping device reads, buffering sub-sample remainders."""
    from atsc_tpu.runtime.io import SoapySdrSource

    rng = np.random.default_rng(3)
    samples = rng.normal(size=(10_000, 2)).astype(np.float32)
    calls = _install_fake_soapy(monkeypatch, samples, mtu=777, hiccups=4)
    src = SoapySdrSource(driver="fake", sample_rate=2e6, bandwidth_hz=1e6)
    assert not src.seekable() and src.readable()
    with pytest.raises(ValueError, match="never"):
        src.read()  # sizeless read on a live stream
    wire = samples.tobytes()
    got = b"".join([src.read(5), src.read(8_003), src.read(64_000)])
    assert got == wire[: len(got)]
    assert src.overflows == 2  # hiccups were 2 timeouts + 2 overflows
    assert calls["rate"] == 2e6 and calls["bandwidth"] == 1e6
    assert calls["format"] == "CF32" and calls["driver"] == "fake"
    src.close()
    assert calls["closed"]
    assert src.read(16) == b""  # closed: EOF semantics


def test_sdr_source_fills_timestamped_gaps(monkeypatch):
    """A timestamp discontinuity (overflow-dropped samples) is replaced
    with exactly that many zero samples, keeping the byte stream
    position-true."""
    from atsc_tpu.runtime.io import SoapySdrSource

    rng = np.random.default_rng(5)
    samples = rng.normal(size=(20_000, 2)).astype(np.float32)
    gap_at, gap_len = 7_000, 1_234
    _install_fake_soapy(monkeypatch, samples, mtu=999, gap_at=gap_at,
                        gap_len=gap_len, stamp=True)
    src = SoapySdrSource(driver="fake", sample_rate=2e6, bandwidth_hz=1e6)
    total = samples.shape[0] + gap_len
    got = np.frombuffer(src.read(total * 8), np.float32).reshape(-1, 2)
    np.testing.assert_array_equal(got[:gap_at], samples[:gap_at])
    assert not got[gap_at : gap_at + gap_len].any()  # the zero fill
    np.testing.assert_array_equal(got[gap_at + gap_len :], samples[gap_at:])
    assert src.gaps_filled == 1 and src.gap_samples == gap_len
    assert src.overflows == 1


def test_sdr_source_no_fill_without_stamps(monkeypatch):
    """Without buffer timestamps a gap is unmeasurable: no zeros are
    invented (the receiver's resync='auto' is the recovery path)."""
    from atsc_tpu.runtime.io import SoapySdrSource

    rng = np.random.default_rng(7)
    samples = rng.normal(size=(4_000, 2)).astype(np.float32)
    _install_fake_soapy(monkeypatch, samples, mtu=777, gap_at=1_500,
                        gap_len=999, stamp=False)
    src = SoapySdrSource(driver="fake", sample_rate=2e6, bandwidth_hz=1e6)
    got = np.frombuffer(src.read(samples.shape[0] * 8), np.float32)
    np.testing.assert_array_equal(got.reshape(-1, 2), samples)
    assert src.gaps_filled == 0 and src.gap_samples == 0
    assert src.overflows == 1


def test_sdr_source_ignores_unflagged_stamps(monkeypatch):
    """timeNs without SOAPY_SDR_HAS_TIME in the result flags is undefined
    (a stale driver value): it must not trigger zero-fill."""
    from atsc_tpu.runtime.io import SoapySdrSource

    rng = np.random.default_rng(9)
    samples = rng.normal(size=(5_000, 2)).astype(np.float32)
    _install_fake_soapy(monkeypatch, samples, mtu=777, gap_at=2_000,
                        gap_len=777, stamp=True)
    import sys as _sys
    fake = _sys.modules["SoapySDR"]
    # stamps present but never flagged valid
    dev_cls = fake.Device
    orig_read = dev_cls.readStream

    def read_noflag(self, s, bufs, num):
        res = orig_read(self, s, bufs, num)
        res.flags = 0
        return res

    dev_cls.readStream = read_noflag
    src = SoapySdrSource(driver="fake", sample_rate=2e6, bandwidth_hz=1e6)
    got = np.frombuffer(src.read(samples.shape[0] * 8), np.float32)
    np.testing.assert_array_equal(got.reshape(-1, 2), samples)
    assert src.gaps_filled == 0 and src.gap_samples == 0


def test_cli_decode_live(monkeypatch, tmp_path):
    """`decode soapy:<driver>` captures live at the symbol rate / 6 MHz
    bandwidth and decodes to exact TS bytes."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.encoder import Encoder, iq_to_complex

    rng = np.random.default_rng(149)
    t = 3
    ts = _random_ts(rng, t, 1)
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k])))[0] for k in range(t)]
    )
    samples = np.stack([iq.real, iq.imag], -1).astype(np.float32)
    pad = np.zeros((N, 2), np.float32)  # slack past the stop point
    calls = _install_fake_soapy(
        monkeypatch, np.concatenate([samples, pad]), mtu=65_536
    )
    out = tmp_path / "live.ts"
    s = run_decode(build_decode_argparser().parse_args(
        ["soapy:fake", "-o", str(out), "--max-fields", "2", "--stats"]
    ))
    assert s["fields_decoded"] == 2
    assert s["segments_uncorrectable"] == 0
    assert calls["rate"] == P.SAMPLE_RATE and calls["bandwidth"] == 6e6
    assert calls["driver"] == "fake" and calls["deactivated"]
    got = np.fromfile(out, np.uint8).reshape(-1, ts.shape[-1])
    np.testing.assert_array_equal(got, ts[:2, 0])


def test_cli_decode_live_overflow_gap_filled(monkeypatch, tmp_path):
    """A live decode rides straight through a timestamped overflow gap:
    the source zero-fills the measured drop, the field tracker keeps its
    position, and RS corrects the zeroed span — exact TS, no resync."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.models.encoder import Encoder, iq_to_complex

    rng = np.random.default_rng(157)
    t = 4
    ts = _random_ts(rng, t, 1)
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k])))[0] for k in range(t)]
    )
    samples = np.stack([iq.real, iq.imag], -1).astype(np.float32)
    pad = np.zeros((N, 2), np.float32)
    gap_at, gap_len = int(1.5 * N), 600
    # the device drops gap_len samples at gap_at: serve the stream with
    # that span excised, timestamped so the source can measure it
    served = np.concatenate(
        [samples[:gap_at], samples[gap_at + gap_len :], pad]
    )
    calls = _install_fake_soapy(monkeypatch, served, mtu=65_536,
                                gap_at=gap_at, gap_len=gap_len, stamp=True)
    out = tmp_path / "live.ts"
    s = run_decode(build_decode_argparser().parse_args(
        ["soapy:fake", "-o", str(out), "--max-fields", "3", "--stats"]
    ))
    assert s["gaps_filled"] == 1 and s["gap_samples"] == gap_len
    assert s["overflows"] == 1
    assert s["segments_uncorrectable"] == 0
    assert s["segments_corrected"] > 0  # the zeroed span really hit data
    assert calls["rate"] == P.SAMPLE_RATE
    got = np.fromfile(out, np.uint8).reshape(-1, ts.shape[-1])
    np.testing.assert_array_equal(got, ts[:3, 0])


def test_cli_decode_demux_live(monkeypatch, tmp_path):
    """`decode soapy --demux B` runs the SDR at the B*6 MHz multiplex
    rate and round-trips every slot's TS from a live wideband capture."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_mux import _mux_fields

    rng = np.random.default_rng(151)
    b, t = 2, 4
    ts = _random_ts(rng, t, b)
    m = _mux_fields(ts)
    samples = np.ascontiguousarray(
        np.stack([m[0], m[1]], -1).astype(np.float32)
    )
    pad = np.zeros((1 << 20, 2), np.float32)
    calls = _install_fake_soapy(
        monkeypatch, np.concatenate([samples, pad]), mtu=65_536
    )
    out = tmp_path / "live.ts"
    s = run_decode(build_decode_argparser().parse_args(
        ["soapy", "-o", str(out), "--demux", str(b),
         "--max-fields", "2", "--stats"]
    ))
    assert calls["rate"] == b * 6e6 and calls["bandwidth"] == b * 6e6
    assert s["segments_uncorrectable"] == 0
    assert s["fields_decoded"] >= 2
    got = np.fromfile(out, np.uint8).reshape(-1, b, P.FIELD_TS_BYTES)
    np.testing.assert_array_equal(got[:2], ts[:2])


def test_cli_decode_live_flag_validation(monkeypatch, tmp_path):
    """Live-incompatible flags fail fast before any device is opened."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    def parse(*extra):
        return build_decode_argparser().parse_args(
            ["soapy", "-o", str(tmp_path / "o.ts"), *extra]
        )

    with pytest.raises(ValueError, match="single-channel"):
        run_decode(parse("-c", "2"))
    with pytest.raises(ValueError, match="live"):
        run_decode(parse("--sro", "auto"))
    with pytest.raises(ValueError, match="live"):
        run_decode(parse("--checkpoint", str(tmp_path / "c"), "--resume"))
    with pytest.raises(ValueError, match="single-channel"):
        run_decode(parse("--mesh", "2x1", "-c", "2"))


def test_cli_encode_soapy_ppm_keeps_nominal_clock(monkeypatch, tmp_path):
    """--ppm stretches the sample stream but must NOT stretch the SDR
    hardware clock, or the emulated SRO cancels on air. The device runs at
    the nominal symbol rate while more-than-nominal samples are written."""
    from fractions import Fraction

    from atsc_tpu.cli import run
    from atsc_tpu.ops.resample import SYMBOL_RATE_FRACTION
    from atsc_tpu.utils.config import EncoderConfig

    calls = _install_fake_soapy(monkeypatch, np.zeros((1, 2), np.float32))
    ts_path = tmp_path / "in.ts"
    rng = np.random.default_rng(21)
    data = rng.integers(0, 256, size=P.FIELD_TS_BYTES, dtype=np.uint8)
    data[:: 188] = 0x47
    data.tofile(ts_path)

    ppm = 400.0
    run(EncoderConfig(sink="soapy:fake", ppm=ppm), [str(ts_path)],
        max_fields=1)
    # hardware clock: nominal, not 1+ppm/1e6 x nominal
    assert calls["rate"] == float(SYMBOL_RATE_FRACTION)
    # but the emitted stream IS stretched: more samples than one field
    # (minus the flush cap's ~half-filter edge trim)
    stretched = P.SYMBOLS_PER_FIELD * (1 + Fraction(ppm) / 10**6)
    assert P.SYMBOLS_PER_FIELD < calls["tx_samples"] <= int(stretched)
    # whereas --rate (an explicit master clock) DOES set the hardware rate
    calls2 = _install_fake_soapy(monkeypatch, np.zeros((1, 2), np.float32))
    run(EncoderConfig(sink="soapy:fake", rate=12_000_000), [str(ts_path)],
        max_fields=1)
    assert calls2["rate"] == 12e6


def test_cli_analyze_live_capture(monkeypatch):
    """`analyze soapy:fake` grabs a few fields off the (fake) SDR and
    reports signal quality — the live station-triage workflow."""
    from atsc_tpu.cli import build_analyze_argparser, run_analyze
    from atsc_tpu.models.encoder import Encoder, iq_to_complex

    rng = np.random.default_rng(23)
    ts = rng.integers(0, 256, size=(6, 1, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts[..., :: 188] = 0x47
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k]))) for k in range(6)],
        axis=-1,
    )[0]
    samples = np.stack([iq.real, iq.imag], axis=-1).astype(np.float32)
    calls = _install_fake_soapy(monkeypatch, samples, mtu=65_536)

    out = run_analyze(build_analyze_argparser().parse_args(
        ["soapy:fake", "--fields", "4"]))
    assert calls["driver"] == "fake" and calls["format"] == "CF32"
    assert calls["rate"] == P.SAMPLE_RATE
    assert out["align_offset"] == 0 and out["mer_db"] > 30
    assert out["decodable"]
