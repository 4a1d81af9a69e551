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
                        hiccups: int = 0) -> dict:
    """Install a fake `SoapySDR` module whose single RX device serves
    `samples` ((n, 2) component pairs) mtu-limited, preceded by `hiccups`
    alternating timeout/overflow results. Reading past the served capture
    raises (a hang becomes a test failure). Returns the dict of recorded
    device settings."""
    calls = {}
    mod = types.ModuleType("SoapySDR")
    mod.SOAPY_SDR_RX = "RX"
    mod.SOAPY_SDR_TX = "TX"
    mod.SOAPY_SDR_TIMEOUT = -1
    mod.SOAPY_SDR_OVERFLOW = -2

    class _Result:
        def __init__(self, ret):
            self.ret = ret

    class Device:
        def __init__(self, dev_args):
            calls["driver"] = dev_args["driver"]
            self._pos = 0
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
            if self._pos >= samples.shape[0]:
                raise AssertionError("read past the served capture")
            got = min(num, mtu, samples.shape[0] - self._pos)
            bufs[0][:got] = samples[self._pos:self._pos + got]
            self._pos += got
            return _Result(got)

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
