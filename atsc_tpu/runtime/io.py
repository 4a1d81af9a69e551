"""ctypes bindings for the native tsio runtime, with build-on-first-use and
a pure-Python fallback so the framework works without a toolchain.

The native path keeps TS ingestion and IQ emission on C++ threads (no GIL),
with ring-buffer back-pressure mirroring the reference's blocking
fread/writeStream loop (reference util/atsc_encoder.cpp:83-101).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "tsio.cpp")
# ATSC_TPU_TSIO_SO points the loader at an alternate build of the runtime
# (e.g. the ASAN/TSAN-instrumented libraries `make sanitize` produces);
# such a library is used as-is, never rebuilt here.
_SO_OVERRIDE = os.environ.get("ATSC_TPU_TSIO_SO")
_SO = _SO_OVERRIDE or os.path.join(_DIR, "libtsio.so")

_lib: Optional[ctypes.CDLL] = None
_lib_lock = threading.Lock()


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-pthread",
             _SRC, "-o", _SO],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        if _SO_OVERRIDE:
            if not os.path.exists(_SO):
                return None
        elif (not os.path.exists(_SO)
              or os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            if not _build():
                return None
        lib = ctypes.CDLL(_SO)
        lib.ts_reader_open.restype = ctypes.c_void_p
        lib.ts_reader_open.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
        lib.ts_reader_read.restype = ctypes.c_size_t
        lib.ts_reader_read.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int]
        lib.ts_reader_eof.restype = ctypes.c_int
        lib.ts_reader_eof.argtypes = [ctypes.c_void_p]
        lib.ts_reader_bytes.restype = ctypes.c_uint64
        lib.ts_reader_bytes.argtypes = [ctypes.c_void_p]
        lib.ts_reader_close.argtypes = [ctypes.c_void_p]
        lib.iq_sink_open.restype = ctypes.c_void_p
        lib.iq_sink_open.argtypes = [
            ctypes.c_char_p, ctypes.c_size_t, ctypes.c_double]
        lib.iq_sink_write.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t]
        lib.iq_sink_write_planar.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_size_t,
            ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t]
        lib.iq_sink_bytes.restype = ctypes.c_uint64
        lib.iq_sink_bytes.argtypes = [ctypes.c_void_p]
        lib.iq_sink_close.argtypes = [ctypes.c_void_p]
        if hasattr(lib, "phasor_replay"):    # absent in stale .so builds
            lib.phasor_replay.restype = None
            lib.phasor_replay.argtypes = [
                ctypes.c_float, ctypes.c_float, ctypes.c_uint64,
                ctypes.POINTER(ctypes.c_float)]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


def phasor_replay_native(scale: complex, k: int) -> complex | None:
    """Replay k float32 phasor-recurrence steps in the native runtime
    (~4 ms at k = 1e6 vs ~1 s for the Python scalar loop) — or None when
    the library is unavailable or predates the symbol. The caller
    (tables/oscillator.py) verifies bit-identity against the numpy
    replay once per process before trusting it."""
    lib = _load()
    if lib is None or not hasattr(lib, "phasor_replay"):
        return None
    out = (ctypes.c_float * 2)()
    lib.phasor_replay(ctypes.c_float(scale.real), ctypes.c_float(scale.imag),
                      ctypes.c_uint64(k), out)
    return complex(np.complex64(out[0] + 1j * out[1]))


def _rtp_strip(dgram: bytes) -> bytes:
    """Strip an RTP wrap (RFC 3550 / SMPTE 2022-2) if present: version-2
    header followed by a 0x47-aligned n*188 TS payload."""
    if len(dgram) >= 13 and (dgram[0] >> 6) == 2:
        hdr = 12 + 4 * (dgram[0] & 0x0F)
        if (len(dgram) > hdr and dgram[hdr] == 0x47
                and (len(dgram) - hdr) % 188 == 0):
            return dgram[hdr:]
    return dgram


class _UdpTs:
    """Fallback 'udp://[group]:port' TS source (datagram-aligned, RTP
    auto-stripped) — same contract as the native socket path in tsio.cpp."""

    def __init__(self, spec: str):
        import socket

        host, _, port = spec.rpartition(":")
        self._sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        self._sock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        mcast = False
        if host:
            first = int(host.split(".", 1)[0])
            mcast = 224 <= first <= 239
        self._sock.bind(("" if (not host or mcast) else host, int(port)))
        if mcast:
            import struct

            req = struct.pack("4s4s", socket.inet_aton(host),
                              socket.inet_aton("0.0.0.0"))
            self._sock.setsockopt(socket.IPPROTO_IP,
                                  socket.IP_ADD_MEMBERSHIP, req)
        self._pend = bytearray()
        self.name = f"udp://{spec}"

    def read(self, n: int) -> bytes:
        while len(self._pend) < n:
            self._pend.extend(_rtp_strip(self._sock.recv(65536)))
        out = bytes(self._pend[:n])
        del self._pend[:n]
        return out

    def close(self) -> None:
        self._sock.close()


class TsReader:
    """Aligned TS byte source. path '-' = stdin, 'udp://[group]:port' for
    a live UDP/RTP headend feed (multicast groups are joined)."""

    def __init__(self, path: str, ring_bytes: int = 8 << 20):
        lib = _load()
        self._lib = lib
        self._h = None
        if lib is not None:
            h = lib.ts_reader_open(path.encode(), ring_bytes)
            if not h:
                raise FileNotFoundError(path)
            self._h = ctypes.c_void_p(h)
        elif path.startswith("udp://"):
            self._fp = _UdpTs(path[len("udp://"):])
        else:  # pure-Python fallback
            import sys

            self._fp = sys.stdin.buffer if path == "-" else open(path, "rb")

    def read(self, n: int, blocking: bool = True) -> bytes:
        """Read up to n bytes; b'' on EOF."""
        if self._h is not None:
            buf = (ctypes.c_uint8 * n)()
            got = self._lib.ts_reader_read(self._h, buf, n, 1 if blocking else 0)
            return bytes(buf[:got])
        data = self._fp.read(n)
        return data or b""

    def eof(self) -> bool:
        if self._h is not None:
            return bool(self._lib.ts_reader_eof(self._h))
        return False

    def close(self) -> None:
        if self._h is not None:
            self._lib.ts_reader_close(self._h)
            self._h = None
        elif hasattr(self, "_fp") and self._fp is not None:
            if self._fp.name != "<stdin>":
                self._fp.close()
            self._fp = None


class SoapySdrSink:
    """SDR transmit sink via SoapySDR (the reference's production output,
    util/atsc_encoder.cpp:60-101): device setup with 6 MHz bandwidth, the
    10.762238 MHz symbol rate, tune frequency and gain, then a CF32 TX
    stream written in MTU-sized chunks.

    Gated on the optional `SoapySDR` python module (not part of the TPU
    host image); raises a clear RuntimeError when absent so the CLI's
    null/file sinks remain the default path.
    """

    def __init__(self, driver: str = "hackrf", frequency_hz: float = 473e6,
                 gain_db: float = 54.0, sample_rate: float | None = None,
                 stream_format: str = "cf32",
                 bandwidth_hz: float = 6_000_000.0):
        try:
            import SoapySDR  # type: ignore
            from SoapySDR import SOAPY_SDR_TX  # type: ignore
        except ImportError as e:  # pragma: no cover - hardware-only path
            raise RuntimeError(
                "SoapySDR python bindings not available on this host; "
                "use a 'null'/file/stdout sink instead"
            ) from e
        from atsc_tpu import params as P

        soapy_fmt = {"cf32": "CF32", "cs16": "CS16", "cs8": "CS8"}[stream_format]
        self._np_dtype = {
            "cf32": np.float32, "cs16": np.int16, "cs8": np.int8
        }[stream_format]
        rate = sample_rate or P.SAMPLE_RATE
        self._sdr = SoapySDR.Device({"driver": driver})
        self._sdr.setBandwidth(SOAPY_SDR_TX, 0, bandwidth_hz)
        self._sdr.setSampleRate(SOAPY_SDR_TX, 0, rate)
        self._sdr.setFrequency(SOAPY_SDR_TX, 0, frequency_hz)
        self._sdr.setGain(SOAPY_SDR_TX, 0, gain_db)
        self._stream = self._sdr.setupStream(SOAPY_SDR_TX, soapy_fmt)
        self._sdr.activateStream(self._stream)
        self._mtu = int(self._sdr.getStreamMTU(self._stream))
        self._bytes = 0

    def write(self, arr: np.ndarray) -> None:
        """arr: (..., 260416, 2) interleaved IQ fields in the stream's
        sample dtype (float32 CF32 / int16 CS16 / int8 CS8)."""
        flat = np.ascontiguousarray(arr, dtype=self._np_dtype).reshape(-1, 2)
        pos = 0
        while pos < flat.shape[0]:
            chunk = flat[pos : pos + self._mtu]
            ret = self._sdr.writeStream(self._stream, [chunk], chunk.shape[0])
            sent = getattr(ret, "ret", ret)
            if sent <= 0:
                raise IOError(f"SoapySDR writeStream returned {sent}")
            pos += sent
        self._bytes += flat.nbytes

    def bytes_written(self) -> int:
        return self._bytes

    def close(self) -> None:
        if getattr(self, "_stream", None) is not None:
            self._sdr.deactivateStream(self._stream)
            self._sdr.closeStream(self._stream)
            self._stream = None


class SoapySdrSource:
    """SDR receive source via SoapySDR — the capture side of the headend
    (the TX mirror is SoapySdrSink; the reference has no receive path at
    all). File-like for the decode CLI: `read(n)` blocks on the RX stream
    and returns exactly n wire bytes of interleaved (I, Q) samples in the
    requested format (CF32/CS16/CS8); `seekable()` is False (a live
    stream has no positions). Timeouts are retried; overflows (dropped
    samples between reads — the device outruns the consumer) are counted
    in `.overflows`.

    **Timestamped gap filling**: when the driver stamps its buffers
    (`timeNs`), a discontinuity — samples dropped inside the device by
    an overflow — is measured exactly and replaced with that many zero
    samples (up to `max_fill_samples`), so the decoder's sample-counting
    field tracker never loses the stream position; the zeroed span
    decodes as noise and RS absorbs what it can (`IqReceiver.notify_gap`
    semantics, applied at the source). `.gaps_filled`/`.gap_samples`
    count the events; oversized or unmeasurable gaps (no timestamps) are
    left to the receiver's `resync="auto"` re-acquisition.

    Gated on the optional `SoapySDR` python module like the sink.
    """

    def __init__(self, driver: str = "hackrf", frequency_hz: float = 473e6,
                 gain_db: float = 30.0, sample_rate: float | None = None,
                 stream_format: str = "cf32",
                 bandwidth_hz: float = 6_000_000.0,
                 max_fill_samples: int = 8 * 260_416):
        try:
            import SoapySDR  # type: ignore
            from SoapySDR import SOAPY_SDR_RX  # type: ignore
        except ImportError as e:  # pragma: no cover - hardware-only path
            raise RuntimeError(
                "SoapySDR python bindings not available on this host; "
                "decode from a capture file instead"
            ) from e
        from atsc_tpu import params as P

        self._timeout_code = getattr(SoapySDR, "SOAPY_SDR_TIMEOUT", -1)
        self._overflow_code = getattr(SoapySDR, "SOAPY_SDR_OVERFLOW", -2)
        self._has_time_flag = getattr(SoapySDR, "SOAPY_SDR_HAS_TIME", 1 << 2)
        soapy_fmt = {"cf32": "CF32", "cs16": "CS16", "cs8": "CS8"}[stream_format]
        self._np_dtype = {
            "cf32": np.float32, "cs16": np.int16, "cs8": np.int8
        }[stream_format]
        self._sample_bytes = 2 * np.dtype(self._np_dtype).itemsize
        rate = sample_rate or P.SAMPLE_RATE
        self._sdr = SoapySDR.Device({"driver": driver})
        self._sdr.setBandwidth(SOAPY_SDR_RX, 0, bandwidth_hz)
        self._sdr.setSampleRate(SOAPY_SDR_RX, 0, rate)
        self._sdr.setFrequency(SOAPY_SDR_RX, 0, frequency_hz)
        self._sdr.setGain(SOAPY_SDR_RX, 0, gain_db)
        self._stream = self._sdr.setupStream(SOAPY_SDR_RX, soapy_fmt)
        self._sdr.activateStream(self._stream)
        self._mtu = int(self._sdr.getStreamMTU(self._stream))
        self._pending = b""
        self._bytes = 0
        self._rate = float(rate)
        self._expect_ns: float | None = None  # next buffer's expected stamp
        self.max_fill_samples = max_fill_samples
        self.overflows = 0
        self.gaps_filled = 0
        self.gap_samples = 0

    def _gap_zeros(self, res, got: int) -> bytes:
        """Zero-fill bytes for a timestamp discontinuity preceding this
        buffer (b'' when stamps are absent or the gap is 0/oversized)."""
        # timeNs is only defined when the driver sets HAS_TIME — a stale
        # nonzero stamp without the flag must not invent gaps
        flags = int(getattr(res, "flags", 0) or 0)
        t_ns = float(getattr(res, "timeNs", 0) or 0)
        if not (flags & self._has_time_flag) or t_ns <= 0.0:
            self._expect_ns = None
            return b""
        fill = b""
        if self._expect_ns is not None:
            gap = int(round((t_ns - self._expect_ns) * self._rate * 1e-9))
            # >=8 samples: below that is stamp jitter, not a real gap
            if 8 <= gap <= self.max_fill_samples:
                self.gaps_filled += 1
                self.gap_samples += gap
                fill = bytes(gap * self._sample_bytes)
        self._expect_ns = t_ns + got / self._rate * 1e9
        return fill

    def read(self, n: int = -1) -> bytes:
        """Blocking read of exactly n bytes (whole samples are buffered
        internally, so any n works). A live stream has no EOF: read() with
        no size is refused rather than looping forever."""
        if n < 0:
            raise ValueError(
                "read() without a size on a live SDR stream would never "
                "return; pass a byte count (or use --max-fields)"
            )
        if self._stream is None:
            return b""  # closed: behave like EOF
        out = bytearray(self._pending)
        buf = np.empty((self._mtu, 2), self._np_dtype)
        while len(out) < n:
            want = min(
                self._mtu,
                -(-(n - len(out)) // self._sample_bytes),
            )
            res = self._sdr.readStream(self._stream, [buf], want)
            got = getattr(res, "ret", res)
            if got == self._timeout_code:
                continue
            if got == self._overflow_code:
                self.overflows += 1
                continue
            if got < 0:
                raise IOError(f"SoapySDR readStream returned {got}")
            out += self._gap_zeros(res, got)
            out += buf[:got].tobytes()
        self._bytes += n
        self._pending = bytes(out[n:])
        return bytes(out[:n])

    def readable(self) -> bool:
        return True

    def seekable(self) -> bool:
        return False

    def bytes_read(self) -> int:
        return self._bytes

    def close(self) -> None:
        if getattr(self, "_stream", None) is not None:
            self._sdr.deactivateStream(self._stream)
            self._sdr.closeStream(self._stream)
            self._stream = None


class IqSink:
    """IQ byte sink: 'null', '-' (stdout) or a file path; optional pacing
    in bytes/s (e.g. SAMPLE_RATE * 8 for real-time CF32)."""

    def __init__(self, path: str = "null", ring_bytes: int = 64 << 20,
                 pace_bytes_per_sec: float = 0.0):
        lib = _load()
        self._lib = lib
        self._h = None
        self._bytes = 0
        if lib is not None:
            h = lib.iq_sink_open(path.encode(), ring_bytes, pace_bytes_per_sec)
            if not h:
                raise FileNotFoundError(path)
            self._h = ctypes.c_void_p(h)
        else:
            import sys

            self._fp = (
                None if path == "null"
                else sys.stdout.buffer if path == "-" else open(path, "wb")
            )

    def write(self, arr: np.ndarray) -> None:
        data = np.ascontiguousarray(arr)
        if self._h is not None:
            self._lib.iq_sink_write(
                self._h, data.ctypes.data_as(ctypes.c_void_p), data.nbytes
            )
        elif self._fp is not None:
            self._fp.write(data.tobytes())
        self._bytes += data.nbytes

    def write_planar(self, arr: np.ndarray, n_valid: int) -> None:
        """Planar (B, 2, stride>=n_valid) component array -> interleaved
        (B, n_valid, 2) wire bytes, interleaved natively off the GIL (the
        device emits planar IQ; the wire is the reference's interleaved
        complex layout, atsc.cpp:89). Falls back to a numpy transpose."""
        data = np.ascontiguousarray(arr)
        if self._h is not None and data.ndim == 3 and data.shape[1] == 2:
            elem = data.dtype.itemsize
            self._lib.iq_sink_write_planar(
                self._h, data.ctypes.data_as(ctypes.c_void_p), elem,
                data.shape[0], data.shape[2], n_valid,
            )
            self._bytes += data.shape[0] * n_valid * 2 * elem
            return
        self.write(
            np.ascontiguousarray(np.moveaxis(data[..., :n_valid], -2, -1))
        )

    def write_wire(self, arr: np.ndarray, n_valid: int) -> None:
        """Packed wire lanes (B, stride>=n_valid) — one little-endian
        (I, Q) pair per lane, as emitted by the fused kernel's wire=True
        path — written verbatim, channel by channel. Each row slice is
        already contiguous wire bytes, so no interleave pass runs at all
        (vs write_planar's native 3-memory-pass transpose)."""
        a = np.asarray(arr)
        if a.ndim == 1:
            a = a[None]
        for b in range(a.shape[0]):
            self.write(a[b, :n_valid])

    def bytes_written(self) -> int:
        if self._h is not None:
            return int(self._lib.iq_sink_bytes(self._h))
        return self._bytes

    def close(self) -> None:
        if self._h is not None:
            self._lib.iq_sink_close(self._h)
            self._h = None
        elif getattr(self, "_fp", None) is not None and self._fp.name != "<stdout>":
            self._fp.close()
            self._fp = None
