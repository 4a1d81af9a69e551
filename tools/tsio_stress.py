"""Sanitizer stress driver for the native IO runtime (runtime/tsio.cpp).

Exercises every exported entry point of libtsio — threaded ring-buffer
file/stdin/UDP TS readers (sync-byte alignment, RTP stripping,
back-pressure), null/file/paced IQ sinks, the planar interleaver — WITHOUT
importing jax, so it can run with an ASan/UBSan/TSan runtime preloaded
(XLA itself aborts under ASan interceptors; the sanitizers' target is this
threaded native code, per reference src/CMakeLists.txt:7-10's default-on
ASAN). Driven by `make sanitize`.

Usage: python tools/tsio_stress.py <path-to-libtsio.so>
Exits 0 and prints "tsio-stress-ok" on success; any sanitizer report
aborts the process (halt_on_error in the make target).
"""

from __future__ import annotations

import ctypes
import os
import socket
import struct
import sys
import tempfile
import threading
import time

import numpy as np

TS_PACKET = 188


def load(path: str) -> ctypes.CDLL:
    lib = ctypes.CDLL(path)
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
    return lib


def read_all(lib, h, chunk=4096) -> bytes:
    out = bytearray()
    buf = ctypes.create_string_buffer(chunk)
    while True:
        n = lib.ts_reader_read(h, buf, chunk, 1)
        if n == 0:
            break
        out += buf.raw[:n]
    return bytes(out)


def make_ts(npkts: int, seed: int = 0) -> bytes:
    rng = np.random.default_rng(seed)
    data = rng.integers(0, 256, size=npkts * TS_PACKET, dtype=np.uint8)
    data[::TS_PACKET] = 0x47
    return data.tobytes()


def t_file_reader_sync(lib, tmp: str) -> None:
    """Leading junk is dropped up to the first 4-packet 0x47 run."""
    ts = make_ts(500, 1)
    junk = b"\x13" * 777
    path = os.path.join(tmp, "sync.ts")
    with open(path, "wb") as f:
        f.write(junk + ts)
    h = lib.ts_reader_open(path.encode(), 1 << 16)  # small ring: wraps a lot
    assert h
    got = read_all(lib, h)
    assert got == ts, (len(got), len(ts))
    assert lib.ts_reader_eof(h) == 1
    assert lib.ts_reader_bytes(h) == len(junk) + len(ts)
    lib.ts_reader_close(h)


def t_file_reader_passthrough(lib, tmp: str) -> None:
    """Non-TS input (no sync run) passes through raw, incl. tiny files."""
    for size in (17, 4 * TS_PACKET - 1, 100_000):
        blob = bytes((7 * i + 1) % 251 + 1 for i in range(size))  # no 0x47
        blob = blob.replace(b"\x47", b"\x48")
        path = os.path.join(tmp, f"raw{size}.bin")
        with open(path, "wb") as f:
            f.write(blob)
        h = lib.ts_reader_open(path.encode(), 1 << 14)
        assert h
        got = read_all(lib, h)
        assert got == blob, size
        lib.ts_reader_close(h)


def t_reader_close_under_backpressure(lib, tmp: str) -> None:
    """Close while the producer thread is blocked on a full ring —
    exercises the stop-flag path in TsReader::push."""
    path = os.path.join(tmp, "big.ts")
    with open(path, "wb") as f:
        f.write(make_ts(3000, 2))
    for _ in range(20):
        h = lib.ts_reader_open(path.encode(), 4096)  # tiny ring: fills fast
        assert h
        time.sleep(0.002)  # let the thread hit back-pressure
        lib.ts_reader_close(h)


def t_udp_reader(lib) -> None:
    """Raw-UDP and RTP-wrapped datagrams, concurrent sender thread."""
    for rtp in (False, True):
        sock = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
        sock.bind(("127.0.0.1", 0))
        port = sock.getsockname()[1]
        sock.close()
        h = lib.ts_reader_open(f"udp://127.0.0.1:{port}".encode(), 1 << 16)
        assert h
        payloads = [make_ts(7, 10 + k) for k in range(40)]

        def send():
            s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
            for k, p in enumerate(payloads):
                if rtp:
                    hdr = struct.pack(">BBHII", 0x80, 33, k, k * 7, 0xfeed)
                    p = hdr + p
                s.sendto(p, ("127.0.0.1", port))
                time.sleep(0.001)
            s.close()

        thr = threading.Thread(target=send)
        thr.start()
        want = b"".join(payloads)
        buf = ctypes.create_string_buffer(len(want))
        got = bytearray()
        deadline = time.time() + 10
        while len(got) < len(want) and time.time() < deadline:
            n = lib.ts_reader_read(h, buf, len(want) - len(got), 0)
            if n:
                got += buf.raw[:n]
            else:
                time.sleep(0.001)
        thr.join()
        lib.ts_reader_close(h)
        assert bytes(got) == want, (rtp, len(got), len(want))


def t_iq_sink_file(lib, tmp: str) -> None:
    """File sink through a small ring (many wraps) — byte-exact output."""
    path = os.path.join(tmp, "out.iq")
    h = lib.iq_sink_open(path.encode(), 1 << 14, 0.0)
    assert h
    rng = np.random.default_rng(5)
    chunks = [rng.integers(0, 256, size=n, dtype=np.uint8).tobytes()
              for n in (1, 4095, 1 << 16, 37, 1 << 18)]
    for c in chunks:
        lib.iq_sink_write(h, c, len(c))
    want = b"".join(chunks)
    deadline = time.time() + 10
    while lib.iq_sink_bytes(h) < len(want) and time.time() < deadline:
        time.sleep(0.001)
    lib.iq_sink_close(h)
    with open(path, "rb") as f:
        assert f.read() == want


def t_iq_sink_planar(lib, tmp: str) -> None:
    """Planar -> interleaved wire conversion for all three element sizes,
    multiple batches, against the numpy transpose oracle."""
    rng = np.random.default_rng(6)
    for elem, dt in ((4, np.float32), (2, np.int16), (1, np.int8)):
        batch, stride, n_valid = 3, 1000, 900
        arr = (rng.integers(-100, 100, size=(batch, 2, stride))
               .astype(dt))
        path = os.path.join(tmp, f"planar{elem}.iq")
        h = lib.iq_sink_open(path.encode(), 1 << 20, 0.0)
        assert h
        src = np.ascontiguousarray(arr)
        lib.iq_sink_write_planar(
            h, src.ctypes.data_as(ctypes.c_void_p), elem, batch, stride,
            n_valid)
        want = np.ascontiguousarray(
            np.moveaxis(arr[:, :, :n_valid], 1, 2)).tobytes()
        deadline = time.time() + 10
        while lib.iq_sink_bytes(h) < len(want) and time.time() < deadline:
            time.sleep(0.001)
        lib.iq_sink_close(h)
        with open(path, "rb") as f:
            assert f.read() == want, elem


def t_iq_sink_paced_backpressure(lib) -> None:
    """A paced null sink throttles the writer (back-pressure through a
    tiny ring while the drainer sleeps on the pace clock)."""
    h = lib.iq_sink_open(b"null", 1 << 12, 1e6)  # 1 MB/s, 4 KiB ring
    assert h
    data = bytes(64 << 10)  # 64 KiB -> >= ~60 ms at 1 MB/s
    t0 = time.time()
    lib.iq_sink_write(h, data, len(data))
    dt = time.time() - t0
    lib.iq_sink_close(h)
    assert dt > 0.02, dt  # writer was actually throttled


def t_concurrent_churn(lib, tmp: str) -> None:
    """Many reader+sink pairs alive at once, torn down from another thread
    order — shakes thread lifetime/teardown races under TSan."""
    path = os.path.join(tmp, "churn.ts")
    with open(path, "wb") as f:
        f.write(make_ts(2000, 9))

    def worker(k: int) -> None:
        h = lib.ts_reader_open(path.encode(), 1 << 15)
        s = lib.iq_sink_open(b"null", 1 << 15, 0.0)
        buf = ctypes.create_string_buffer(1 << 14)
        for _ in range(30):
            n = lib.ts_reader_read(h, buf, len(buf), 0)
            if n:
                lib.iq_sink_write(s, buf, n)
        lib.ts_reader_close(h)
        lib.iq_sink_close(s)

    threads = [threading.Thread(target=worker, args=(k,)) for k in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()


def main() -> None:
    so = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "atsc_tpu", "runtime", "libtsio.so")
    lib = load(so)
    with tempfile.TemporaryDirectory() as tmp:
        t_file_reader_sync(lib, tmp)
        t_file_reader_passthrough(lib, tmp)
        t_reader_close_under_backpressure(lib, tmp)
        t_udp_reader(lib)
        t_iq_sink_file(lib, tmp)
        t_iq_sink_planar(lib, tmp)
        t_iq_sink_paced_backpressure(lib)
        t_concurrent_churn(lib, tmp)
    print("tsio-stress-ok")


if __name__ == "__main__":
    main()
