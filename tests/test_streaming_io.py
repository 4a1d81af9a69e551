"""Streaming driver, native IO runtime, CLI, and checkpoint tests —
covering the input-chunking path the reference left untested
(SURVEY.md §4 gaps)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_interleave, iq_to_complex
from atsc_tpu.models.streaming import StreamingEncoder
from atsc_tpu.runtime.io import IqSink, TsReader, native_available
from atsc_tpu.utils.checkpoint import load_state, save_state


def test_streaming_chunked_input_matches_field_input(golden):
    """Odd-sized pushes must produce the same IQ as whole-field encodes
    (reference atsc.cpp:59-77 semantics)."""
    outputs = []
    enc = StreamingEncoder(
        channels=1, sink=lambda c, iq: outputs.append(iq.copy())
    )
    stream = golden["input"].reshape(-1).tobytes()
    # push in awkward chunk sizes (not packet- or field-aligned)
    pos = 0
    for chunk in (1000, 58656, 13, 99999, 10**9):
        enc.push(stream[pos : pos + chunk])
        pos += chunk
        if pos >= len(stream):
            break
    assert len(outputs) == 4

    ref = Encoder(batch=1)
    iq_ref = iq_interleave(np.asarray(ref.encode_many(golden["input"][:, None, :])))
    got = np.stack(outputs)
    np.testing.assert_array_equal(got, iq_ref[:, 0])


def test_streaming_multichannel_lockstep(golden):
    per_ch = [[] for _ in range(2)]
    enc = StreamingEncoder(
        channels=2, sink=lambda c, iq: per_ch[c].append(iq.copy())
    )
    f = P.FIELD_TS_BYTES
    data = golden["input"].reshape(-1).tobytes()
    enc.push(data[: 2 * f], channel=0)
    assert enc.fields_encoded == 0  # channel 1 has nothing yet
    enc.push(data[: 2 * f], channel=1)
    assert enc.fields_encoded == 2
    np.testing.assert_array_equal(per_ch[0][0], per_ch[1][0])


def test_native_io_roundtrip(tmp_path):
    if not native_available():
        pytest.skip("no native toolchain")
    # TS reader: alignment drops leading garbage before the 0x47 grid
    raw = tmp_path / "in.ts"
    pkts = np.zeros((10, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    pkts[:, 1] = np.arange(10)
    garbage = b"\x00\x12\x34"
    raw.write_bytes(garbage + pkts.tobytes())
    r = TsReader(str(raw))
    data = r.read(10 * 188)
    r.close()
    got = np.frombuffer(data, dtype=np.uint8).reshape(-1, 188)
    assert got.shape[0] == 10
    np.testing.assert_array_equal(got[:, 0], 0x47)
    np.testing.assert_array_equal(got[:, 1], np.arange(10))

    # IQ sink file roundtrip
    out = tmp_path / "out.iq"
    s = IqSink(str(out))
    payload = np.arange(1024, dtype=np.float32).reshape(-1, 2)
    s.write(payload)
    s.close()
    back = np.fromfile(out, dtype=np.float32).reshape(-1, 2)
    np.testing.assert_array_equal(back, payload)


def test_native_reader_passthrough_without_sync(tmp_path):
    """Input with no 0x47 grid must pass through raw and complete (the
    reference freads blindly, util/atsc_encoder.cpp:83); sync alignment
    only engages for streams that actually carry sync bytes."""
    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(0)

    # large non-TS input (> one 64 KiB scan window): full raw passthrough
    blob = rng.integers(0, 256, size=200_000, dtype=np.uint8)
    blob[blob == 0x47] = 0x48  # make sure no accidental sync grid
    f = tmp_path / "garbage.bin"
    f.write_bytes(blob.tobytes())
    r = TsReader(str(f))
    data = b""
    while True:
        c = r.read(65536)
        if not c:
            break
        data += c
    r.close()
    assert data == blob.tobytes()

    # tiny non-TS input (below one scan window): flushed raw at EOF
    tiny = tmp_path / "tiny.bin"
    tiny.write_bytes(b"\xab" * 500)
    r = TsReader(str(tiny))
    data = r.read(1000)
    r.close()
    assert data == b"\xab" * 500


def _udp_send(port: int, dgrams, host="127.0.0.1") -> None:
    import socket

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    for d in dgrams:
        s.sendto(d, (host, port))
    s.close()


def _free_udp_port() -> int:
    import socket

    s = socket.socket(socket.AF_INET, socket.SOCK_DGRAM)
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _ts_payload(n_pkts: int) -> np.ndarray:
    pkts = np.zeros((n_pkts, 188), dtype=np.uint8)
    pkts[:, 0] = 0x47
    pkts[:, 1] = np.arange(n_pkts) % 256
    return pkts


@pytest.mark.parametrize("rtp", [False, True])
def test_udp_ts_source(rtp):
    """'udp://host:port' input: datagram-aligned live TS feed; RTP wraps
    (RFC 3550 version-2 header + n*188 payload) are stripped per packet."""
    pkts = _ts_payload(70)  # 10 datagrams x 7 packets (the standard MTU fit)
    dgrams = []
    for i in range(10):
        payload = pkts[7 * i : 7 * (i + 1)].tobytes()
        if rtp:
            seq = i.to_bytes(2, "big")
            hdr = b"\x80\x21" + seq + (b"\x00" * 8)  # V=2, PT=33 (MP2T)
            payload = hdr + payload
        dgrams.append(payload)

    port = _free_udp_port()
    r = TsReader(f"udp://127.0.0.1:{port}")  # binds before the send below
    try:
        _udp_send(port, dgrams)
        data = r.read(70 * 188)
    finally:
        r.close()
    np.testing.assert_array_equal(
        np.frombuffer(data, dtype=np.uint8).reshape(-1, 188), pkts
    )


def test_udp_ts_source_python_fallback(monkeypatch):
    """The no-toolchain fallback speaks the same udp:// contract."""
    import atsc_tpu.runtime.io as io_mod

    monkeypatch.setattr(io_mod, "_load", lambda: None)
    pkts = _ts_payload(14)
    hdr = b"\x80\x21\x00\x01" + b"\x00" * 8
    dgrams = [hdr + pkts[:7].tobytes(), pkts[7:].tobytes()]  # mixed wrap
    port = _free_udp_port()
    r = io_mod.TsReader(f"udp://127.0.0.1:{port}")
    try:
        _udp_send(port, dgrams)
        data = r.read(14 * 188)
    finally:
        r.close()
    np.testing.assert_array_equal(
        np.frombuffer(data, dtype=np.uint8).reshape(-1, 188), pkts
    )


def test_cli_end_to_end(golden, tmp_path):
    ts_path = tmp_path / "in.ts"
    ts_path.write_bytes(golden["input"].reshape(-1).tobytes())
    iq_path = tmp_path / "out.iq"
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import jax; jax.config.update('jax_platforms','cpu'); "
        "from atsc_tpu.cli import main; "
        "sys.exit(main([%r, '-o', %r, '--stats']))"
        % (repo, str(ts_path), str(iq_path))
    )
    proc = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr
    iq = np.fromfile(iq_path, dtype=np.float32).reshape(4, P.SYMBOLS_PER_FIELD, 2)
    got = (iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64)
    assert np.abs(got - golden["iq"]).max() < 5e-6


def test_checkpoint_resume(golden, tmp_path):
    enc = Encoder(batch=1)
    enc.encode_many(golden["input"][:2, None, :])
    path = str(tmp_path / "ckpt.npz")
    save_state(path, enc.state, fields_encoded=2)

    enc2 = Encoder(batch=1)
    enc2.state, n = load_state(path)
    assert n == 2
    iq_resumed = np.asarray(enc2.encode_many(golden["input"][2:4, None, :]))

    ref = Encoder(batch=1)
    iq_all = np.asarray(ref.encode_many(golden["input"][:, None, :]))
    np.testing.assert_array_equal(iq_resumed, iq_all[2:4])


def test_checkpoint_version_mismatch_fails_loudly(golden, tmp_path):
    """A checkpoint from an incompatible build must raise a clear error
    naming both versions — never misload silently (VERDICT r3 weak #6)."""
    import pytest

    from atsc_tpu.utils.checkpoint import CHECKPOINT_VERSION

    enc = Encoder(batch=1)
    enc.encode_many(golden["input"][:1, None, :])
    path = str(tmp_path / "ckpt.npz")
    save_state(path, enc.state, fields_encoded=1)

    # tamper: future format version
    z = dict(np.load(path))
    z["__version__"] = np.asarray(CHECKPOINT_VERSION + 7, dtype=np.int64)
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError) as e:
        load_state(path)
    assert str(CHECKPOINT_VERSION + 7) in str(e.value)
    assert str(CHECKPOINT_VERSION) in str(e.value)

    # tamper: pre-versioning checkpoint (no stamp at all)
    z.pop("__version__")
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError, match="version 0"):
        load_state(path)

    # tamper: reshaped state leaf (layout change across builds)
    save_state(path, enc.state, fields_encoded=1)
    z = dict(np.load(path))
    leaf = next(k for k in z if not k.startswith("__"))
    z[leaf] = z[leaf].reshape(1, -1)[:, :-1]  # drop one element
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError, match=leaf):
        load_state(path)


def test_receiver_checkpoint_version_mismatch_fails_loudly(tmp_path):
    import pytest

    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.utils.checkpoint import (
        CHECKPOINT_VERSION, load_receiver, save_receiver,
    )

    rx = IqReceiver(batch=1)
    path = str(tmp_path / "rx.npz")
    save_receiver(path, rx)
    z = dict(np.load(path))
    z["__version__"] = np.asarray(CHECKPOINT_VERSION + 1, dtype=np.int64)
    np.savez_compressed(path, **z)
    with pytest.raises(ValueError) as e:
        load_receiver(path)
    assert str(CHECKPOINT_VERSION + 1) in str(e.value)


def test_iq_sink_write_planar_matches_interleave(tmp_path):
    """Native off-GIL planar interleave == numpy moveaxis for every wire
    format (and the fallback path when the native lib is absent)."""
    from atsc_tpu.runtime.io import IqSink

    rng = np.random.default_rng(47)
    for dt in (np.float32, np.int16, np.int8):
        arr = rng.integers(-100, 100, size=(3, 2, 300)).astype(dt)
        n_valid = 257
        want = np.ascontiguousarray(
            np.moveaxis(arr[..., :n_valid], -2, -1)
        ).tobytes()
        p = tmp_path / f"planar_{dt.__name__}.iq"
        sink = IqSink(str(p))
        sink.write_planar(arr, n_valid)
        sink.close()
        assert p.read_bytes() == want, dt


def test_cli_multi_input_channels(golden, tmp_path):
    """N input paths -> N independent channels, each matching the
    broadcast single-channel encode of its own stream."""
    from atsc_tpu.cli import main

    a, b = tmp_path / "a.ts", tmp_path / "b.ts"
    a.write_bytes(golden["input"][:2].reshape(-1).tobytes())
    b.write_bytes(golden["input"][2:4].reshape(-1).tobytes())
    out = tmp_path / "ab.iq"
    assert main([str(a), str(b), "-o", str(out)]) == 0
    iq = np.fromfile(out, np.float32).reshape(2, 2, P.SYMBOLS_PER_FIELD, 2)
    got = (iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64)
    # channel 0 = golden fields 0..1 exactly (same epoch/state as golden)
    assert np.abs(got[:, 0] - golden["iq"][:2]).max() < 5e-6
    # channel 1 = fields 2..3 re-encoded from a fresh field-0 state: check
    # against a fresh single-channel encode of the same bytes
    enc = Encoder(batch=1)
    want = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(golden["input"][k : k + 1])))
         for k in (2, 3)]
    )
    assert np.abs(got[:, 1] - want).max() < 5e-6


def test_cli_ts_sync_health_counter(golden, tmp_path):
    """The encode summary counts 188-byte packets whose sync byte isn't
    0x47 — zero on a real transport stream, all of them on the golden
    random-byte fixture (the reference never checks; a misaligned TS
    encodes to a perfectly valid but undecodable-content signal)."""
    from atsc_tpu.cli import run
    from atsc_tpu.utils.config import EncoderConfig

    raw = golden["input"][:2].reshape(-1, P.MPEG2_BYTES).copy()
    good = tmp_path / "good.ts"
    good.write_bytes(raw.tobytes())  # golden input carries real 0x47s
    s = run(EncoderConfig(channels=1, sink="null"), [str(good)])
    assert s["ts_packets"] == 2 * P.DATA_SEGMENTS
    assert s["ts_sync_errors"] == 0

    # non-TS bytes (no 0x47 grid anywhere): the reader passes them
    # through raw and the counter flags essentially every packet
    garbage = raw.copy()
    garbage[garbage == 0x47] = 0x48
    bad = tmp_path / "bad.bin"
    bad.write_bytes(garbage.tobytes())
    s = run(EncoderConfig(channels=1, sink="null"), [str(bad)])
    assert s["ts_sync_errors"] > 0.9 * s["ts_packets"]

    if native_available():
        # a 1-byte mux misalignment, by contrast, is *repaired* upstream:
        # the native TsReader re-aligns to the 0x47 grid, so the counter
        # sees (almost) clean packets — at most the zero-padded tail
        shifted = tmp_path / "shifted.ts"
        shifted.write_bytes(raw.tobytes()[1:])
        s = run(EncoderConfig(channels=1, sink="null"), [str(shifted)])
        assert s["ts_sync_errors"] <= P.DATA_SEGMENTS // 2


def test_cli_checkpoint_resume(golden, tmp_path):
    """Interrupt after 2 fields, resume from the .npz checkpoint: the
    concatenated output equals the uninterrupted 4-field run."""
    from atsc_tpu.cli import main

    ts = tmp_path / "in.ts"
    ts.write_bytes(golden["input"].reshape(-1).tobytes())
    full, p1, p2 = (tmp_path / n for n in ("full.iq", "p1.iq", "p2.iq"))
    ck = tmp_path / "state.npz"
    assert main([str(ts), "-o", str(full)]) == 0
    assert main([str(ts), "-o", str(p1), "--max-fields", "2",
                 "--checkpoint", str(ck)]) == 0
    assert ck.exists()
    assert main([str(ts), "-o", str(p2), "--resume",
                 "--checkpoint", str(ck)]) == 0
    got = p1.read_bytes() + p2.read_bytes()
    assert got == full.read_bytes()


def test_cli_mesh_encode_matches_golden(golden, tmp_path):
    """`--mesh TxC` routes the CLI through the multi-device sharded
    encoder; output must match the golden IQ like the single-device path
    (incl. a zero-padded EOF tail step)."""
    from atsc_tpu.cli import main

    ts_path = tmp_path / "in.ts"
    ts_path.write_bytes(golden["input"].reshape(-1).tobytes())

    out = tmp_path / "mesh.iq"
    assert main([str(ts_path), "-o", str(out), "--mesh", "2x1",
                 "--fields-per-step", "4"]) == 0
    iq = np.fromfile(out, np.float32).reshape(4, P.SYMBOLS_PER_FIELD, 2)
    got = (iq[..., 0] + 1j * iq[..., 1]).astype(np.complex64)
    assert np.abs(got - golden["iq"]).max() < 5e-6

    # channels over the ch axis + a tail step that needs padding
    out2 = tmp_path / "mesh2.iq"
    assert main([str(ts_path), "-o", str(out2), "--mesh", "2x2",
                 "--channels", "2", "--fields-per-step", "6"]) == 0
    iq2 = np.fromfile(out2, np.float32).reshape(4, 2, P.SYMBOLS_PER_FIELD, 2)
    got2 = (iq2[..., 0] + 1j * iq2[..., 1]).astype(np.complex64)
    for ch in range(2):
        assert np.abs(got2[:, ch] - golden["iq"]).max() < 5e-6


def test_cli_mesh_encode_quantized(golden, tmp_path):
    """`--mesh` with `--format cs8`: the sharded encoder quantizes on
    device; wire bytes match the single-device cs8 path exactly."""
    from atsc_tpu.cli import main

    ts_path = tmp_path / "in.ts"
    ts_path.write_bytes(golden["input"].reshape(-1).tobytes())

    ref = tmp_path / "seq.iq"
    assert main([str(ts_path), "-o", str(ref), "--format", "cs8"]) == 0
    out = tmp_path / "mesh.iq"
    assert main([str(ts_path), "-o", str(out), "--mesh", "2x1",
                 "--format", "cs8", "--fields-per-step", "4"]) == 0
    a = np.fromfile(ref, np.int8)
    b = np.fromfile(out, np.int8)
    assert a.size == b.size == 4 * P.SYMBOLS_PER_FIELD * 2
    np.testing.assert_array_equal(a, b)
