"""Multi-host execution (parallel/distributed.py): pod-mesh construction
and per-host channel assignment on the virtual 8-device CPU mesh, plus a
REAL 2-process run — two jax.distributed processes (gloo CPU collectives,
2 virtual devices each) executing one ShardedEncoder step over the global
4-device mesh and checking their local shards against the sequential
encoder (see _distributed_child.py)."""

import os
import socket
import subprocess
import sys

import jax

from atsc_tpu.parallel.distributed import (
    initialize,
    local_channel_slice,
    pod_mesh,
)
from atsc_tpu.parallel.mesh import CH_AXIS, TIME_AXIS


def test_pod_mesh_spans_all_devices():
    mesh = pod_mesh(n_time=2)
    assert mesh.shape[TIME_AXIS] == 2
    assert mesh.shape[CH_AXIS] == jax.device_count() // 2
    assert mesh.devices.size == jax.device_count()


def test_local_channel_slice_covers_batch_once():
    mesh = pod_mesh(n_time=1)
    batch = 2 * mesh.shape[CH_AXIS]
    sl = local_channel_slice(mesh, batch)
    # single process: this host owns every channel
    assert (sl.start, sl.stop) == (0, batch)


def test_initialize_single_host_is_noop():
    initialize(num_processes=1)  # must not raise or try to connect
    initialize(num_processes=None)


def test_local_channel_indices_matches_slice():
    from atsc_tpu.parallel.distributed import local_channel_indices

    mesh = pod_mesh(n_time=2)
    batch = 2 * mesh.shape[CH_AXIS]
    idx = local_channel_indices(mesh, batch)
    sl = local_channel_slice(mesh, batch)
    assert idx.tolist() == list(range(sl.start, sl.stop))


def test_two_process_cli_encode(tmp_path):
    """Two real jax.distributed processes through the production driver
    (tools/distributed_encode.py): per-host channel IO assignment, one
    output file per owned channel — byte-compared against the
    sequential encoder."""
    import numpy as np

    from atsc_tpu import params as P

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    rng = np.random.default_rng(17)
    t, b = 3, 4
    ts = rng.integers(0, 256, size=(t, b, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts.reshape(t, b, P.DATA_SEGMENTS, P.MPEG2_BYTES)[..., 0] = 0x47
    paths = []
    for c in range(b):
        p = tmp_path / f"in{c}.ts"
        ts[:, c].tofile(p)
        paths.append(str(p))

    tool = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "distributed_encode.py")
    out_tpl = str(tmp_path / "out_ch{ch}.iq")
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, tool, *paths,
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "-c", str(b), "-o", out_tpl, "--fields-per-step", "1"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"process {i}: encoded {t} fields" in out, out

    from atsc_tpu.models.encoder import Encoder, iq_interleave

    enc = Encoder(batch=b, donate=False)
    n = P.SYMBOLS_PER_FIELD
    for c in range(b):
        got = np.fromfile(tmp_path / f"out_ch{c}.iq", np.float32).reshape(
            t, n, 2)
        assert got.shape[0] == t
    seq = np.asarray(enc.encode_many(ts))          # (T, B, 2, >=N)
    for c in range(b):
        got = np.fromfile(tmp_path / f"out_ch{c}.iq", np.float32).reshape(
            t, n, 2)
        want = iq_interleave(seq[:, c])            # (T, N, 2)
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_two_process_sharded_encode():
    """Two real jax.distributed processes execute one sharded encode step
    over the global mesh; each checks its addressable shards in-process."""
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    child = os.path.join(os.path.dirname(__file__), "_distributed_child.py")
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, child, str(i), str(port)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"child-ok {i}" in out, out


def test_two_process_cli_decode(tmp_path):
    """Receive twin of test_two_process_cli_encode: two real
    jax.distributed processes through tools/distributed_decode.py —
    per-host channel IO, sharded equalize+decode, per-host RS/derand —
    byte-compared against the transmitted transport streams."""
    import numpy as np

    from atsc_tpu import params as P
    from atsc_tpu.models.encoder import Encoder, iq_interleave

    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    rng = np.random.default_rng(23)
    t, b = 5, 4          # NOT a multiple of --fields-per-step: the
    #                      driver must pad the final partial step and
    #                      still emit t-1 TS fields
    ts = rng.integers(0, 256, size=(t, b, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts.reshape(t, b, P.DATA_SEGMENTS, P.MPEG2_BYTES)[..., 0] = 0x47
    enc = Encoder(batch=b, donate=False)
    seq = np.asarray(enc.encode_many(ts))          # (T, B, 2, >=N)
    for c in range(b):
        iq_interleave(seq[:, c]).tofile(tmp_path / f"cap_ch{c}.iq")

    tool = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                        "tools", "distributed_decode.py")
    env = dict(
        os.environ,
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        JAX_PLATFORMS="cpu",
    )
    procs = [
        subprocess.Popen(
            [sys.executable, tool, str(tmp_path / "cap_ch{ch}.iq"),
             "--coordinator", f"localhost:{port}",
             "--num-processes", "2", "--process-id", str(i),
             "-c", str(b), "-o", str(tmp_path / "out_ch{ch}.ts"),
             "--fields-per-step", "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in (0, 1)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"process {i}: decoded {t} fields" in out, out

    for c in range(b):
        got = np.fromfile(tmp_path / f"out_ch{c}.ts", np.uint8).reshape(
            -1, P.FIELD_TS_BYTES)
        assert got.shape[0] == t - 1, got.shape
        for k in range(t - 1):
            np.testing.assert_array_equal(got[k], ts[k, c])
