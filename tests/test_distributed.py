"""Multi-host helpers (parallel/distributed.py) on the virtual 8-device
CPU mesh: pod-mesh construction and per-host channel-slice assignment.
Real multi-process execution needs a pod slice; the logic here is what
each host runs locally, so it is testable single-process."""

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
