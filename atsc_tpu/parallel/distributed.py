"""Multi-host pod-slice execution (BASELINE config[4]).

The reference has no distributed story at all (SURVEY.md §5.8). Here the
recipe is the standard JAX multi-controller one: every host runs the same
program, `jax.distributed.initialize` wires the hosts into one runtime,
and the global ("time", "ch") mesh spans all chips — ICI inside a slice,
DCN across hosts. The per-step collectives (see field_shard.py) are O(1)
in stream length, so cross-host traffic per channel per step is one RS
field (64.6 kB), 12 symbols, and 36 bits — the <2% host-to-host scaling
loss target is bandwidth-trivial; only latency matters, and it is hidden
by encoding many fields per step.

Host-local IO: each host ingests TS and emits IQ for the channel shards it
owns (`local_channel_slice`), exactly like per-host data loading in an SPMD
training job.
"""

from __future__ import annotations

import jax
import numpy as np

from atsc_tpu.parallel.mesh import CH_AXIS, make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime (no-op on a single host).

    On CPU backends (tests, dryruns) cross-process collectives need the
    gloo transport; selecting it is harmless when it is already set."""
    if num_processes is None or num_processes <= 1:
        return
    # must be set BEFORE backend init (and is a CPU-client-only knob, so
    # harmless on TPU pods); probing the backend here would prematurely
    # initialize it, which breaks multi-process device aggregation
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:
        pass  # flag absent on this jax version; XLA default applies
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def pod_mesh(n_time: int = 1):
    """Global mesh over every chip in the slice: time x channel axes."""
    n = jax.device_count()
    assert n % n_time == 0
    return make_mesh(n_time, n // n_time)


def local_channel_indices(mesh, batch: int) -> np.ndarray:
    """Sorted global channel indices this host feeds/drains, given a
    channel-sharded batch over the mesh's CH axis. Always correct, even
    when the host's channel shards are non-contiguous."""
    n_ch = mesh.shape[CH_AXIS]
    per_shard = batch // n_ch
    ax = mesh.axis_names.index(CH_AXIS)
    dev = mesh.devices
    pid = jax.process_index()
    ch_ids = sorted({
        idx[ax]
        for idx in np.ndindex(dev.shape)
        if dev[idx].process_index == pid
    })
    if not ch_ids:
        return np.zeros(0, dtype=np.int64)
    return np.concatenate(
        [np.arange(c * per_shard, (c + 1) * per_shard) for c in ch_ids]
    )


def local_channel_slice(mesh, batch: int) -> slice:
    """The [start, stop) channel range this host feeds/drains.

    Raises if this host's channel shards are non-contiguous (possible
    with custom device orderings) — use local_channel_indices then."""
    idx = local_channel_indices(mesh, batch)
    if idx.size == 0:
        return slice(0, 0)
    if idx.size != idx[-1] - idx[0] + 1:
        raise ValueError(
            "this host owns non-contiguous channel shards "
            f"({idx.tolist()}); use local_channel_indices()"
        )
    return slice(int(idx[0]), int(idx[-1]) + 1)


def put_global(tree, shardings):
    """Assemble process-spanning global arrays from host data.

    Every process passes the same full-size host values (or at least
    values correct on its addressable shards); each host materializes
    only its local shards. This is the multi-host replacement for
    jax.device_put(x, sharding), which cannot address remote devices.
    """
    def one(x, s):
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, s, lambda i: x[i])

    return jax.tree.map(
        one, tree, shardings,
        is_leaf=lambda v: isinstance(v, (np.ndarray, jax.Array)),
    )
