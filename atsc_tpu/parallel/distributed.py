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

from atsc_tpu.parallel.mesh import CH_AXIS, make_mesh


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Join the multi-host runtime (no-op on a single host)."""
    if num_processes is None or num_processes <= 1:
        return
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


def local_channel_slice(mesh, batch: int) -> slice:
    """The [start, stop) channel range this host feeds/drains, given a
    channel-sharded batch laid out over the mesh's CH axis."""
    n_ch = mesh.shape[CH_AXIS]
    per_shard = batch // n_ch
    local = [d for d in mesh.devices.flatten() if d.process_index == jax.process_index()]
    ch_ids = sorted(
        {list(mesh.devices.flatten()).index(d) % n_ch for d in local}
    )
    if not ch_ids:
        return slice(0, 0)
    return slice(min(ch_ids) * per_shard, (max(ch_ids) + 1) * per_shard)
