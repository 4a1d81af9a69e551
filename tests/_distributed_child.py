"""Child process of test_distributed.py::test_two_process_sharded_encode.

Run as: python _distributed_child.py <process_id> <coordinator_port>

Joins a 2-process jax.distributed runtime (CPU backend, 2 virtual devices
per process -> 4 global devices), builds the global ("time", "ch") mesh,
runs ONE ShardedEncoder step AND one ShardedDecoder step over it, and
checks this process's addressable output/state shards against the
sequential encoder/decoder — the real multi-host execution path of
parallel/distributed.py (both directions), scaled down to one machine.
"""

import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

pid = int(sys.argv[1])
port = sys.argv[2]

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from atsc_tpu.parallel.distributed import (  # noqa: E402
    initialize,
    local_channel_indices,
    local_channel_slice,
    pod_mesh,
    put_global,
)

initialize(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()
assert jax.local_device_count() == 2, jax.local_device_count()

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import (  # noqa: E402
    EncoderState,
    encode_fields,
    init_state,
)
from atsc_tpu.parallel.field_shard import ShardedEncoder  # noqa: E402

# ---- host-assignment helpers on a channel-only mesh ------------------------
mesh_ch = pod_mesh(n_time=1)  # (1, 4): each host owns 2 channel shards
sl = local_channel_slice(mesh_ch, batch=4)
want = slice(0, 2) if pid == 0 else slice(2, 4)
assert (sl.start, sl.stop) == (want.start, want.stop), (sl, pid)
np.testing.assert_array_equal(
    local_channel_indices(mesh_ch, 4), np.arange(want.start, want.stop)
)

# ---- one sharded step on the (2 time, 2 ch) global mesh --------------------
mesh = pod_mesh(n_time=2)
batch = 2
rng = np.random.default_rng(5)
ts = rng.integers(0, 256, size=(2, batch, P.FIELD_TS_BYTES), dtype=np.uint8)
ts[..., :: P.MPEG2_BYTES] = 0x47

enc = ShardedEncoder(mesh, batch=batch, fields_per_device=1)
state_g = put_global(init_state(batch), enc.state_sharding)
ts_g = put_global(ts, enc.ts_sharding)
state_g, iq = enc._step(state_g, ts_g)
jax.block_until_ready(iq)

# sequential reference, replicated on both processes (cheap at this size)
seq_state, seq_iq = encode_fields(init_state(batch), jnp.asarray(ts))
seq_iq = np.asarray(seq_iq)

for shard in iq.addressable_shards:
    np.testing.assert_allclose(
        np.asarray(shard.data), seq_iq[shard.index], atol=1e-6
    )

for name in EncoderState._fields:
    leaf_g = getattr(state_g, name)
    leaf_s = np.asarray(getattr(seq_state, name))
    for shard in leaf_g.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), leaf_s[shard.index])

# ---- one sharded DECODE step over the same global mesh ---------------------
from atsc_tpu.models.decoder import (  # noqa: E402
    Decoder,
    DecoderState,
    init_decoder_state,
)
from atsc_tpu.parallel.rx_shard import ShardedDecoder  # noqa: E402
from tests.test_decoder import _encode_symbol_fields  # noqa: E402

fields = _encode_symbol_fields(ts)      # (2, batch, >=260416) int8
dec = ShardedDecoder(mesh, batch=batch, fields_per_device=1)
dstate_g = put_global(init_decoder_state(batch), dec.state_sharding)
fields_g = put_global(fields, dec.fields_sharding)
dstate_g, cw_g, syn_g = dec._step(dstate_g, fields_g)
jax.block_until_ready(syn_g)

seq = Decoder(batch=batch)
seq_cw, seq_syn = [], []
for k in range(2):
    seq._state, scw, ssyn = seq._step(seq._state, jnp.asarray(fields[k]))
    seq_cw.append(np.asarray(scw))
    seq_syn.append(np.asarray(ssyn))
seq_cw = np.stack(seq_cw)
seq_syn = np.stack(seq_syn)

for shard in cw_g.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), seq_cw[shard.index])
for shard in syn_g.addressable_shards:
    np.testing.assert_array_equal(np.asarray(shard.data), seq_syn[shard.index])
for name in DecoderState._fields:
    leaf_g = getattr(dstate_g, name)
    leaf_s = np.asarray(getattr(seq._state, name))
    for shard in leaf_g.addressable_shards:
        np.testing.assert_array_equal(np.asarray(shard.data), leaf_s[shard.index])

print(f"child-ok {pid}", flush=True)
