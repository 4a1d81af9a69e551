"""Overlap-save sample sharding must equal the unsharded offset+FIR."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from atsc_tpu import params as P
from atsc_tpu.ops.offset import apply_pilot_offset
from atsc_tpu.ops.rrc_filter import rrc_filter_field
from atsc_tpu.parallel.sample_shard import SP_AXIS, SampleShardedFilter


@pytest.mark.parametrize("n_sp", [2, 8])
def test_sample_sharded_filter_matches_unsharded(golden, n_sp):
    mesh = Mesh(np.asarray(jax.devices()[:n_sp]), (SP_AXIS,))
    filt = SampleShardedFilter(mesh)

    sync = golden["sync"].real.astype(np.float32)  # (4, 261248) incl padding
    phasor = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (4, 1))
    # replay the sequential per-field phasors
    from atsc_tpu.tables.oscillator import phasor_for_field

    ph = np.stack(
        [[phasor_for_field(f).real, phasor_for_field(f).imag] for f in range(4)]
    ).astype(np.float32)
    parity = jnp.asarray([0, 1, 0, 1], jnp.int32)

    got = np.asarray(
        filt(jnp.asarray(sync[:, : P.SYMBOLS_PER_FIELD]), jnp.asarray(ph), parity)
    )
    want_c = golden["iq"]
    got_c = (got[..., 0] + 1j * got[..., 1]).astype(np.complex64)
    err = np.abs(got_c - want_c).max()
    assert err < 5e-6, err
