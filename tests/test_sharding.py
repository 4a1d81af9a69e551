"""Multi-device correctness: the time-block x channel sharded encoder must
produce results exactly equal to the sequential encoder (bit-identical
uint8/int paths; identical float32 arithmetic by construction), on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.models.encoder import encode_fields, init_state
from atsc_tpu.parallel.field_shard import ShardedEncoder, dryrun
from atsc_tpu.parallel.mesh import make_mesh


def _sequential(ts_fields):
    state, iq = encode_fields(init_state(ts_fields.shape[1]), jnp.asarray(ts_fields))
    return state, np.asarray(iq)


@pytest.mark.parametrize("n_time,n_ch,f_dev", [(4, 2, 1), (2, 2, 2), (8, 1, 1)])
def test_sharded_equals_sequential(golden, n_time, n_ch, f_dev):
    t_total = n_time * f_dev
    batch = n_ch  # one channel per ch-shard
    rng = np.random.default_rng(7)
    ts = rng.integers(0, 256, size=(t_total, batch, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts[..., :: P.MPEG2_BYTES] = 0x47

    seq_state, seq_iq = _sequential(ts)

    mesh = make_mesh(n_time, n_ch)
    enc = ShardedEncoder(mesh, batch=batch, fields_per_device=f_dev)
    state = enc.init_state()
    state, iq = enc.step(state, ts)
    iq = np.asarray(iq)

    # IQ: identical arithmetic, but XLA fusion order may differ by an ulp
    np.testing.assert_allclose(iq, seq_iq, atol=1e-6)

    # carried state must match exactly so streams continue seamlessly
    np.testing.assert_array_equal(
        np.asarray(state.prev_rs), np.asarray(seq_state.prev_rs)
    )
    for leaf in ("trellis_d", "trellis_d1", "trellis_d2", "parity"):
        np.testing.assert_array_equal(
            np.asarray(getattr(state, leaf)), np.asarray(getattr(seq_state, leaf))
        )
    np.testing.assert_array_equal(np.asarray(state.saved), np.asarray(seq_state.saved))
    np.testing.assert_array_equal(
        np.asarray(state.phasor), np.asarray(seq_state.phasor)
    )


def test_multi_step_continuity(golden):
    """Two consecutive sharded steps == one sequential run of 2*T fields."""
    n_time, n_ch, f_dev = 2, 2, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(3)
    ts = rng.integers(
        0, 256, size=(2 * t_total, batch, P.FIELD_TS_BYTES), dtype=np.uint8
    )

    _, seq_iq = _sequential(ts)

    mesh = make_mesh(n_time, n_ch)
    enc = ShardedEncoder(mesh, batch=batch, fields_per_device=f_dev)
    state = enc.init_state()
    state, iq1 = enc.step(state, ts[:t_total])
    state, iq2 = enc.step(state, ts[t_total:])
    got = np.concatenate([np.asarray(iq1), np.asarray(iq2)], axis=0)
    np.testing.assert_allclose(got, seq_iq, atol=1e-6)


def _force_fused_interpret(monkeypatch):
    """Route the sharded encoder's back half through the fused Pallas
    kernel (interpret mode — CPU has no Mosaic lowering), exactly the
    branch a real TPU mesh executes."""
    import functools

    from atsc_tpu.ops.pallas import offset_fir as mod

    monkeypatch.setenv("ATSC_TPU_FUSED", "1")
    monkeypatch.setattr(
        mod, "offset_fir_fused",
        functools.partial(mod.offset_fir_fused, interpret=True),
    )


def test_sharded_fused_matches_sequential(golden, monkeypatch):
    """The fused-Pallas sharded path == sequential unfused (<=2e-6, the
    fused kernel's own tolerance vs the unfused ops)."""
    n_time, n_ch, f_dev = 2, 2, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(11)
    ts = rng.integers(
        0, 256, size=(t_total, batch, P.FIELD_TS_BYTES), dtype=np.uint8
    )
    seq_state, seq_iq = _sequential(ts)

    _force_fused_interpret(monkeypatch)
    mesh = make_mesh(n_time, n_ch)
    enc = ShardedEncoder(mesh, batch=batch, fields_per_device=f_dev)
    state = enc.init_state()
    state, iq = enc.step(state, ts)
    iq = np.asarray(iq)

    n = P.SYMBOLS_PER_FIELD
    assert iq.shape[-1] >= n
    np.testing.assert_allclose(iq[..., :n], seq_iq[..., :n], atol=2e-6)
    np.testing.assert_array_equal(
        np.asarray(state.prev_rs), np.asarray(seq_state.prev_rs)
    )
    np.testing.assert_array_equal(
        np.asarray(state.saved), np.asarray(seq_state.saved)
    )


def test_sharded_quantized_output(golden, monkeypatch):
    """cs8 from the fused sharded path agrees with the sequential XLA
    quantizer to <=1 LSB (phasor rotation applied in a different place)."""
    from atsc_tpu.ops.quantize import quantize_iq

    n_time, n_ch, f_dev = 2, 1, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(13)
    ts = rng.integers(
        0, 256, size=(t_total, batch, P.FIELD_TS_BYTES), dtype=np.uint8
    )
    _, seq_iq = _sequential(ts)
    want = np.asarray(quantize_iq(jnp.asarray(seq_iq), "cs8"))

    _force_fused_interpret(monkeypatch)
    mesh = make_mesh(n_time, n_ch)
    enc = ShardedEncoder(
        mesh, batch=batch, fields_per_device=f_dev, out_format="cs8"
    )
    state = enc.init_state()
    state, iq = enc.step(state, ts)
    iq = np.asarray(iq)

    assert iq.dtype == np.int8
    n = P.SYMBOLS_PER_FIELD
    diff = np.abs(
        iq[..., :n].astype(np.int32) - want[..., :n].astype(np.int32)
    )
    assert diff.max() <= 1


def test_dryrun_entrypoint():
    dryrun(8)
