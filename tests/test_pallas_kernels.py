"""Pallas fused-kernel correctness vs the unfused reference ops
(interpret mode on CPU; compiled path exercised on TPU by bench)."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.assemble import field_levels
from atsc_tpu.ops.offset import _scale_planar, apply_pilot_offset
from atsc_tpu.ops.pallas.offset_fir import offset_fir_fused
from atsc_tpu.ops.rrc_filter import rrc_filter_field


def _symbols_from_levels(levels: np.ndarray) -> np.ndarray:
    """Invert the signal map on a golden level field -> int8 symbol values.

    The 12-sample padding tail is level 0.0 in the golden dumps (no valid
    symbol); it never reaches a valid FIR output, so symbol 0 is stored.
    """
    sym = np.rint((levels - P.PILOT_OFFSET + 7.0) / 2.0).astype(np.int8)
    tail = P.PADDED_SYMBOLS - P.RESERVED_SYMBOLS
    sym[..., tail:] = 0
    assert (sym >= 0).all() and (sym <= 7).all()
    return sym


def test_offset_fir_fused_matches_unfused(golden):
    levels = golden["sync"][:2].real.astype(np.float32)
    sym = jnp.asarray(_symbols_from_levels(levels))
    # field 0 starts at phase identity; field 1 continues with the per-field
    # phase advance (reference offset.h scale_ multiplication).
    s = _scale_planar()
    phasor = jnp.asarray([[1.0, 0.0], [s[0], s[1]]], jnp.float32)

    iq_padded, _ = apply_pilot_offset(field_levels(sym), phasor)
    want = np.asarray(rrc_filter_field(iq_padded))  # (2, 2, 260480)

    got = np.asarray(offset_fir_fused(sym, phasor, interpret=True))
    assert got.shape == (2, 2, P.PADDED_OUT)
    n = P.SYMBOLS_PER_FIELD
    err = np.abs(got[..., :n] - want[..., :n]).max()
    assert err < 2e-6, err

    # and against golden IQ directly
    got_c = (got[:, 0, :n] + 1j * got[:, 1, :n]).astype(np.complex64)
    assert np.abs(got_c - golden["iq"][:2]).max() < 5e-6


def _encode_two_fields(batch=2):
    from atsc_tpu.models.encoder import Encoder, iq_to_complex

    rng = np.random.default_rng(3)
    ts = rng.integers(0, 256, size=(2, 1, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts[..., :: 188] = 0x47
    enc = Encoder(batch=1, donate=False)
    iq = np.concatenate(
        [iq_to_complex(np.asarray(enc.encode(ts[k]))) for k in range(2)],
        axis=-1,
    )
    return np.broadcast_to(iq, (batch, iq.shape[1])).copy(), ts


def _fused_eq_window(iq, eq_k=128):
    from atsc_tpu.models.receiver import _osc_planar
    from atsc_tpu.ops.pallas.eq_fir import win_len

    L = win_len(eq_k)
    b = iq.shape[0]
    fwin = np.zeros((b, 2, L), np.float32)
    avail = min(L - eq_k, iq.shape[1])
    fwin[:, 0, eq_k : eq_k + avail] = iq.real[:, :avail]
    fwin[:, 1, eq_k : eq_k + avail] = iq.imag[:, :avail]
    return fwin, _osc_planar(-eq_k, -eq_k + L, 0)


def test_eq_fir_fused_matches_xla_fast_tier():
    """The fused derotate+WL-FIR+slice kernel reproduces the XLA 'fast'
    equalizer tier: identical hard symbols, soft levels within bf16
    rounding (<< the 1.0 decision margin) on clean loopback IQ."""
    from atsc_tpu.models.receiver import _device_eq_step, field_window
    from atsc_tpu.ops.pallas.eq_fir import eq_fir_fused

    iq, _ = _encode_two_fields()
    win, osc = field_window(iq, 0)
    want = np.asarray(
        _device_eq_step(False)(jnp.asarray(win), jnp.asarray(osc)))
    want_soft = np.asarray(
        _device_eq_step(True)(jnp.asarray(win), jnp.asarray(osc)))

    fwin, fosc = _fused_eq_window(iq)
    got = np.asarray(eq_fir_fused(
        jnp.asarray(fwin), jnp.asarray(fosc), eq_k=128, interpret=True))
    n = P.SYMBOLS_PER_FIELD
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
    gs = np.asarray(eq_fir_fused(
        jnp.asarray(fwin), jnp.asarray(fosc), eq_k=128, soft=True,
        interpret=True))
    assert np.abs(gs[:, :n] - want_soft[:, :n]).max() < 0.05


def test_eq_fir_fused_quantized_window():
    """Integer-code windows (the cs8 wire format) dequantize in-kernel:
    same hard symbols as the float path on clean IQ."""
    from atsc_tpu.ops.pallas.eq_fir import eq_fir_fused
    from atsc_tpu.ops.quantize import QMAX, quantize_scale

    iq, _ = _encode_two_fields()
    fwin, fosc = _fused_eq_window(iq)
    want = np.asarray(eq_fir_fused(
        jnp.asarray(fwin), jnp.asarray(fosc), eq_k=128, interpret=True))

    s = quantize_scale("cs8")
    codes = np.clip(np.round(fwin * s), -QMAX["cs8"], QMAX["cs8"]).astype(
        np.int8)
    got = np.asarray(eq_fir_fused(
        jnp.asarray(codes), jnp.asarray(fosc), eq_k=128,
        dequant=1.0 / s, interpret=True))
    n = P.SYMBOLS_PER_FIELD
    # int8 quantization noise (~0.04 level rms) can flip symbols whose
    # level is mid-rounding; on clean IQ that is vanishingly rare
    mism = int((got[:, :n] != want[:, :n]).sum())
    assert mism <= 4, mism


def test_iq_receiver_through_fused_eq(monkeypatch):
    """End-to-end IqReceiver decode with the fused equalizer active
    (interpret mode on CPU): byte-exact TS out, proving the fused window
    bounds/oscillator plumbing in the production receiver."""
    import functools

    from atsc_tpu.models import receiver as rx
    from atsc_tpu.ops.pallas import eq_fir as mod

    iq, ts = _encode_two_fields(batch=1)

    rx_plain = rx.IqReceiver(batch=1)
    want = [t for t, _ in rx_plain.push(iq) + rx_plain.flush()]

    monkeypatch.setenv("ATSC_TPU_FUSED", "1")
    monkeypatch.setattr(
        mod, "eq_fir_fused",
        functools.partial(mod.eq_fir_fused, interpret=True))
    rx.device_eq_step.cache_clear()
    try:
        assert rx._fused_eq_enabled("auto")
        rx2 = rx.IqReceiver(batch=1)
        got = [t for t, _ in rx2.push(iq) + rx2.flush()]
    finally:
        rx.device_eq_step.cache_clear()  # drop interpret-mode steps

    assert len(got) == len(want) == 1
    np.testing.assert_array_equal(got[0], want[0])
    np.testing.assert_array_equal(got[0], ts[0])


def test_eq_fir_fused_exact_tier():
    """exact=True (fp32 operands / HIGHEST matmuls, K=256) reproduces the
    XLA 'exact' tier: identical hard symbols, soft levels to f32
    rounding."""
    from atsc_tpu.models.receiver import _device_eq_step, field_window
    from atsc_tpu.ops.pallas.eq_fir import eq_fir_fused

    iq, _ = _encode_two_fields()
    win, osc = field_window(iq, 0)
    want = np.asarray(_device_eq_step(False, profile="exact")(
        jnp.asarray(win), jnp.asarray(osc)))
    want_soft = np.asarray(_device_eq_step(True, profile="exact")(
        jnp.asarray(win), jnp.asarray(osc)))

    fwin, fosc = _fused_eq_window(iq, eq_k=256)
    got = np.asarray(eq_fir_fused(
        jnp.asarray(fwin), jnp.asarray(fosc), eq_k=256, exact=True,
        interpret=True))
    n = P.SYMBOLS_PER_FIELD
    np.testing.assert_array_equal(got[:, :n], want[:, :n])
    gs = np.asarray(eq_fir_fused(
        jnp.asarray(fwin), jnp.asarray(fosc), eq_k=256, soft=True,
        exact=True, interpret=True))
    assert np.abs(gs[:, :n] - want_soft[:, :n]).max() < 1e-5
