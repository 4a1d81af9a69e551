"""CS16/CS8 quantized-output paths: in-kernel quantization vs the XLA op,
scale headroom, and the quantized end-to-end encode (a capability the
reference lacks — it emits CF32 only and leaves wire-format conversion to
the SDR driver, reference util/atsc_encoder.cpp:75-76)."""

import jax.numpy as jnp
import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, init_state, iq_interleave
from atsc_tpu.ops.pallas.offset_fir import offset_fir_fused
from atsc_tpu.ops.quantize import (
    QMAX,
    dequantize_iq,
    iq_peak,
    quantize_iq,
    quantize_scale,
)
from tests.test_pallas_kernels import _symbols_from_levels


def test_iq_peak_bounds_golden(golden):
    """The analytic full-scale bound must dominate every golden field with
    sane headroom (not clip, not waste most of the integer range)."""
    peak = iq_peak()
    g = np.abs(golden["iq"]).max()
    assert g < peak
    assert g > 0.2 * peak  # scale is not absurdly conservative


@pytest.mark.parametrize("fmt", ["cs16", "cs8"])
def test_fused_quantized_matches_xla_quantizer(golden, fmt):
    levels = golden["sync"][:2].real.astype(np.float32)
    sym = jnp.asarray(_symbols_from_levels(levels))
    phasor = jnp.asarray([[1.0, 0.0], [0.6, -0.8]], jnp.float32)

    f32 = np.asarray(
        offset_fir_fused(sym, phasor, interpret=True, out_format="cf32")
    )
    want = np.asarray(quantize_iq(jnp.asarray(f32), fmt))
    got = np.asarray(
        offset_fir_fused(sym, phasor, interpret=True, out_format=fmt)
    )
    assert got.dtype == want.dtype
    assert got.shape == (2, 2, 2048 * 128)
    n = P.SYMBOLS_PER_FIELD
    # identical math modulo fp32 association; codes agree to <= 1 LSB
    diff = np.abs(got[..., :n].astype(np.int32) - want[..., :n].astype(np.int32))
    assert diff.max() <= 1
    assert (diff != 0).mean() < 1e-3


@pytest.mark.parametrize("fmt", ["cs16", "cs8"])
def test_quantized_encode_end_to_end(golden, fmt):
    """Full pipeline with quantized output: dequantized IQ within one
    quantization step of the golden CF32 IQ, with zero clipping."""
    ts = golden["input"][:1]  # (1, 58656) first field
    state = init_state(1)
    enc = Encoder(batch=1, out_format=fmt, donate=False)
    enc.state = state
    iq = np.asarray(enc.encode(ts))
    assert iq.dtype == (np.int16 if fmt == "cs16" else np.int8)
    assert np.abs(iq.astype(np.int32)).max() < QMAX[fmt]  # no clipping
    wire = iq_interleave(iq)  # (1, 260416, 2) int codes
    deq = dequantize_iq(wire[0], fmt)
    want = golden["iq"][0]
    err = np.abs((deq[:, 0] + 1j * deq[:, 1]) - want).max()
    lsb = 1.0 / quantize_scale(fmt)
    assert err < 0.75 * lsb + 5e-6, (err, lsb)


@pytest.mark.parametrize("fmt", ["cs16", "cs8"])
def test_kernel_wire_layout_matches_planar_bytes(golden, fmt):
    """wire=True: the kernel packs each (I, Q) pair into one LE lane —
    its raw bytes must equal the interleaved bytes of the planar path
    (the contract that lets the host write the array verbatim)."""
    from atsc_tpu.ops.quantize import pack_wire, unpack_wire

    levels = golden["sync"][:2].real.astype(np.float32)
    sym = jnp.asarray(_symbols_from_levels(levels))
    phasor = jnp.asarray([[1.0, 0.0], [0.6, -0.8]], jnp.float32)

    planar = np.asarray(
        offset_fir_fused(sym, phasor, interpret=True, out_format=fmt)
    )
    wirearr = np.asarray(
        offset_fir_fused(sym, phasor, interpret=True, out_format=fmt,
                         wire=True)
    )
    assert wirearr.dtype == (np.int32 if fmt == "cs16" else np.int16)
    n = P.SYMBOLS_PER_FIELD
    want_bytes = iq_interleave(planar).tobytes()
    got_bytes = np.ascontiguousarray(wirearr[:, :n]).tobytes()
    assert got_bytes == want_bytes
    # pack/unpack oracles agree with the kernel
    np.testing.assert_array_equal(
        np.asarray(pack_wire(jnp.asarray(planar), fmt)), wirearr
    )
    np.testing.assert_array_equal(
        unpack_wire(wirearr[:, :n], fmt), planar[..., :n]
    )


@pytest.mark.parametrize("fmt", ["cs8"])
def test_encoder_wire_path_bytes_identical(golden, fmt):
    """Encoder(wire=True) output bytes == planar Encoder + host
    interleave, through the full pipeline (XLA fallback on CPU) — for
    both encode() and the scanned encode_many()."""
    ts = golden["input"][:1]
    planar_enc = Encoder(batch=1, out_format=fmt, donate=False)
    wire_enc = Encoder(batch=1, out_format=fmt, wire=True, donate=False)
    planar = np.asarray(planar_enc.encode(ts))
    wirearr = np.asarray(wire_enc.encode(ts))
    n = P.SYMBOLS_PER_FIELD
    assert iq_interleave(planar).tobytes() == \
        np.ascontiguousarray(wirearr[:, :n]).tobytes()

    many_p = Encoder(batch=1, out_format=fmt, donate=False)
    many_w = Encoder(batch=1, out_format=fmt, wire=True, donate=False)
    pl = np.asarray(many_p.encode_many(golden["input"][:2, None, :]))
    wi = np.asarray(many_w.encode_many(golden["input"][:2, None, :]))
    assert wi.ndim == 3  # (T, B, N) packed lanes, not planar
    assert iq_interleave(pl).tobytes() == \
        np.ascontiguousarray(wi[..., :n]).tobytes()


def test_cli_wire_output_matches_planar(golden, tmp_path):
    """encode --format cs8 writes byte-identical files through the wire
    fast path (IqSink) and the generic planar path (mux/resample sinks
    force planar; this pins the two encode outputs to each other)."""
    from atsc_tpu.cli import main

    ts_path = tmp_path / "in.ts"
    golden["input"][:2].tofile(ts_path)
    out_wire = tmp_path / "wire.iq"
    main(["encode", str(ts_path), "-o", str(out_wire), "--format", "cs8"])
    # reference bytes from the planar encoder + host interleave
    enc = Encoder(batch=1, out_format="cs8", donate=False)
    want = b"".join(
        iq_interleave(np.asarray(enc.encode(golden["input"][k:k + 1])))
        .tobytes()
        for k in range(2)
    )
    assert out_wire.read_bytes() == want


def test_quantize_roundtrip_codes():
    rng = np.random.default_rng(7)
    x = rng.uniform(-iq_peak(), iq_peak(), size=(4, 256)).astype(np.float32)
    for fmt in ("cs16", "cs8"):
        q = np.asarray(quantize_iq(jnp.asarray(x), fmt))
        want = np.clip(
            np.rint(x * np.float32(quantize_scale(fmt))), -QMAX[fmt], QMAX[fmt]
        ).astype(q.dtype)
        np.testing.assert_array_equal(q, want)
