"""Soft-decision Viterbi trellis decoding: exactness on clean levels and
coding gain over hard slicing under AWGN (the reference has no receive
path at all; this is the ML decoder its trellis code calls for)."""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.decoder import Decoder, SoftDecoder
from tests.test_decoder import _encode_symbol_fields, _random_ts

N = P.SYMBOLS_PER_FIELD


def _levels(fields: np.ndarray) -> np.ndarray:
    """(T, B, >=N) int8 symbol fields -> (T, B, N) float32 ideal levels."""
    return fields[..., :N].astype(np.float32) * 2 - 7 + np.float32(
        P.PILOT_OFFSET
    )


def test_viterbi_matches_hard_on_clean_levels():
    """Noiseless levels: the ML decode equals the hard inverse bit-exactly
    over consecutive fields (path metrics / precoder state carry)."""
    rng = np.random.default_rng(83)
    ts = _random_ts(rng, 3, 2)
    lev = _levels(_encode_symbol_fields(ts))
    soft = SoftDecoder(batch=2)
    for k in range(3):
        out, nerr = soft.decode(lev[k])
        assert (nerr >= 0).all()
        if k > 0:
            np.testing.assert_array_equal(out, ts[k - 1])
    assert soft.segments_corrected == 0
    assert soft.segments_uncorrectable == 0


def test_iq_receiver_soft_trellis_on_noisy_capture():
    """End-to-end IQ receiver with trellis='soft': a capture noisy
    enough to defeat the hard-slicing receiver still decodes exactly."""
    from atsc_tpu.models.receiver import IqReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(97)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    noise = (rng.normal(size=iq.shape) + 1j * rng.normal(size=iq.shape))
    y = iq + noise * 0.035

    hard = IqReceiver(batch=1)
    hard_out = hard.push(y) + hard.flush()
    hard_ok = all(
        (nerr >= 0).all() and np.array_equal(out, ts[k])
        for k, (out, nerr) in enumerate(hard_out)
    )
    assert not hard_ok, "noise too benign: hard receiver already decodes"

    soft = IqReceiver(batch=1, trellis="soft")
    got = soft.push(y) + soft.flush()
    assert len(got) == 2
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])


def test_viterbi_coding_gain_over_hard_slicing():
    """AWGN where hard slicing floods RS beyond its 10-byte/segment
    budget: the Viterbi path still recovers the TS exactly."""
    rng = np.random.default_rng(89)
    ts = _random_ts(rng, 3, 1)
    lev = _levels(_encode_symbol_fields(ts))
    noisy = lev + rng.normal(size=lev.shape).astype(np.float32) * 0.6

    hard = Decoder(batch=1)
    hard_ok = True
    for k in range(3):
        sym = np.clip(np.rint((noisy[k] - P.PILOT_OFFSET + 7) / 2), 0, 7)
        out, nerr = hard.decode(sym.astype(np.int8))
        if k > 0:
            hard_ok = hard_ok and (nerr >= 0).all() and np.array_equal(
                out, ts[k - 1]
            )
    assert not hard_ok, "noise too benign: hard slicing already decodes"

    soft = SoftDecoder(batch=1)
    for k in range(3):
        out, nerr = soft.decode(noisy[k])
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        if k > 0:
            np.testing.assert_array_equal(out, ts[k - 1])
    assert soft.segments_corrected > 0  # RS really was needed


def test_chunked_viterbi_matches_full():
    """Chunk-parallel Viterbi (independent chunks + warmup halos) must
    produce byte-identical decodes to the full-sequence MLSE on clean
    symbols and at 14 dB SNR, for both the plain and the partial-response
    (NTSC comb) trellises, including carried state across fields."""
    import jax.numpy as jnp

    from atsc_tpu.ops.decode import decommutate_field
    from atsc_tpu.ops.ntsc import (
        comb_field,
        init_pr_metrics,
        viterbi_pr_decode_field,
    )
    from atsc_tpu.ops.viterbi import init_metrics, viterbi_decode_field

    rng = np.random.default_rng(101)
    ts = _random_ts(rng, 2, 2)
    fields = _encode_symbol_fields(ts)
    b = fields.shape[1]

    for snr_db in (None, 14.0):
        zf = jnp.zeros((b, 12), jnp.int32)
        zc = jnp.zeros((b, 12), jnp.int32)
        zpf = jnp.zeros((b, 12), jnp.int32)
        zpc = jnp.zeros((b, 12), jnp.int32)
        mf, mc = init_metrics(b), init_metrics(b)
        mpf, mpc = init_pr_metrics(b), init_pr_metrics(b)
        for k in range(fields.shape[0]):
            lev = fields[k].astype(np.float64) * 2 - 7 + P.PILOT_OFFSET
            if snr_db is not None:
                sig = np.mean((fields[k] * 2 - 7.0) ** 2)
                lev = lev + rng.normal(
                    0, np.sqrt(sig / 10 ** (snr_db / 10)), lev.shape
                )
            levj = jnp.asarray(lev.astype(np.float32))
            soft = decommutate_field(levj)
            bf, zf, mf = viterbi_decode_field(soft, zf, mf)
            bc, zc, mc = viterbi_decode_field(soft, zc, mc, n_chunks=24)
            np.testing.assert_array_equal(np.asarray(bf), np.asarray(bc))
            y = decommutate_field(comb_field(levj))
            bpf, zpf, mpf = viterbi_pr_decode_field(y, zpf, mpf)
            bpc, zpc, mpc = viterbi_pr_decode_field(y, zpc, mpc, n_chunks=24)
            np.testing.assert_array_equal(np.asarray(bpf), np.asarray(bpc))


def test_pallas_viterbi_kernel_bit_identical():
    """The fused Pallas ACS/traceback kernel (interpret mode here; the
    real-chip twin is tools/chip_gauntlet.py) is bit-identical to the
    XLA scan path: same metrics, decisions, packed bytes, and carried
    state — by construction (identical f32 op orderings), verified."""
    import jax.numpy as jnp

    from atsc_tpu.ops.pallas.viterbi_acs import viterbi_field_pallas
    from atsc_tpu.ops.viterbi import (
        init_metrics,
        viterbi_bits,
    )

    b, ne, t = 32, P.TRELLIS_ENCODERS, 96   # B*12 % 128 == 0, t % 96 == 0
    rng = np.random.default_rng(7)
    ideal = rng.integers(0, 8, size=(b, ne, t)) * 2 - 7 + P.PILOT_OFFSET
    levels = jnp.asarray(
        (ideal + rng.normal(0, 1.0, ideal.shape)).astype(np.float32)
    )
    metrics = init_metrics(b)
    z2_prev = jnp.asarray(rng.integers(0, 2, (b, ne)), jnp.int32)

    by_p, z2_p, m_p = viterbi_field_pallas(
        levels, z2_prev, metrics, interpret=True
    )

    x1, z2, m_x = viterbi_bits(levels, metrics)
    z2s = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = np.asarray(z2 ^ z2s).reshape(b, ne, t // 4, 4)
    x1p = np.asarray(x1).reshape(b, ne, t // 4, 4)
    w2 = np.array([128, 32, 8, 2])
    w1 = np.array([64, 16, 4, 1])
    bytes_x = (x2 * w2 + x1p * w1).sum(-1).astype(np.uint8)

    np.testing.assert_array_equal(np.asarray(by_p), bytes_x)
    np.testing.assert_array_equal(np.asarray(z2_p), np.asarray(z2)[..., -1])
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_x))


def test_pallas_viterbi_metric_carry_across_fields():
    """Carried path metrics and precoder state chain across consecutive
    fields exactly as the XLA path's do (the trellis never resets)."""
    import jax.numpy as jnp

    from atsc_tpu.ops.pallas.viterbi_acs import viterbi_field_pallas
    from atsc_tpu.ops.viterbi import init_metrics, viterbi_bits

    b, ne, t = 32, P.TRELLIS_ENCODERS, 48
    rng = np.random.default_rng(11)
    metrics_p = metrics_x = init_metrics(b)
    z2_p = z2_x = jnp.zeros((b, ne), jnp.int32)
    for _ in range(3):
        ideal = rng.integers(0, 8, size=(b, ne, t)) * 2 - 7 + P.PILOT_OFFSET
        levels = jnp.asarray(
            (ideal + rng.normal(0, 0.8, ideal.shape)).astype(np.float32)
        )
        by, z2_p, metrics_p = viterbi_field_pallas(
            levels, z2_p, metrics_p, interpret=True
        )
        x1, z2, metrics_x = viterbi_bits(levels, metrics_x)
        np.testing.assert_array_equal(
            np.asarray(metrics_p), np.asarray(metrics_x)
        )
        z2_x = z2[..., -1]
        np.testing.assert_array_equal(np.asarray(z2_p), np.asarray(z2_x))


def test_pallas_pr_viterbi_kernel_bit_identical():
    """The fused 16-state partial-response kernel (NTSC tier) matches
    the XLA scan path bit-for-bit, including segment-sync reset steps
    (8 land inside this window)."""
    import jax.numpy as jnp

    from atsc_tpu.ops.ntsc import (
        _pr_acs_scan,
        _pr_reset_tables,
        _pr_traceback_step,
        init_pr_metrics,
    )
    from atsc_tpu.ops.pallas.viterbi_acs import viterbi_pr_field_pallas
    from atsc_tpu.ops.viterbi import _traceback_scan

    b, ne, t = 32, P.TRELLIS_ENCODERS, 96
    rng = np.random.default_rng(3)
    y = jnp.asarray(rng.normal(0, 6.0, size=(b, ne, t)).astype(np.float32))
    metrics = init_pr_metrics(b)
    z2_prev = jnp.asarray(rng.integers(0, 2, (b, ne)), jnp.int32)

    reset, const = _pr_reset_tables()
    assert reset[:t].sum() > 0     # the reset branch is exercised
    xs = (jnp.moveaxis(y, -1, 0), jnp.asarray(reset[:t]),
          jnp.asarray(const[:t]))
    m_x, decs_x = _pr_acs_scan(metrics, xs, unroll=24)
    start = jnp.argmin(m_x, axis=-1).astype(jnp.int32)
    x1, z2 = _traceback_scan(start, decs_x, unroll=24,
                             step=_pr_traceback_step)
    x1 = jnp.moveaxis(x1, 0, -1)
    z2 = jnp.moveaxis(z2, 0, -1)

    by_p, z2_p, m_p = viterbi_pr_field_pallas(
        y, z2_prev, metrics, interpret=True
    )
    z2s = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = np.asarray(z2 ^ z2s).reshape(b, ne, t // 4, 4)
    x1p = np.asarray(x1).reshape(b, ne, t // 4, 4)
    bytes_x = (x2 * np.array([128, 32, 8, 2])
               + x1p * np.array([64, 16, 4, 1])).sum(-1).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(by_p), bytes_x)
    np.testing.assert_array_equal(np.asarray(z2_p), np.asarray(z2)[..., -1])
    # CPU-only seam: XLA's CPU codegen FMA-fuses the kernel's
    # metric + (a+pe)^2 accumulate when compiling the interpreted kernel,
    # so PR metrics can differ by ~1 ulp-of-branch-metric here (the
    # 4-state kernel's adds are separated by a min, so it is immune).
    # On the TPU backend both paths are bit-identical — asserted by the
    # on-chip probes (PERF.md round 4) and tools/chip_gauntlet.py.
    np.testing.assert_allclose(np.asarray(m_p), np.asarray(m_x),
                               rtol=1e-4, atol=1e-3)


def test_iq_receiver_soft_i8_tier():
    """The quantized soft-level tier (trellis='soft-i8') decodes the
    same noisy capture the f32 soft tier does — int8 level codes move
    through eq/gather/transpose, dequantized inside the Viterbi step."""
    from atsc_tpu.models.receiver import IqReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(97)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    noise = (rng.normal(size=iq.shape) + 1j * rng.normal(size=iq.shape))
    y = iq + noise * 0.035

    rx = IqReceiver(batch=1, trellis="soft-i8")
    got = rx.push(y) + rx.flush()
    assert len(got) == 2
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])

    import pytest

    with pytest.raises(ValueError, match="soft-i8"):
        IqReceiver(batch=1, trellis="soft-i8", erasures="burst")
    with pytest.raises(ValueError, match="soft-i8"):
        IqReceiver(batch=1, trellis="soft-i8", backend="adaptive")


def test_pallas_viterbi_i8_bit_identical_to_xla_i8():
    """On int8 level codes the Pallas kernel and the XLA fallback
    dequantize with the same f32 multiply, so the two quantized tiers
    are bit-identical to each other (interpret mode)."""
    import jax.numpy as jnp

    from atsc_tpu.ops.pallas.viterbi_acs import viterbi_field_pallas
    from atsc_tpu.ops.quantize import SOFT_LEVEL_INV, quantize_soft_levels
    from atsc_tpu.ops.viterbi import init_metrics, viterbi_bits

    b, ne, t = 32, P.TRELLIS_ENCODERS, 96
    rng = np.random.default_rng(13)
    ideal = rng.integers(0, 8, size=(b, ne, t)) * 2 - 7 + P.PILOT_OFFSET
    lev_f32 = jnp.asarray(
        (ideal + rng.normal(0, 1.0, ideal.shape)).astype(np.float32)
    )
    codes = quantize_soft_levels(lev_f32)
    assert codes.dtype == jnp.int8
    metrics = init_metrics(b)
    z2_prev = jnp.zeros((b, ne), jnp.int32)

    by_p, z2_p, m_p = viterbi_field_pallas(
        codes, z2_prev, metrics, interpret=True
    )

    deq = codes.astype(jnp.float32) * jnp.float32(SOFT_LEVEL_INV)
    x1, z2, m_x = viterbi_bits(deq, metrics)
    z2s = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = np.asarray(z2 ^ z2s).reshape(b, ne, t // 4, 4)
    x1p = np.asarray(x1).reshape(b, ne, t // 4, 4)
    bytes_x = (x2 * np.array([128, 32, 8, 2])
               + x1p * np.array([64, 16, 4, 1])).sum(-1).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(by_p), bytes_x)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_x))


def test_chunked_viterbi_i8_matches_full():
    """int8 level codes dequantize identically on both XLA branches
    (full and chunk-parallel `--viterbi-chunks`): each is byte-for-byte
    equal to a manual f32 dequantization of the same codes, across a
    field boundary. (Chunked vs full may legitimately differ in a
    handful of warmup-seam bytes at threshold noise — the documented
    RS-absorbed case — so the dequantization contract is what this test
    pins.)"""
    import jax.numpy as jnp

    from atsc_tpu.ops.decode import decommutate_field
    from atsc_tpu.ops.quantize import SOFT_LEVEL_INV, quantize_soft_levels
    from atsc_tpu.ops.viterbi import init_metrics, viterbi_decode_field

    rng = np.random.default_rng(103)
    ts = _random_ts(rng, 2, 2)
    fields = _encode_symbol_fields(ts)
    b = fields.shape[1]
    # four independent carried states: (i8, f32) x (full, chunked)
    st = {key: (jnp.zeros((b, 12), jnp.int32), init_metrics(b))
          for key in ("i8f", "f32f", "i8c", "f32c")}
    for k in range(fields.shape[0]):
        lev = fields[k].astype(np.float64) * 2 - 7 + P.PILOT_OFFSET
        sig = np.mean((fields[k] * 2 - 7.0) ** 2)
        lev = lev + rng.normal(0, np.sqrt(sig / 10 ** 1.4), lev.shape)
        codes = quantize_soft_levels(jnp.asarray(lev.astype(np.float32)))
        soft = decommutate_field(codes)
        assert soft.dtype == jnp.int8
        deq = soft.astype(jnp.float32) * jnp.float32(SOFT_LEVEL_INV)
        by = {}
        for key, obs, chunks in (("i8f", soft, 1), ("f32f", deq, 1),
                                 ("i8c", soft, 24), ("f32c", deq, 24)):
            z, m = st[key]
            by[key], z, m = viterbi_decode_field(obs, z, m,
                                                 n_chunks=chunks)
            st[key] = (z, m)
        np.testing.assert_array_equal(np.asarray(by["i8f"]),
                                      np.asarray(by["f32f"]))
        np.testing.assert_array_equal(np.asarray(by["i8c"]),
                                      np.asarray(by["f32c"]))


def test_pallas_viterbi_pads_odd_batches():
    """Batches not divisible by 32 are zero-padded into the kernel and
    sliced back — output identical to the XLA path at B=5 (the class of
    shapes a B=1 CLI decode hits)."""
    import jax.numpy as jnp

    from atsc_tpu.ops.pallas.viterbi_acs import viterbi_field_pallas
    from atsc_tpu.ops.viterbi import init_metrics, viterbi_bits

    b, ne, t = 5, P.TRELLIS_ENCODERS, 48
    rng = np.random.default_rng(17)
    ideal = rng.integers(0, 8, size=(b, ne, t)) * 2 - 7 + P.PILOT_OFFSET
    levels = jnp.asarray(
        (ideal + rng.normal(0, 1.0, ideal.shape)).astype(np.float32)
    )
    metrics = init_metrics(b)
    z2_prev = jnp.asarray(rng.integers(0, 2, (b, ne)), jnp.int32)
    by_p, z2_p, m_p = viterbi_field_pallas(
        levels, z2_prev, metrics, interpret=True
    )
    assert by_p.shape == (b, ne, t // 4)
    x1, z2, m_x = viterbi_bits(levels, metrics)
    z2s = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = np.asarray(z2 ^ z2s).reshape(b, ne, t // 4, 4)
    x1p = np.asarray(x1).reshape(b, ne, t // 4, 4)
    bytes_x = (x2 * np.array([128, 32, 8, 2])
               + x1p * np.array([64, 16, 4, 1])).sum(-1).astype(np.uint8)
    np.testing.assert_array_equal(np.asarray(by_p), bytes_x)
    np.testing.assert_array_equal(np.asarray(m_p), np.asarray(m_x))
