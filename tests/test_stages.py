"""Per-stage golden-vector tests for the JAX ops (mirrors the reference's
test strategy, src/atsc/test/*.cpp: byte-exact through the FEC stages,
|delta| < 1e-6 per IQ component afterwards), plus state-carry coverage by
running all 4 consecutive golden fields."""

import jax.numpy as jnp
import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.ops import (
    apply_pilot_offset,
    assemble_field,
    interleave_field,
    randomize_field,
    rrc_filter_field,
    rs_encode_field,
    trellis_encode_field,
)
from atsc_tpu.models.encoder import init_state
from atsc_tpu.ops.assemble import field_levels
from atsc_tpu.tables.trellis_tables import encoder_stream_to_round_major, padded_field_gather


def test_randomize(golden):
    out = randomize_field(jnp.asarray(golden["input"]))
    np.testing.assert_array_equal(
        np.asarray(out).reshape(4, -1), golden["rand"]
    )


def test_rs_encode(golden):
    rand = jnp.asarray(golden["rand"].reshape(4, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES))
    out = rs_encode_field(rand)
    np.testing.assert_array_equal(np.asarray(out).reshape(4, -1), golden["rs"])


def test_interleave_state_carry(golden):
    prev = np.zeros((1, P.DATA_PER_FIELD), dtype=np.uint8)
    for f in range(4):
        cur = golden["rs"][f][None]
        out = interleave_field(jnp.asarray(cur), jnp.asarray(prev))
        np.testing.assert_array_equal(np.asarray(out)[0], golden["il"][f])
        prev = cur


def _symbols_to_padded(symbols):
    """Place trellis symbols into the padded field (data slots only),
    mirroring the golden 'trellis' dump layout (zeros elsewhere)."""
    is_data, src_rm = padded_field_gather()
    src = encoder_stream_to_round_major()[src_rm]
    flat = np.asarray(symbols).reshape(symbols.shape[0], -1)
    levels = flat[:, src].astype(np.float32) * 2 - 7 + np.float32(P.PILOT_OFFSET)
    return np.where(is_data, levels, 0.0)


def test_trellis_state_carry(golden):
    d = d1 = d2 = jnp.zeros((1, 12), dtype=jnp.int32)
    for f in range(4):
        il = jnp.asarray(golden["il"][f][None])
        symbols, d, d1, d2 = trellis_encode_field(il, d, d1, d2)
        padded = _symbols_to_padded(symbols)
        np.testing.assert_allclose(
            padded[0], golden["trellis"][f].real, atol=1e-6
        )
        assert np.abs(golden["trellis"][f].imag).max() == 0.0


def test_assemble_sync(golden):
    d = d1 = d2 = jnp.zeros((1, 12), dtype=jnp.int32)
    state = init_state(1)
    saved, parity = state.saved, state.parity
    for f in range(4):
        il = jnp.asarray(golden["il"][f][None])
        symbols, d, d1, d2 = trellis_encode_field(il, d, d1, d2)
        field, saved = assemble_field(symbols, parity, saved)
        parity = parity ^ 1
        np.testing.assert_allclose(
            np.asarray(field_levels(field))[0], golden["sync"][f].real, atol=1e-6
        )


def test_offset_phase_continuity(golden):
    phasor = jnp.tile(jnp.asarray([1.0, 0.0], dtype=jnp.float32), (1, 1))
    for f in range(4):
        field = jnp.asarray(golden["sync"][f].real[None])
        out, phasor = apply_pilot_offset(field, phasor)
        got = np.asarray(out)[0]
        err = np.abs(
            (got[0] + 1j * got[1]).astype(np.complex64) - golden["offset"][f]
        ).max()
        assert err < 5e-6, (f, err)


def test_rrc_filter(golden):
    planar = jnp.asarray(
        np.stack([golden["offset"].real, golden["offset"].imag], axis=1)
    )
    out = np.asarray(rrc_filter_field(planar))[..., : P.SYMBOLS_PER_FIELD]
    got = (out[:, 0] + 1j * out[:, 1]).astype(np.complex64)
    err = np.abs(got - golden["iq"]).max()
    assert err < 2e-6, err


@pytest.mark.parametrize("stage", ["trellis", "sync"])
def test_imag_is_zero_through_assembly(golden, stage):
    # the signal is purely real until the pilot offset stage
    assert np.abs(golden[stage].imag).max() == 0.0


def test_interleave_enc_major_is_permuted_interleave(golden):
    """The fused enc-major gather equals interleave + the trellis stage's
    round->encoder byte permutation."""
    from atsc_tpu.ops.interleave import interleave_field_enc_major

    prev = np.zeros((1, P.DATA_PER_FIELD), dtype=np.uint8)
    for f in range(2):
        cur = golden["rs"][f][None]
        flat = interleave_field(jnp.asarray(cur), jnp.asarray(prev))
        enc = interleave_field_enc_major(jnp.asarray(cur), jnp.asarray(prev))
        want = (
            np.asarray(flat)
            .reshape(1, P.TRELLIS_ROUNDS, P.TRELLIS_ENCODERS,
                     P.TRELLIS_INPUT_BYTES)
            .transpose(0, 2, 1, 3)
            .reshape(1, P.TRELLIS_ENCODERS, -1)
        )
        np.testing.assert_array_equal(np.asarray(enc), want)
        prev = cur


def test_assemble_structured_equals_gather():
    """Gather-free assembly (transpose + 3 static rolls) is exactly the
    table-driven commutator for random symbols/parity/saved state."""
    from atsc_tpu.ops.assemble import assemble_field_structured

    rng = np.random.default_rng(7)
    sym = jnp.asarray(rng.integers(
        0, 8, size=(3, 12, P.TRELLIS_SYMBOLS_PER_ENCODER), dtype=np.int8))
    saved = jnp.asarray(rng.integers(0, 8, size=(3, 12), dtype=np.int8))
    parity = jnp.asarray([0, 1, 0], dtype=jnp.int32)
    f1, s1 = assemble_field(sym, parity, saved)
    f2, s2 = assemble_field_structured(sym, parity, saved)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(s2))


def test_sync_symbol_template_matches_level_template():
    """Integer-domain sync template xforms to the float-level template at
    every constant slot (except the spec'd zero tail-12)."""
    from atsc_tpu.tables.sync import sync_symbol_templates, sync_templates

    sym_t, is_const_s = sync_symbol_templates()
    lvl_t, is_const = sync_templates()
    np.testing.assert_array_equal(is_const_s, is_const)
    tail = P.PADDED_SYMBOLS - P.RESERVED_SYMBOLS
    lvl_from_sym = sym_t.astype(np.float32) * 2 - 7 + np.float32(P.PILOT_OFFSET)
    mask = is_const.copy()
    mask[tail:] = False
    np.testing.assert_array_equal(lvl_from_sym[:, mask], lvl_t[:, mask])
    assert (lvl_t[:, tail:] == 0.0).all()


def test_rrc_taps_shipped_contract():
    """The derived taps reproduce the shipped numeric contract
    (reference filter.h:71, transcribed in spec/shipped_rrc.py) to within
    1 ulp per tap — the bound rrc_taps() itself enforces at build time.
    Drift here would silently break IQ compatibility on air."""
    from atsc_tpu.spec.shipped_rrc import SHIPPED_RRC_TAPS
    from atsc_tpu.tables.rrc import rrc_taps

    mine = rrc_taps()
    assert mine.dtype == np.float32 and mine.shape == (P.RRC_TAPS,)
    tol = np.spacing(np.abs(SHIPPED_RRC_TAPS).astype(np.float32))
    diff = np.abs(mine - SHIPPED_RRC_TAPS)
    assert (diff <= tol).all(), diff.max()
    # symmetry and the DC-gain contract (sum = 0.1) must hold exactly in
    # float64 terms
    np.testing.assert_array_equal(mine[: P.RRC_NTAPS],
                                  mine[P.RRC_NTAPS - 1 :: -1])
    assert abs(float(mine.sum()) - P.RRC_GAIN) < 1e-7


def test_phasor_native_replay_bit_identical():
    """The native-runtime phasor replay (runtime/tsio.cpp phasor_replay,
    the O(ms)-resume-at-field-1e6 path) must reproduce the numpy float32
    recurrence bit-for-bit — at small k, across stride jumps, and at a
    deep index. Per-step rounding divergence compounds within a handful
    of steps, so the ladder catches any contraction/vectorization
    difference with certainty. Skips cleanly if no native toolchain."""
    from atsc_tpu.runtime.io import phasor_replay_native
    from atsc_tpu.tables.oscillator import (
        _phasor_replay_np,
        field_scale,
        phasor_for_field,
    )

    s = field_scale()
    if phasor_replay_native(s, 1) is None:
        import pytest

        pytest.skip("native tsio runtime unavailable")
    for k in (0, 1, 2, 3, 17, 255, 256, 257, 1000, 4096, 20000):
        assert phasor_replay_native(s, k) == _phasor_replay_np(k), k
        assert phasor_for_field(k) == _phasor_replay_np(k), k


def test_phasor_amplitude_drift_clip_free():
    """Long-run phasor soak (the carried per-field oscillator state):
    |scale| is 1 - 1.52e-8 in float32, so the phasor amplitude SHRINKS
    monotonically (~0.13%/hour) and can never exceed the quantizer's
    +1e-4 clip-free slack (ops/quantize.iq_peak) at ANY field index —
    the reference's own recurrence (offset.h:97-101 multiplies its table
    by the same scale each field) drifts identically. Verifies the
    clip-free bound and the linear-shrink model out to 2^20 fields
    (~7 hours of stream)."""
    import numpy as np

    from atsc_tpu.tables.oscillator import field_scale, phasor_for_field

    rate = abs(complex(np.complex64(field_scale()))) - 1.0
    assert rate < 0, "scale must shrink for the clip-free argument"
    for k in (1_000, 10_000, 65_536, 262_144, 1_048_576):
        amp = abs(phasor_for_field(k))
        assert amp <= 1.0 + 1e-4, (k, amp)          # never clips
        model = (1.0 + rate) ** k
        assert abs(amp - model) < 5e-4 + 0.1 * (1 - model), (
            k, amp, model)                          # linear-shrink model
