"""Receive-side symbol-domain decoder: loopback against the encoder ops,
golden fields, and RS correction of injected symbol errors."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.decoder import Decoder
from atsc_tpu.ops import randomize_field, rs_encode_field, trellis_encode_field
from atsc_tpu.ops.assemble import assemble_field_structured
from atsc_tpu.ops.interleave import interleave_field_enc_major
from atsc_tpu.tables.trellis_tables import commutator_gather
from tests.test_pallas_kernels import _symbols_from_levels


def _random_ts(rng, t: int, b: int) -> np.ndarray:
    """Random transport stream with valid 0x47 packet sync bytes (the
    encoder drops them, so the decoder re-inserts constants — random
    bytes there would be unrecoverable by design)."""
    ts = rng.integers(0, 256, size=(t, b, P.FIELD_TS_BYTES), dtype=np.uint8)
    ts.reshape(t, b, P.DATA_SEGMENTS, P.MPEG2_BYTES)[..., 0] = 0x47
    return ts


def _encode_symbol_fields(ts_fields: np.ndarray) -> np.ndarray:
    """(T, B, 58656) TS -> (T, B, 261248) int8 symbol fields (the encoder
    front half, with the same carried state as models.encoder)."""
    t, b = ts_fields.shape[:2]
    prev_rs = jnp.zeros((b, P.DATA_PER_FIELD), dtype=jnp.uint8)
    d = d1 = d2 = jnp.zeros((b, P.TRELLIS_ENCODERS), dtype=jnp.int32)
    saved = jnp.zeros((b, P.RESERVED_SYMBOLS), dtype=jnp.int8)
    parity = jnp.zeros((b,), dtype=jnp.int32)
    out = []
    for k in range(t):
        rs = rs_encode_field(randomize_field(jnp.asarray(ts_fields[k])))
        rs_flat = rs.reshape(b, -1)
        il = interleave_field_enc_major(rs_flat, prev_rs)
        symbols, d, d1, d2 = trellis_encode_field(il, d, d1, d2)
        field, saved = assemble_field_structured(symbols, parity, saved)
        out.append(np.asarray(field))
        prev_rs, parity = rs_flat, parity ^ 1
    return np.stack(out)


def test_decoder_loopback_random():
    rng = np.random.default_rng(3)
    ts = _random_ts(rng, 4, 2)
    fields = _encode_symbol_fields(ts)
    dec = Decoder(batch=2)
    dec.decode(fields[0])
    for k in range(1, 4):
        out, nerr = dec.decode(fields[k])
        assert (nerr == 0).all()  # clean loopback: no corrections needed
        np.testing.assert_array_equal(out, ts[k - 1])
    assert dec.segments_corrected == 0


def test_decoder_golden(golden):
    fields = _symbols_from_levels(golden["sync"].real.astype(np.float32))
    dec = Decoder(batch=1)
    dec.decode(fields[0:1])
    for k in range(1, 4):
        out, nerr = dec.decode(fields[k : k + 1])
        assert (nerr == 0).all()
        np.testing.assert_array_equal(out[0], golden["input"][k - 1])


def test_decoder_corrects_injected_symbol_errors():
    rng = np.random.default_rng(11)
    ts = _random_ts(rng, 3, 1)
    fields = _encode_symbol_fields(ts).copy()
    # corrupt 25 random data-symbol slots per field (sync slots carry no
    # FEC payload); the deinterleaver spreads the resulting byte errors
    # across segments, keeping each codeword within RS's 10-byte budget
    position, _ = commutator_gather()
    for k in range(3):
        hit = rng.choice(position, size=25, replace=False)
        fields[k, 0, hit] = (fields[k, 0, hit] + rng.integers(1, 8, 25)) % 8
    dec = Decoder(batch=1)
    dec.decode(fields[0])
    for k in range(1, 3):
        out, nerr = dec.decode(fields[k])
        assert (nerr >= 0).all()
        np.testing.assert_array_equal(out, ts[k - 1])
    assert dec.segments_corrected > 0
    assert dec.segments_uncorrectable == 0


def test_decoder_erasure_flags_double_burst_tolerance():
    """A 3000-symbol burst (~750 bytes) deinterleaves to ~14 corrupted
    bytes per segment — beyond the 10-error unknown-position budget but
    within the 20-erasure budget when the burst is flagged. (The plain
    errors-only decoder measurably fails on this length: ~51
    uncorrectable segments; the A/53 interleaver design point is ~500
    bytes.)"""
    rng = np.random.default_rng(5)
    ts = _random_ts(rng, 3, 1)
    fields = _encode_symbol_fields(ts).copy()
    start, length = 5 * 832 + 100, 3000
    fields[1, 0, start : start + length] = rng.integers(
        0, 8, length, dtype=np.int8
    )
    flags = np.zeros((1, P.SYMBOLS_PER_FIELD), np.uint8)
    flags[0, start : start + length] = 1
    zeros = np.zeros_like(flags)
    dec = Decoder(batch=1)
    dec.decode(fields[0], erasure_flags=zeros)
    out1, nerr1 = dec.decode(fields[1], erasure_flags=flags)
    out2, nerr2 = dec.decode(fields[2], erasure_flags=zeros)
    assert (nerr1 >= 0).all() and (nerr2 >= 0).all()
    np.testing.assert_array_equal(out1, ts[0])
    np.testing.assert_array_equal(out2, ts[1])
    assert dec.segments_uncorrectable == 0
    assert dec.segments_erasure_assisted > 40  # erasures did the work


def test_decoder_erasure_flags_carry_across_field_boundary():
    """A burst straddling the boundary between received fields 1 and 2:
    its flags ride the carried interleaved-flag state exactly like the
    data bytes do, so both affected RS output fields decode exactly."""
    rng = np.random.default_rng(9)
    ts = _random_ts(rng, 4, 1)
    fields = _encode_symbol_fields(ts).copy()
    tail, head = 1400, 1400  # ~350+350 bytes around the boundary
    tail_start = P.SYMBOLS_PER_FIELD - tail
    fields[1, 0, tail_start : P.SYMBOLS_PER_FIELD] = rng.integers(
        0, 8, tail, dtype=np.int8
    )
    fields[2, 0, 832 : 832 + head] = rng.integers(0, 8, head, dtype=np.int8)
    flags = np.zeros((4, 1, P.SYMBOLS_PER_FIELD), np.uint8)
    flags[1, 0, tail_start:] = 1
    flags[2, 0, 832 : 832 + head] = 1
    dec = Decoder(batch=1)
    dec.decode(fields[0], erasure_flags=flags[0])
    for k in range(1, 4):
        out, nerr = dec.decode(fields[k], erasure_flags=flags[k])
        assert (nerr >= 0).all(), k
        np.testing.assert_array_equal(out, ts[k - 1])
    assert dec.segments_uncorrectable == 0
    assert dec.segments_erasure_assisted > 0
