"""RS(207,187) decoder tests — a working decoder where the reference had
only dead code (reference reed_solomon.h:41-190, untested)."""

import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.ops.rs_decode import (
    correct_segment_np,
    decode_field_np,
    rs_correct_field_jit,
    syndrome_field,
    syndromes_np,
)


@pytest.fixture(scope="module")
def clean_field(golden):
    return golden["rs"][0].reshape(P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)


def test_clean_codewords_have_zero_syndromes(clean_field):
    assert not syndromes_np(clean_field).any()


def test_syndrome_field_matmul_matches_numpy(clean_field):
    rng = np.random.default_rng(0)
    corrupted = clean_field.copy()
    corrupted[5, 100] ^= 0x5A
    corrupted[17, 3] ^= 0x01
    batch = corrupted[None]
    got = np.asarray(syndrome_field(batch))[0]
    want = syndromes_np(corrupted)
    np.testing.assert_array_equal(got, want)
    assert got[5].any() and got[17].any()
    assert not got[0].any()


@pytest.mark.parametrize("n_errors", [1, 2, 5, 10])
def test_correct_random_errors(clean_field, n_errors):
    rng = np.random.default_rng(n_errors)
    cw = clean_field[7].copy()
    pos = rng.choice(P.SEGMENT_FEC_BYTES, size=n_errors, replace=False)
    bad = cw.copy()
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    fixed, n = correct_segment_np(bad)
    assert n == n_errors
    np.testing.assert_array_equal(fixed, cw)


def test_uncorrectable_detected(clean_field):
    rng = np.random.default_rng(99)
    bad = clean_field[3].copy()
    pos = rng.choice(P.SEGMENT_FEC_BYTES, size=15, replace=False)  # > t=10
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    fixed, n = correct_segment_np(bad)
    assert n == -1


@pytest.mark.parametrize("n_erasures,n_errors", [(20, 0), (14, 3), (8, 6),
                                                 (1, 9), (4, 8)])
def test_correct_errors_and_erasures(clean_field, n_erasures, n_errors):
    """2*errors + erasures <= 20 must correct exactly (beyond the
    10-error budget of unknown-position decoding)."""
    rng = np.random.default_rng(n_erasures * 31 + n_errors)
    cw = clean_field[11].copy()
    pos = rng.choice(P.SEGMENT_FEC_BYTES, size=n_erasures + n_errors,
                     replace=False)
    bad = cw.copy()
    for p in pos:
        bad[p] ^= rng.integers(1, 256)
    era = tuple(int(p) for p in pos[:n_erasures])
    fixed, n = correct_segment_np(bad, erasures=era)
    assert n == n_erasures + n_errors
    np.testing.assert_array_equal(fixed, cw)


def test_erasures_on_clean_bytes_are_harmless(clean_field):
    cw = clean_field[2].copy()
    bad = cw.copy()
    bad[60] ^= 0x21
    fixed, n = correct_segment_np(bad, erasures=(5, 6, 7, 8))
    assert n == 1
    np.testing.assert_array_equal(fixed, cw)


def test_wrong_erasure_hints_fall_back_to_errors_only(clean_field):
    """Hints that miss the real errors must not break decoding when the
    true error count is within the errors-only budget."""
    rng = np.random.default_rng(77)
    cw = clean_field[9].copy()
    bad = cw.copy()
    for p in range(120, 128):
        bad[p] ^= 0x0F
    fixed, n = correct_segment_np(bad, erasures=(1, 2, 3, 4, 5, 6))
    assert n == 8
    np.testing.assert_array_equal(fixed, cw)


def test_decode_field(clean_field):
    rng = np.random.default_rng(4)
    bad = clean_field.copy()
    bad[0, 10] ^= 0xFF
    bad[100, 200] ^= 0x42
    fixed, nerr = decode_field_np(bad)
    np.testing.assert_array_equal(fixed, clean_field)
    assert nerr[0] == 1 and nerr[100] == 1 and nerr[1:100].sum() == 0


def test_device_corrector_matches_host_oracle(clean_field):
    """rs_correct_field (batched inversionless BM + bit-matmul Chien/
    Forney on device) must agree with correct_segment_np on every
    segment: corrected bytes AND the n/-1 verdict, across clean
    segments, correctable counts 1..10, and uncorrectable 11..14."""
    import jax.numpy as jnp

    rng = np.random.default_rng(123)
    bad = clean_field.copy()
    n_true = rng.integers(0, 15, P.DATA_SEGMENTS)
    for seg in range(P.DATA_SEGMENTS):
        pos = rng.choice(P.SEGMENT_FEC_BYTES, size=n_true[seg],
                         replace=False)
        for p in pos:
            bad[seg, p] ^= rng.integers(1, 256)
    batch = jnp.asarray(bad[None])
    syn = syndrome_field(batch)
    out, n = rs_correct_field_jit(batch, syn)
    out = np.asarray(out)[0]
    n = np.asarray(n)[0]
    for seg in range(P.DATA_SEGMENTS):
        want_cw, want_n = correct_segment_np(bad[seg])
        assert n[seg] == want_n, (seg, n_true[seg], n[seg], want_n)
        np.testing.assert_array_equal(out[seg], want_cw,
                                      err_msg=f"segment {seg}")
    # correctable segments recovered the truth; clean passed through
    for seg in range(P.DATA_SEGMENTS):
        if n_true[seg] <= 10:
            np.testing.assert_array_equal(out[seg], clean_field[seg])


def test_device_corrector_leading_batch_dims(clean_field):
    """(T, B, 312, 207) leading shapes (the ShardedDecoder layout)."""
    import jax.numpy as jnp

    bad = np.broadcast_to(clean_field, (2, 3) + clean_field.shape).copy()
    bad[1, 2, 7, 50] ^= 0xA5
    syn = syndrome_field(jnp.asarray(bad))
    out, n = rs_correct_field_jit(jnp.asarray(bad), syn)
    assert np.asarray(n).sum() == 1 and np.asarray(n)[1, 2, 7] == 1
    np.testing.assert_array_equal(np.asarray(out)[1, 2], clean_field)


def test_device_erasure_corrector_matches_host_oracle(clean_field):
    """rs_correct_field_erasures (device Gamma scan + masked RiBM on the
    shifted modified syndromes + Chien/Forney on Psi, with per-segment
    errors-only fallback) must agree with correct_segment_np(erasures=.)
    on every segment, across clean / errors-only / pure-erasure /
    full-budget-mix / over-budget / wrong-flag segments. The oracle's
    erasure branch is the Sugiyama form — an independent algorithm."""
    import jax.numpy as jnp

    from atsc_tpu.ops.rs_decode import rs_correct_field_erasures_jit

    rng = np.random.default_rng(555)
    bad = clean_field.copy()
    flags = np.zeros_like(bad)
    for seg in range(P.DATA_SEGMENTS):
        kind = seg % 6
        if kind == 0:
            nu, e = 0, 0
        elif kind == 1:
            nu, e = int(rng.integers(1, 11)), 0
        elif kind == 2:
            nu, e = 0, int(rng.integers(1, 21))
        elif kind == 3:
            e = int(rng.integers(0, 19))
            nu = (20 - e) // 2
        elif kind == 4:                      # over the errors-only budget
            nu, e = 11, 0
        else:                                # wrong flags on clean bytes
            nu, e = int(rng.integers(1, 6)), 0
        pos = rng.choice(P.SEGMENT_FEC_BYTES, size=nu + e, replace=False)
        for p in pos[:nu]:
            bad[seg, p] ^= rng.integers(1, 256)
        for p in pos[nu:]:
            bad[seg, p] ^= rng.integers(0, 256)   # erased byte may be fine
            flags[seg, p] = 1
        if kind == 5:
            clean_pos = np.setdiff1d(np.arange(P.SEGMENT_FEC_BYTES),
                                     pos[:nu])
            flags[seg, rng.choice(clean_pos, size=3, replace=False)] = 1
    batch = jnp.asarray(bad[None])
    syn = syndrome_field(batch)
    out, n = rs_correct_field_erasures_jit(batch, syn,
                                           jnp.asarray(flags[None]))
    out = np.asarray(out)[0]
    n = np.asarray(n)[0]
    for seg in range(P.DATA_SEGMENTS):
        era = tuple(int(p) for p in np.nonzero(flags[seg])[0])
        want_cw, want_n = correct_segment_np(bad[seg], erasures=era)
        assert n[seg] == want_n, (seg, seg % 6, n[seg], want_n)
        np.testing.assert_array_equal(out[seg], want_cw,
                                      err_msg=f"segment {seg}")
    # every within-budget segment recovered the transmitted truth
    for seg in range(P.DATA_SEGMENTS):
        if seg % 6 != 4:
            np.testing.assert_array_equal(out[seg], clean_field[seg],
                                          err_msg=f"segment {seg}")


def test_device_erasure_corrector_leading_batch_dims(clean_field):
    """(T, B, 312, 207) leading shapes through the erasure corrector
    (the sharded layout), pure-erasure burst on one segment."""
    import jax.numpy as jnp

    from atsc_tpu.ops.rs_decode import rs_correct_field_erasures_jit

    bad = np.broadcast_to(clean_field, (2, 3) + clean_field.shape).copy()
    flags = np.zeros_like(bad)
    bad[1, 2, 7, 50:65] ^= 0x3C                  # 15 erased bytes > t=10
    flags[1, 2, 7, 50:65] = 1
    syn = syndrome_field(jnp.asarray(bad))
    out, n = rs_correct_field_erasures_jit(
        jnp.asarray(bad), syn, jnp.asarray(flags))
    n = np.asarray(n)
    assert n[1, 2, 7] == 15 and n.sum() == 15
    np.testing.assert_array_equal(np.asarray(out)[1, 2], clean_field)


def test_errors_and_erasures_fuzz(clean_field):
    """Seeded sweep across the full 2*errors + erasures <= 20 capacity
    region, random positions and magnitudes every trial."""
    rng = np.random.default_rng(2024)
    for trial in range(40):
        cw = clean_field[trial % P.DATA_SEGMENTS].copy()
        e = int(rng.integers(0, 21))
        nu = int(rng.integers(0, (20 - e) // 2 + 1))
        pos = rng.choice(P.SEGMENT_FEC_BYTES, size=e + nu, replace=False)
        bad = cw.copy()
        for p in pos:
            v = bad[p]
            while bad[p] == v:
                bad[p] = rng.integers(0, 256)
        fixed, n = correct_segment_np(
            bad, erasures=tuple(int(x) for x in pos[:e])
        )
        assert n == e + nu, (trial, e, nu, n)
        np.testing.assert_array_equal(fixed, cw, err_msg=f"trial {trial}")
