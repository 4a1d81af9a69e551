"""NTSC co-channel rejection: comb filter + 16-state partial-response
Viterbi (ops/ntsc.py). Checks the comb structure tables, exactness of the
PR decoder on clean signal (including cross-field state), interference
rejection through the full IQ receiver, and the auto-detector's choices."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.receiver import IqReceiver
from atsc_tpu.ops.decode import decommutate_field, trellis_decode_field
from atsc_tpu.ops.ntsc import (
    comb_field,
    detect_ntsc,
    init_pr_metrics,
    viterbi_pr_decode_field,
)
from tests.test_decoder import _encode_symbol_fields, _random_ts
from tests.test_receiver import _encode_iq

N = P.SYMBOLS_PER_FIELD


def _cci(n: np.ndarray, scale_rms: float) -> np.ndarray:
    """Co-channel tone at the comb's first null (fs/12 in the level
    domain = fs/12 + pilot offset frequency in the IQ capture)."""
    f = P.SAMPLE_RATE / 12 + P.OSC_FREQUENCY
    return scale_rms * np.exp(2j * np.pi * f * n / P.SAMPLE_RATE + 0.4j)


def test_pr_viterbi_matches_hard_on_clean():
    """On clean symbols the comb + PR Viterbi must reproduce the hard
    decode bit-exactly, across field boundaries (carried 16-state
    metrics, reserved-symbol copies, segment-sync resets)."""
    rng = np.random.default_rng(73)
    ts = _random_ts(rng, 3, 2)
    fields = _encode_symbol_fields(ts)
    b = fields.shape[1]
    z2h = jnp.zeros((b, 12), jnp.int32)
    z2p = jnp.zeros((b, 12), jnp.int32)
    m = init_pr_metrics(b)
    for k in range(fields.shape[0]):
        lev = jnp.asarray(
            fields[k].astype(np.float32) * 2 - 7 + P.PILOT_OFFSET
        )
        bpr, z2p, m = viterbi_pr_decode_field(
            decommutate_field(comb_field(lev)), z2p, m
        )
        bh, z2h = trellis_decode_field(
            decommutate_field(jnp.asarray(fields[k])), z2h
        )
        np.testing.assert_array_equal(np.asarray(bpr), np.asarray(bh))
        np.testing.assert_array_equal(np.asarray(z2p), np.asarray(z2h))


def test_detect_ntsc():
    rng = np.random.default_rng(79)
    ts = _random_ts(rng, 1, 1)
    lev = _encode_symbol_fields(ts)[0].astype(np.float32) * 2 - 7
    lev += np.float32(P.PILOT_OFFSET)
    assert not detect_ntsc(lev)                       # clean -> plain
    assert not detect_ntsc(                           # AWGN only -> plain
        lev + rng.normal(0, 0.3, lev.shape).astype(np.float32)
    )
    n = np.arange(lev.shape[-1])
    tone = 2.0 * np.cos(2 * np.pi * n / 12 + 0.3)     # null-frequency CCI
    assert detect_ntsc(lev + tone.astype(np.float32))


def test_iq_receiver_rejects_cci():
    """A co-channel tone at 0.5x signal RMS makes every segment
    uncorrectable on the plain path; ntsc='auto' detects it, engages the
    comb, and recovers the transport stream exactly."""
    rng = np.random.default_rng(83)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    rms = np.sqrt(np.mean(np.abs(iq) ** 2))
    cap = iq + _cci(np.arange(iq.shape[1]), 0.5 * rms)

    plain = IqReceiver(batch=1)
    got = plain.push(cap) + plain.flush()
    assert plain.decoder.segments_uncorrectable > 0

    rx = IqReceiver(batch=1, ntsc="auto")
    got = rx.push(cap) + rx.flush()
    assert rx.ntsc_active
    assert len(got) == 3
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all()
        np.testing.assert_array_equal(out, ts[k])


def test_ntsc_auto_stays_off_on_clean_capture():
    rng = np.random.default_rng(89)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)
    rx = IqReceiver(batch=1, ntsc="auto")
    got = rx.push(iq) + rx.flush()
    assert not rx.ntsc_active
    for k, (out, nerr) in enumerate(got):
        np.testing.assert_array_equal(out, ts[k])


def test_cli_decode_ntsc(tmp_path):
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(97)
    ts = _random_ts(rng, 3, 1)
    iq = _encode_iq(ts)[0]
    rms = np.sqrt(np.mean(np.abs(iq) ** 2))
    cap = iq + _cci(np.arange(iq.size), 0.5 * rms)
    p = tmp_path / "cci.iq"
    p.write_bytes(
        np.stack([cap.real, cap.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    args = build_decode_argparser().parse_args(
        [str(p), "-o", str(out), "--ntsc", "auto"]
    )
    summary = run_decode(args)
    assert summary["ntsc_comb"] is True
    assert summary["segments_uncorrectable"] == 0
    got = np.fromfile(out, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    assert got.shape[0] == 2
    for k in range(2):
        np.testing.assert_array_equal(got[k], ts[k, 0])


def test_ntsc_with_adaptive_equalizer():
    """The realistic co-channel scenario: CCI on top of an unknown
    multipath/gain channel. The adaptive equalizer absorbs the channel
    (and only partially nulls the tone); the comb finishes the job —
    exact TS where either alone leaves uncorrectable segments."""
    rng = np.random.default_rng(103)
    ts = _random_ts(rng, 4, 1)
    iq = _encode_iq(ts)
    rms = np.sqrt(np.mean(np.abs(iq) ** 2))
    h = np.zeros(7, np.complex128)
    h[0] = 0.9 * np.exp(0.5j)
    h[4] = 0.15 * np.exp(-0.9j)
    chan = np.stack(
        [np.convolve(iq[b], h)[: iq.shape[1]] for b in range(iq.shape[0])]
    )
    cap = chan + _cci(np.arange(iq.shape[1]), 0.5 * rms)

    plain = IqReceiver(batch=1, backend="adaptive")
    plain.push(cap)
    plain.flush()
    assert plain.decoder.segments_uncorrectable > 0

    rx = IqReceiver(batch=1, backend="adaptive", ntsc="auto")
    got = rx.push(cap) + rx.flush()
    assert rx.ntsc_active
    assert rx.decoder.segments_uncorrectable == 0
    for k, (out, nerr) in enumerate(got):
        np.testing.assert_array_equal(out, ts[k])
