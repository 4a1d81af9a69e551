"""Sync-loss recovery on live streams that drop samples.

The receiver tracks fields by counting samples from the stream epoch, so
a source that silently drops samples (an SDR overflow) desynchronizes
every later field. Two recovery paths under test:

- `resync="auto"`: detect the loss from RS health, re-locate the field
  boundary by PN511 correlation in the buffered stream, re-base the
  epoch/parity and reset decoder + RLS state — decoding is byte-exact
  again from the first re-locked field.
- `notify_gap(n)`: when the drop length is known, zero-fill it so the
  lock is never lost; the interleaver spreads the gap across RS
  codewords, which correct it exactly.
"""

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.receiver import IqReceiver
from tests.test_decoder import _random_ts
from tests.test_receiver import _encode_iq

N = P.SYMBOLS_PER_FIELD


def test_receiver_resync_after_unknown_slip():
    rng = np.random.default_rng(41)
    n_fields = 9
    ts = _random_ts(rng, n_fields, 1)
    iq = _encode_iq(ts) * (0.9 * np.exp(0.6j))  # unknown complex gain

    cut = 3 * N + 123_456   # mid-field-3
    drop = 7_019            # unknown-length sample gap
    slipped = np.concatenate([iq[:, :cut], iq[:, cut + drop :]], axis=-1)

    rx = IqReceiver(batch=1, backend="adaptive", resync="auto")
    got = []
    for pos in range(0, slipped.shape[1], 100_003):
        got += rx.push(slipped[:, pos : pos + 100_003])
    got += rx.flush()

    assert rx.resyncs == 1, rx.resync_log
    # the re-acquired epoch lands exactly on a true post-slip field
    # boundary, with the right parity
    epoch = rx.resync_log[0]["stream_sample"]
    m, rem = divmod(epoch + drop, N)
    assert rem == 0, (epoch, drop)
    assert rx.resync_log[0]["parity"] == m % 2
    # pre-slip fields decoded exactly ...
    np.testing.assert_array_equal(got[0][0], ts[0])
    np.testing.assert_array_equal(got[1][0], ts[1])
    # ... and so is everything from the first re-locked field on: the
    # stream carries original fields m..n_fields-1 after the resync, so
    # (priming field dropped, one-field decode latency) the tail of the
    # emitted sequence is ts[m], ..., ts[n_fields-2], byte-exact
    n_tail = n_fields - m - 1
    assert n_tail >= 2  # the test must actually exercise the re-lock
    for j in range(n_tail):
        out, nerr = got[len(got) - n_tail + j]
        assert (nerr >= 0).all()
        np.testing.assert_array_equal(out, ts[m + j])
    assert rx.fields_emitted == len(got)


def test_receiver_notify_gap_keeps_lock():
    rng = np.random.default_rng(43)
    ts = _random_ts(rng, 5, 1)
    iq = _encode_iq(ts) * np.exp(0.3j)

    cut = 2 * N + 50_000
    drop = 600  # known-length gap, inside RS's interleaved burst budget
    rx = IqReceiver(batch=1, backend="adaptive", resync="auto")
    got = rx.push(iq[:, :cut])
    got += rx.notify_gap(drop)
    got += rx.push(iq[:, cut + drop :])
    got += rx.flush()

    assert rx.resyncs == 0  # the zero-fill kept the lock
    assert len(got) == 4
    for k, (out, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(out, ts[k])
    assert rx.decoder.segments_corrected > 0  # the gap really hit data


def test_cli_cfo_track_recovers_tuner_step(tmp_path):
    """`--cfo track`: a mid-capture tuner frequency step (PLL re-lock /
    temperature) kills an untracked decode from that point on; the
    tracking loop re-estimates the pilot every 8 fields, retunes the
    corrector phase-continuously, and the tail decodes exactly again."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(47)
    n_fields = 14
    ts = _random_ts(rng, n_fields, 1)
    iq = _encode_iq(ts)[0]

    f0, step_hz, step_at = 180.0, 35.0, 6 * N
    n = np.arange(iq.size)
    freq = f0 + step_hz * (n >= step_at)
    y = iq * np.exp(2j * np.pi * np.cumsum(freq) / P.SAMPLE_RATE)

    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "--cfo", "track", "--forgetting", "0.0",
         "-o", str(out), "--stats"]
    ))
    assert s["cfo_retunes"] >= 1, s
    assert abs(s["cfo_hz"] - (f0 + step_hz)) < 2.0, s
    assert abs(s["fields_decoded"] - (n_fields - 1)) <= 1, s
    # fields before the step and after the re-lock decode exactly; the
    # handful in between (step -> next 8-field tracking update + one
    # retrain field) are expendable
    got = np.fromfile(out, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    for k in range(4):
        np.testing.assert_array_equal(got[k], ts[k, 0])
    for k in range(11, got.shape[0]):
        np.testing.assert_array_equal(got[k], ts[k, 0])


def test_resync_state_checkpoint_roundtrip(tmp_path):
    from atsc_tpu.utils.checkpoint import load_receiver, save_receiver

    rx = IqReceiver(batch=1, backend="adaptive", resync="auto",
                    resync_after=3, resync_threshold=0.25)
    rx._epoch = 2 * N + 137
    rx.first_field = 1
    rx.resyncs = 2
    rx.resync_log = [{"stream_sample": 137, "parity": 1},
                     {"stream_sample": 2 * N + 137, "parity": 0}]
    rx.fields_emitted = 7
    rx._bad_streak = 1
    path = str(tmp_path / "rx.npz")
    save_receiver(path, rx)
    back = load_receiver(path)
    assert back.resync == "auto"
    assert back.resync_after == 3
    assert back.resync_threshold == 0.25
    assert back._epoch == rx._epoch
    assert back.first_field == 1
    assert back.resyncs == 2
    assert back.resync_log == rx.resync_log
    assert back.fields_emitted == 7
    assert back._bad_streak == 1
    assert not back._acquiring


def test_cli_cfo_track_checkpoint_resume_phase(tmp_path):
    """Resuming a checkpoint written by a `--cfo track` run restores the
    corrector's accumulated phase exactly (not final-rate x consumed,
    which is wrong once a retune happened): the resumed tail decodes the
    same exact TS as the uninterrupted tracked run."""
    from atsc_tpu.cli import build_decode_argparser, run_decode

    rng = np.random.default_rng(53)
    n_fields = 14
    ts = _random_ts(rng, n_fields, 1)
    iq = _encode_iq(ts)[0]
    f0, step_hz, step_at = 150.0, 30.0, 5 * N
    n = np.arange(iq.size)
    freq = f0 + step_hz * (n >= step_at)
    y = iq * np.exp(2j * np.pi * np.cumsum(freq) / P.SAMPLE_RATE)
    cap = tmp_path / "cap.iq"
    np.stack([y.real, y.imag], axis=-1).astype(np.float32).tofile(cap)

    full = tmp_path / "full.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "--cfo", "track", "--forgetting", "0.0",
         "-o", str(full), "--stats"]
    ))
    assert s["cfo_retunes"] >= 1

    part = tmp_path / "part.ts"
    ckpt = str(tmp_path / "c.npz")
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "--cfo", "track", "--forgetting", "0.0",
         "-o", str(part), "--checkpoint", ckpt, "--checkpoint-every", "4",
         "--max-fields", "10"]
    ))
    s2 = run_decode(build_decode_argparser().parse_args(
        [str(cap), "--forgetting", "0.0", "-o", str(part),
         "--checkpoint", ckpt, "--resume"]
    ))
    want = np.fromfile(full, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    got = np.fromfile(part, np.uint8).reshape(-1, P.FIELD_TS_BYTES)
    assert got.shape[0] == want.shape[0]
    # the re-locked tail (post step + retune) must decode identically --
    # and exactly (the resumed run carries the tracked rate and phase)
    for k in range(11, want.shape[0]):
        np.testing.assert_array_equal(want[k], ts[k, 0])
        np.testing.assert_array_equal(got[k], ts[k, 0])
