"""Multi-device receive path: the time-block x channel sharded decoder
must recover TS bytes exactly equal to the sequential Decoder chain —
including cross-field state (precoder bits, interleaver image) at device
boundaries and RS correction of injected symbol errors."""

import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.models.decoder import Decoder
from atsc_tpu.parallel.mesh import make_mesh
from atsc_tpu.parallel.rx_shard import ShardedDecoder, dryrun
from tests.test_decoder import _encode_symbol_fields, _random_ts


@pytest.mark.parametrize("n_time,n_ch,f_dev", [(4, 2, 1), (2, 2, 2)])
def test_rx_sharded_equals_sequential(n_time, n_ch, f_dev):
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(61)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts)            # (T, B, >=260416) int8

    mesh = make_mesh(n_time, n_ch)
    dec = ShardedDecoder(mesh, batch=batch, fields_per_device=f_dev)
    got_ts, nerr = dec.decode(fields)

    assert (nerr == 0).all()                      # clean: no RS corrections
    # one-field latency: output k is TS field k-1; output 0 is the
    # encoder's virtual all-zero pre-start field
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])

    # sequential cross-check of every output, including the pre-start one
    seq = Decoder(batch=batch)
    for k in range(t_total):
        seq_ts, seq_nerr = seq.decode(fields[k])
        np.testing.assert_array_equal(got_ts[k], seq_ts)
        np.testing.assert_array_equal(nerr[k], seq_nerr)

    # carried state equals the sequential decoder's exactly
    np.testing.assert_array_equal(
        np.asarray(dec.state.prev_il), np.asarray(seq.state.prev_il)
    )
    np.testing.assert_array_equal(
        np.asarray(dec.state.z2_prev), np.asarray(seq.state.z2_prev)
    )


def test_rx_sharded_multi_step_with_errors():
    """Two consecutive sharded steps stay exact across the step boundary,
    and injected symbol errors are RS-corrected identically."""
    n_time, n_ch, f_dev = 2, 2, 1
    t_total = 2 * n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(67)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts).copy()
    # corrupt a few data symbols in field 1 (within RS's 10-byte budget)
    fields[1, 0, 5000:5012] ^= 3

    mesh = make_mesh(n_time, n_ch)
    dec = ShardedDecoder(mesh, batch=batch, fields_per_device=f_dev)
    half = n_time * f_dev
    ts_a, nerr_a = dec.decode(fields[:half])
    ts_b, nerr_b = dec.decode(fields[half:])
    got_ts = np.concatenate([ts_a, ts_b], axis=0)
    nerr = np.concatenate([nerr_a, nerr_b], axis=0)

    assert (nerr >= 0).all()                      # everything correctable
    assert dec.segments_corrected > 0             # the injection hit data
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])


def test_sharded_receiver_matches_iq_receiver():
    """Full device-parallel receive chain (eq + decode under shard_map):
    with real edge context it must match the streaming IqReceiver's hard
    path exactly, across two consecutive steps."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    n_time, n_ch, f_dev = 2, 2, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(71)
    ts = _random_ts(rng, 2 * t_total, batch)
    iq = _encode_iq(ts)                      # (B, 4*260416) complex
    n = P.SYMBOLS_PER_FIELD
    m = 384

    seq = IqReceiver(batch=batch)
    want = seq.push(iq) + seq.flush()        # 2*t_total - 1 fields

    mesh = make_mesh(n_time, n_ch)
    rx = ShardedReceiver(mesh, batch=batch, fields_per_device=f_dev)
    # step 1 with real right-context, zero left (stream start)
    step1 = np.concatenate(
        [np.zeros((batch, m), iq.dtype), iq[:, : t_total * n + m]], axis=1
    )
    ts_a, nerr_a = rx.decode_iq(step1, with_context=True)
    # step 2: real left context, zero right (stream end)
    step2 = np.concatenate(
        [iq[:, t_total * n - m :], np.zeros((batch, m), iq.dtype)], axis=1
    )
    ts_b, nerr_b = rx.decode_iq(step2, with_context=True)
    got = np.concatenate([ts_a, ts_b], axis=0)

    # output k is TS field k-1 (field 0 of the step stream is the
    # pre-start virtual field, matching IqReceiver's dropped first field)
    for k in range(1, 2 * t_total):
        np.testing.assert_array_equal(got[k], want[k - 1][0])
        np.testing.assert_array_equal(got[k], ts[k - 1])


def test_sharded_receiver_zero_context_still_decodes():
    """Without edge context the boundary symbol errors deinterleave
    across codewords and RS corrects them all."""
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    n_time, n_ch = 2, 1
    rng = np.random.default_rng(73)
    ts = _random_ts(rng, 2, 1)
    iq = _encode_iq(ts)
    mesh = make_mesh(n_time, n_ch)
    rx = ShardedReceiver(mesh, batch=1, fields_per_device=1)
    got, nerr = rx.decode_iq(iq)
    assert (nerr >= 0).all()                 # nothing uncorrectable
    np.testing.assert_array_equal(got[1], ts[0])


def test_rx_dryrun():
    dryrun(8)


def test_cli_decode_mesh(tmp_path):
    """`decode --mesh TxC` routes the CLI through the multi-device
    receive chain; output must equal the single-device decode, with zero
    RS corrections on clean input (the one-step lookahead supplies real
    context at every step boundary)."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(79)
    ts = _random_ts(rng, 5, 2)
    iq = _encode_iq(ts)                       # (2, 5*260416)
    cap = tmp_path / "cap.iq"
    flat = iq.reshape(2, 5, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    out_mesh = tmp_path / "mesh.ts"
    out_plain = tmp_path / "plain.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_mesh), "-c", "2", "--mesh", "2x2",
         "--fields-per-step", "2", "--stats"]
    ))
    assert summary["segments_corrected"] == 0
    assert summary["segments_uncorrectable"] == 0
    assert summary["fields_decoded"] == 4  # 5 received -> 4 TS fields out
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_plain), "-c", "2"]
    ))
    assert out_mesh.read_bytes() == out_plain.read_bytes()
    got = np.frombuffer(out_mesh.read_bytes(), np.uint8).reshape(
        4, 2, P.FIELD_TS_BYTES
    )
    for k in range(4):
        np.testing.assert_array_equal(got[k], ts[k])


def test_cli_decode_mesh_viterbi(tmp_path):
    """`decode --mesh TxC --trellis viterbi`: the sharded soft-decision
    tier through the CLI on an AWGN capture — exact TS out where the
    impairment would cost the hard tier corrections."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(149)
    ts = _random_ts(rng, 4, 2)
    iq = _encode_iq(ts)
    sig_p = np.mean(np.abs(iq) ** 2)
    noise = rng.normal(size=iq.shape) + 1j * rng.normal(size=iq.shape)
    iq = iq + noise * np.sqrt(sig_p / 10 ** (16.0 / 10.0) / 2.0)
    cap = tmp_path / "cap.iq"
    flat = iq.reshape(2, 4, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", "2", "--mesh", "2x2",
         "--fields-per-step", "2", "--trellis", "viterbi", "--stats"]
    ))
    assert s["segments_uncorrectable"] == 0, s
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        -1, 2, P.FIELD_TS_BYTES
    )
    for k in range(got.shape[0]):
        np.testing.assert_array_equal(got[k], ts[k])


def _write_capture(tmp_path, iq, t, b, name="cap.iq"):
    """Field-major interleaved cf32 capture file from (B, T*N) complex."""
    cap = tmp_path / name
    flat = iq.reshape(b, t, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    return cap


def test_cli_decode_mesh_quantized(tmp_path):
    """`decode --mesh --format cs8` uploads the integer wire codes
    verbatim through the sharded decode_codes path (r4 VERDICT #2: the
    mesh used to dequantize on the host) — byte-equal to the sequential
    cs8 decode and the exact TS."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from atsc_tpu.ops.quantize import quantize_scale
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(157)
    t, b = 4, 2
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    s = quantize_scale("cs8")
    flat = iq.reshape(b, t, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    codes = np.clip(
        np.rint(np.stack([flat.real, flat.imag], -1) * s), -127, 127
    ).astype(np.int8)
    cap = tmp_path / "cap.cs8"
    cap.write_bytes(codes.tobytes())
    out_mesh = tmp_path / "mesh.ts"
    out_seq = tmp_path / "seq.ts"
    summary = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_mesh), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--format", "cs8", "--stats"]
    ))
    assert summary["fields_decoded"] == t - 1
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_seq), "-c", str(b), "--format", "cs8"]
    ))
    assert out_mesh.read_bytes() == out_seq.read_bytes()
    got = np.frombuffer(out_mesh.read_bytes(), np.uint8).reshape(
        -1, b, P.FIELD_TS_BYTES)
    for k in range(got.shape[0]):
        np.testing.assert_array_equal(got[k], ts[k])


def test_cli_decode_mesh_i8(tmp_path):
    """`decode --mesh --trellis viterbi-i8`: the quantized soft tier
    under the mesh (rejected outright through round 4)."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(163)
    t, b = 4, 1
    ts = _random_ts(rng, t, b)
    cap = _write_capture(tmp_path, _encode_iq(ts), t, b)
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--trellis", "viterbi-i8", "--stats"]
    ))
    assert s["segments_uncorrectable"] == 0, s
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        -1, b, P.FIELD_TS_BYTES)
    assert got.shape[0] == t - 1
    for k in range(t - 1):
        np.testing.assert_array_equal(got[k], ts[k])


def test_cli_decode_mesh_ntsc(tmp_path):
    """`decode --mesh --ntsc comb`: the analog co-channel rejection tier
    under the mesh, on a tone-impaired capture the comb nulls."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(167)
    t, b = 4, 1
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    n = np.arange(iq.shape[1])
    f_ntsc = P.SAMPLE_RATE / 12 * 3 + P.OSC_FREQUENCY
    tone = 0.35 * np.sqrt(np.mean(np.abs(iq) ** 2)) * np.exp(
        2j * np.pi * f_ntsc / P.SAMPLE_RATE * n)
    cap = _write_capture(tmp_path, (iq + tone).astype(np.complex64), t, b)
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--ntsc", "comb", "--stats"]
    ))
    assert s["trellis"] == "ntsc" and s["segments_uncorrectable"] == 0, s
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        -1, b, P.FIELD_TS_BYTES)
    for k in range(t - 1):
        np.testing.assert_array_equal(got[k], ts[k])


def test_cli_decode_mesh_checkpoint_resume(tmp_path):
    """`decode --mesh --checkpoint` + `--resume`: the sharded state
    round-trips through utils.checkpoint.save_sharded_receiver and the
    resumed run completes byte-identically to an uninterrupted decode
    (r4 VERDICT #2: mesh decode rejected --checkpoint outright)."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(173)
    t, b = 6, 1
    ts = _random_ts(rng, t, b)
    cap = _write_capture(tmp_path, _encode_iq(ts), t, b)
    out_full = tmp_path / "full.ts"
    run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out_full), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2"]
    ))
    ck = tmp_path / "ck.npz"
    out = tmp_path / "resumed.ts"
    s1 = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--checkpoint", str(ck),
         "--checkpoint-every", "2", "--max-fields", "2", "--stats"]
    ))
    assert ck.exists() and 0 < s1["fields_decoded"] < t - 1
    s2 = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--checkpoint", str(ck), "--resume",
         "--stats"]
    ))
    assert s2["fields_decoded"] == t - 1
    assert out.read_bytes() == out_full.read_bytes()


def test_cli_decode_mesh_cfo_align(tmp_path):
    """`decode --mesh --cfo auto --align auto`: the mesh conditioning
    front end (r4 VERDICT #6) decodes a CFO-rotated capture cut
    mid-field — CFO estimated from the pilot and derotated host-side,
    field boundary located by PN511, adaptive equalizer on-mesh."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(179)
    t, b = 6, 1
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    cfo = 200.0
    n = np.arange(iq.shape[1])
    iq = iq * np.exp(2j * np.pi * cfo / P.SAMPLE_RATE * n)
    cut = 1000
    iq = iq[:, cut:]
    cap = tmp_path / "cap.iq"
    flat = iq.reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", str(b), "--mesh", "2x1",
         "--fields-per-step", "2", "--cfo", "auto", "--align", "auto",
         "--stats"]
    ))
    assert abs(s["cfo_hz"] - cfo) < 2.0, s
    assert s["align_offset"] == P.SYMBOLS_PER_FIELD - cut, s
    assert s["align_parity"] == 1, s
    assert s["equalizer"] == "adaptive"
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        -1, b, P.FIELD_TS_BYTES)
    # aligned stream starts at received field 1 -> TS fields 1..3
    assert got.shape[0] >= 3
    for k in range(3):
        np.testing.assert_array_equal(got[k], ts[k + 1])


def test_cli_decode_per_channel_outputs(tmp_path):
    """`-o 'slot{ch}.ts'` splits the decode into one TS file per
    channel — byte-identical to de-interleaving the single-output form."""
    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(83)
    ts = _random_ts(rng, 4, 2)
    iq = _encode_iq(ts)
    cap = tmp_path / "cap.iq"
    flat = iq.reshape(2, 4, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(tmp_path / "slot{ch}.ts"), "-c", "2"]
    ))
    assert s["fields_decoded"] == 3
    for i in range(2):
        got = np.fromfile(tmp_path / f"slot{i}.ts", np.uint8).reshape(
            -1, P.FIELD_TS_BYTES
        )
        assert got.shape[0] == 3
        for k in range(3):
            np.testing.assert_array_equal(got[k], ts[k, i])


def test_sharded_adaptive_receiver_matches_sequential():
    """ShardedReceiver(equalizer='adaptive') through an unknown channel:
    per-field RLS training is device-local, so the sharded decode equals
    the sequential IqReceiver(backend='adaptive', forgetting=0.0)
    byte-exactly — and both recover the exact TS."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(89)
    t, b = 4, 2
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    # unknown linear channel: multipath + complex gain, same for all ch
    iq = np.stack([
        np.convolve(iq[c], [0.85 * np.exp(0.4j), 0, 0.15j])[: iq.shape[1]]
        for c in range(b)
    ])

    rx = ShardedReceiver(make_mesh(2, 2), batch=b, fields_per_device=2,
                         equalizer="adaptive")
    got_ts, got_err = rx.decode_iq(iq.reshape(b, -1))
    assert (got_err >= 0).all()
    for k in range(1, t):  # output k is TS field k-1; output 0 = pre-start
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])

    seq = IqReceiver(batch=b, backend="adaptive", forgetting=0.0)
    got_seq = seq.push(iq) + seq.flush()
    for k in range(1, t):
        np.testing.assert_array_equal(got_ts[k], got_seq[k - 1][0])


def test_sharded_adaptive_cadence_matches_sequential():
    """ShardedReceiver(equalizer='adaptive', train_every=2): the
    device-local retrain cadence (train on local fields 0, k, 2k... of
    each time shard) equals the sequential AdaptiveEqualizer cadence
    byte-exactly when k | fields_per_device — and still decodes the
    multipath capture exactly."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(97)
    t, b = 4, 1
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    iq = np.stack([
        np.convolve(iq[c], [0.9 * np.exp(0.3j), 0, 0, 0.12j])[: iq.shape[1]]
        for c in range(b)
    ])

    rx = ShardedReceiver(make_mesh(2, 1), batch=b, fields_per_device=2,
                         equalizer="adaptive", train_every=2)
    got_ts, got_err = rx.decode_iq(iq.reshape(b, -1))
    assert (got_err >= 0).all()
    for k in range(1, t):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])

    seq = IqReceiver(batch=b, backend="adaptive", forgetting=0.0,
                     train_every=2)
    got_seq = seq.push(iq) + seq.flush()
    for k in range(1, t):
        np.testing.assert_array_equal(got_ts[k], got_seq[k - 1][0])

    import pytest

    with pytest.raises(ValueError, match="must divide"):
        ShardedReceiver(make_mesh(2, 1), batch=b, fields_per_device=2,
                        equalizer="adaptive", train_every=3)


def test_cli_decode_mesh_adaptive(tmp_path):
    """`decode --mesh TxC --equalizer adaptive`: multi-device receive
    through an unknown channel, exact TS out."""
    import pytest

    from atsc_tpu.cli import build_decode_argparser, run_decode
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(97)
    ts = _random_ts(rng, 4, 2)
    iq = _encode_iq(ts)
    iq = np.stack([
        np.convolve(iq[c], [0.9 * np.exp(0.3j), 0, 0.12j])[: iq.shape[1]]
        for c in range(2)
    ])
    cap = tmp_path / "cap.iq"
    flat = iq.reshape(2, 4, P.SYMBOLS_PER_FIELD).transpose(1, 0, 2).reshape(-1)
    cap.write_bytes(
        np.stack([flat.real, flat.imag], -1).astype(np.float32).tobytes()
    )
    out = tmp_path / "out.ts"
    s = run_decode(build_decode_argparser().parse_args(
        [str(cap), "-o", str(out), "-c", "2", "--mesh", "2x2",
         "--fields-per-step", "2", "--equalizer", "adaptive", "--stats"]
    ))
    assert s["segments_uncorrectable"] == 0
    got = np.frombuffer(out.read_bytes(), np.uint8).reshape(
        -1, 2, P.FIELD_TS_BYTES
    )
    for k in range(got.shape[0]):
        np.testing.assert_array_equal(got[k], ts[k])

    with pytest.raises(ValueError, match="per-field"):
        run_decode(build_decode_argparser().parse_args(
            [str(cap), "-o", str(out), "-c", "2", "--mesh", "2x2",
             "--equalizer", "adaptive", "--forgetting", "0.5"]
        ))


def test_sharded_soft_receiver_decodes_noisy():
    """ShardedReceiver(trellis='soft') on an AWGN capture: the sharded
    ML tier (warmup ring-permute at metric seams) must recover the exact
    TS and agree with the sequential soft IqReceiver after RS."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(101)
    t, b = 4, 2
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    sig_p = np.mean(np.abs(iq) ** 2)
    snr = 16.0
    noise = (rng.normal(size=iq.shape) + 1j * rng.normal(size=iq.shape))
    iq = (iq + noise * np.sqrt(sig_p / 10 ** (snr / 10) / 2)).astype(
        np.complex64
    )

    rx = ShardedReceiver(make_mesh(2, 2), batch=b, fields_per_device=2,
                         trellis="soft")
    got_ts, got_err = rx.decode_iq(iq)
    assert (got_err >= 0).all()
    for k in range(1, t):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])

    seq = IqReceiver(batch=b, trellis="soft")
    want = seq.push(iq) + seq.flush()
    for k in range(1, t):
        np.testing.assert_array_equal(got_ts[k], want[k - 1][0])


def test_sharded_soft_decoder_equals_sequential_soft():
    """Symbol-domain ShardedDecoder(trellis='soft') on clean soft levels
    equals the sequential SoftDecoder byte-exactly (clean data: warmup
    seams converge to the same MLSE path)."""
    from atsc_tpu.models.decoder import SoftDecoder
    from atsc_tpu.ops.assemble import field_levels
    import jax.numpy as jnp

    n_time, n_ch, f_dev = 2, 2, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(103)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts)
    levels = np.asarray(
        field_levels(jnp.asarray(fields.reshape(-1, fields.shape[-1])))
    ).reshape(fields.shape).astype(np.float32)

    dec = ShardedDecoder(make_mesh(n_time, n_ch), batch=batch,
                         fields_per_device=f_dev, trellis="soft")
    got_ts, nerr = dec.decode(levels)
    assert (nerr == 0).all()

    seq = SoftDecoder(batch=batch)
    for k in range(t_total):
        seq_ts, _ = seq.decode(levels[k])
        np.testing.assert_array_equal(got_ts[k], seq_ts)
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])


def test_sharded_i8_decoder_equals_sequential():
    """Symbol-domain ShardedDecoder(trellis='soft-i8') on quantized
    soft-level codes equals the sequential SoftDecoder's i8 path
    byte-exactly (the sharded step dequantizes with the same f32
    multiply; clean data so warmup seams converge)."""
    import jax.numpy as jnp

    from atsc_tpu.models.decoder import SoftDecoder
    from atsc_tpu.ops.assemble import field_levels
    from atsc_tpu.ops.quantize import quantize_soft_levels

    n_time, n_ch, f_dev = 2, 2, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(211)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts)
    levels = np.asarray(
        field_levels(jnp.asarray(fields.reshape(-1, fields.shape[-1])))
    ).reshape(fields.shape).astype(np.float32)
    codes = np.asarray(quantize_soft_levels(jnp.asarray(levels)))
    assert codes.dtype == np.int8

    dec = ShardedDecoder(make_mesh(n_time, n_ch), batch=batch,
                         fields_per_device=f_dev, trellis="soft-i8")
    got_ts, nerr = dec.decode(codes)
    assert (nerr == 0).all()

    seq = SoftDecoder(batch=batch)
    for k in range(t_total):
        seq_ts, _ = seq.decode(codes[k])
        np.testing.assert_array_equal(got_ts[k], seq_ts)
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])


def test_sharded_ntsc_decoder_equals_sequential():
    """Symbol-domain ShardedDecoder(trellis='ntsc') (field-local comb +
    sharded 16-state PR Viterbi with seam warmup) equals the sequential
    NtscDecoder byte-exactly on clean soft levels."""
    import jax.numpy as jnp

    from atsc_tpu.models.decoder import NtscDecoder
    from atsc_tpu.ops.assemble import field_levels

    n_time, n_ch, f_dev = 2, 1, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(223)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts)
    levels = np.asarray(
        field_levels(jnp.asarray(fields.reshape(-1, fields.shape[-1])))
    ).reshape(fields.shape).astype(np.float32)

    dec = ShardedDecoder(make_mesh(n_time, n_ch), batch=batch,
                         fields_per_device=f_dev, trellis="ntsc")
    got_ts, nerr = dec.decode(levels)
    assert (nerr == 0).all()

    seq = NtscDecoder(batch=batch)
    for k in range(t_total):
        seq_ts, _ = seq.decode(levels[k])
        np.testing.assert_array_equal(got_ts[k], seq_ts)
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])


def test_sharded_i8_receiver_matches_sequential():
    """ShardedReceiver(trellis='soft-i8') from planar IQ: the int8
    quantized soft tier under shard_map equals the sequential
    IqReceiver(trellis='soft-i8') and recovers the exact TS."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(227)
    t, b = 2, 2
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)

    rx = ShardedReceiver(make_mesh(2, 1), batch=b, fields_per_device=1,
                         trellis="soft-i8")
    got_ts, got_err = rx.decode_iq(iq)
    assert (got_err >= 0).all()
    np.testing.assert_array_equal(got_ts[1], ts[0])

    seq = IqReceiver(batch=b, trellis="soft-i8")
    want = seq.push(iq) + seq.flush()
    np.testing.assert_array_equal(got_ts[1], want[0][0])


def test_sharded_ntsc_receiver_rejects_cochannel():
    """ShardedReceiver(trellis='ntsc') decodes a capture impaired by an
    in-band analog carrier that defeats the plain hard tier, and equals
    the sequential IqReceiver(ntsc='comb')."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(229)
    t, b = 2, 1
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    # narrowband co-channel tone near a comb null multiple (fs/12)
    n = np.arange(iq.shape[1])
    f_ntsc = P.SAMPLE_RATE / 12 * 3 + P.OSC_FREQUENCY
    tone = 0.35 * np.sqrt(np.mean(np.abs(iq) ** 2)) * np.exp(
        2j * np.pi * f_ntsc / P.SAMPLE_RATE * n
    )
    iq = (iq + tone).astype(np.complex64)

    rx = ShardedReceiver(make_mesh(2, 1), batch=b, fields_per_device=1,
                         trellis="ntsc")
    got_ts, got_err = rx.decode_iq(iq)
    assert (got_err >= 0).all()
    np.testing.assert_array_equal(got_ts[1], ts[0])

    seq = IqReceiver(batch=b, ntsc="comb")
    want = seq.push(iq) + seq.flush()
    np.testing.assert_array_equal(got_ts[1], want[0][0])


def test_sharded_quantized_windows_match_sequential():
    """ShardedReceiver(wire_format='cs8').decode_codes on raw integer
    wire samples equals the sequential IqReceiver's push_codes path and
    recovers the exact TS."""
    from atsc_tpu.models.receiver import IqReceiver
    from atsc_tpu.ops.quantize import quantize_scale
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    rng = np.random.default_rng(107)
    t, b = 2, 2
    ts = _random_ts(rng, t, b)
    iq = _encode_iq(ts)
    s = quantize_scale("cs8")
    codes = np.clip(
        np.rint(np.stack([iq.real, iq.imag], axis=-1) * s), -127, 127
    ).astype(np.int8)

    rx = ShardedReceiver(make_mesh(2, 1), batch=b, fields_per_device=1,
                         wire_format="cs8")
    got_ts, got_err = rx.decode_codes(codes)
    assert (got_err >= 0).all()
    np.testing.assert_array_equal(got_ts[1], ts[0])

    seq = IqReceiver(batch=b, wire_format="cs8")
    want = seq.push_codes(codes) + seq.flush()
    np.testing.assert_array_equal(got_ts[1], want[0][0])


def test_sharded_receiver_fused_eq(monkeypatch):
    """ShardedReceiver with the fused Pallas equalizer active (interpret
    mode on CPU — the branch a real TPU mesh executes): decoded TS must
    equal the plain sharded receiver's."""
    import functools

    from atsc_tpu.models import receiver as rx_mod
    from atsc_tpu.ops.pallas import eq_fir as mod
    from atsc_tpu.parallel.rx_shard import ShardedReceiver
    from tests.test_receiver import _encode_iq

    n_time, n_ch, f_dev = 2, 1, 1
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(73)
    ts = _random_ts(rng, t_total, batch)
    iq = _encode_iq(ts)
    n = P.SYMBOLS_PER_FIELD
    m = 384

    mesh = make_mesh(n_time, n_ch)
    plain = ShardedReceiver(mesh, batch=batch, fields_per_device=f_dev)
    step = np.concatenate(
        [np.zeros((batch, m), iq.dtype), iq, np.zeros((batch, m), iq.dtype)],
        axis=1,
    )
    want_ts, want_err = plain.decode_iq(step, with_context=True)

    monkeypatch.setenv("ATSC_TPU_FUSED", "1")
    monkeypatch.setattr(
        mod, "eq_fir_fused",
        functools.partial(mod.eq_fir_fused, interpret=True))
    fused = ShardedReceiver(mesh, batch=batch, fields_per_device=f_dev)
    assert fused.window != plain.window      # fused geometry in effect
    got_ts, got_err = fused.decode_iq(step, with_context=True)

    np.testing.assert_array_equal(got_ts, want_ts)
    np.testing.assert_array_equal(got_err, want_err)
    np.testing.assert_array_equal(got_ts[1], ts[0])
