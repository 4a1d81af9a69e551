"""CLI frontend: MPEG-TS in -> baseband CF32 IQ out.

The TPU-native analog of the reference's two executables
(reference util/atsc_encoder.cpp — SDR TX; util/atsc_encoder_null.cpp —
null-sink throughput harness). Sinks: null / file / stdout, optionally
paced to the 8VSB sample clock (the role the SDR's sample clock plays in
the reference), or 'soapy[:driver]' for SoapySDR transmit where bindings
exist; the stream format is identical interleaved complex<float>.

Usage:
  python -m atsc_tpu.cli input.ts -o out.iq             # encode to file
  python -m atsc_tpu.cli input.ts                       # null sink (bench)
  cat stream.ts | python -m atsc_tpu.cli - --realtime -o -   # paced stdout
  python -m atsc_tpu.cli udp://239.1.1.1:1234 -o soapy  # live multicast feed
  python -m atsc_tpu.cli input.ts --channels 8          # same TS x8 batch
  python -m atsc_tpu.cli decode out.iq -o back.ts       # IQ -> TS receiver

The `decode` subcommand is the inverse frontend (no reference
counterpart): it runs the IQ-domain receiver (models/receiver.py —
ZF-VSB equalizer + trellis/RS decode) over a baseband capture in any of
the three wire formats and emits the recovered transport stream.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_interleave
from atsc_tpu.runtime.io import IqSink, SoapySdrSink, TsReader
from atsc_tpu.utils.config import EncoderConfig
from atsc_tpu.utils.profiling import ThroughputMeter


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="atsc_tpu", description="TPU-native ATSC 8VSB encoder"
    )
    ap.add_argument("input", nargs="+",
                    help="MPEG-TS source(s) (19.393 Mbps muxrate): file, "
                         "'-' (stdin), or 'udp://[group]:port' for a live "
                         "UDP/RTP headend feed (multicast joined, RTP "
                         "auto-stripped). One source: broadcast to all "
                         "--channels. Several: one independent stream per "
                         "channel (shorter streams are zero-padded until "
                         "the longest ends)")
    ap.add_argument("-o", "--output", default="null",
                    help="IQ sink: 'null', '-' (stdout), file path, or "
                         "'soapy[:driver]' for SDR transmit")
    ap.add_argument("-c", "--channels", type=int, default=1,
                    help="encode the stream as N parallel channels")
    ap.add_argument("--mesh", default=None, metavar="TIMExCH",
                    help="multi-device encode over a jax mesh, e.g. '4x2' = "
                         "4 field time-block shards x 2 channel shards "
                         "(consecutive fields across devices with O(1) "
                         "state exchange; channels must divide CH). "
                         "Default: single-device batch")
    ap.add_argument("--fields-per-step", type=int, default=8)
    ap.add_argument("--mux", action="store_true",
                    help="FDM-combine the channels into ONE wideband "
                         "multiplex at channels*6 MHz (6-MHz slot raster "
                         "centered on DC) — drive a whole band from one "
                         "wideband SDR. cf32 output only")
    ap.add_argument("--realtime", action="store_true",
                    help="pace output to the 10.762238 MHz sample clock")
    ap.add_argument("--format", dest="out_format", default="cf32",
                    choices=("cf32", "cs16", "cs8"),
                    help="IQ wire format: complex float32 (the reference's "
                         "layout), or int16/int8 codes quantized on-device "
                         "(half/quarter the output bandwidth)")
    ap.add_argument("--rate", default=None, metavar="SPS",
                    help="output sample rate in samples/s (e.g. 20e6 for a "
                         "20 MS/s SDR master clock): polyphase-resample the "
                         "baseband from the nominal 10.762238 MHz symbol "
                         "rate (or the channels*6 MHz multiplex rate with "
                         "--mux) before the sink, tracking the conversion "
                         "position as an exact rational so an unbounded "
                         "run never drifts. The 'soapy' sink runs the SDR "
                         "at this rate; `decode --rate` inverts it. cf32 "
                         "output only (quantized wire formats are produced "
                         "in-kernel at the nominal rate)")
    ap.add_argument("--ppm", type=float, default=0.0,
                    help="emulate a transmit clock error of this many parts "
                         "per million: the output is resampled as if the "
                         "DAC ran at nominal*(1+ppm/1e6) — the TX mirror of "
                         "`decode --sro` (generates controlled-SRO captures "
                         "for receiver testing; composes with --rate)")
    ap.add_argument("--max-fields", type=int, default=0,
                    help="stop after N fields per channel (0 = until EOF)")
    ap.add_argument("--stats", action="store_true",
                    help="print a JSON throughput summary to stderr")
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="save the O(1) resumable encoder state (parity, "
                         "phasor, trellis carries, interleaver field) to "
                         "PATH.npz every --checkpoint-every fields")
    ap.add_argument("--checkpoint-every", type=int, default=64)
    ap.add_argument("--resume", action="store_true",
                    help="restore state from --checkpoint and skip the "
                         "already-encoded prefix of file inputs")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a JAX/XLA device trace of the run")
    # SDR flags (reference -d/-f/-g, util/defaults.h:3-5)
    ap.add_argument("-d", "--driver", default="hackrf",
                    help="SoapySDR driver for the 'soapy' sink")
    ap.add_argument("-f", "--frequency", type=float, default=473e6)
    ap.add_argument("-g", "--gain", type=float, default=54.0)
    return ap


def _write_planar(sink, arr: np.ndarray) -> None:
    """Write a (B, 2, m) planar chunk, every sample valid (mux chunks and
    resampled streams have no padded tail; whole-field writes go through
    write_planar/iq_interleave with their SYMBOLS_PER_FIELD truncation)."""
    if arr.shape[-1] == 0:
        return
    if isinstance(sink, IqSink):
        sink.write_planar(arr, arr.shape[-1])
    else:
        # NOT iq_interleave: that truncates to SYMBOLS_PER_FIELD, but a
        # mux/resampled chunk's full length is valid payload
        sink.write(np.ascontiguousarray(np.moveaxis(arr, -2, -1)))


def _read_step(readers, step_bytes: int, field_bytes: int):
    """Read up to step_bytes from every reader; returns (whole_fields,
    ts (whole, len(readers), field_bytes) uint8, packets_read, sync_bad)
    or (0, None, 0, 0) when every stream is exhausted. Shorter streams
    are zero-padded per field; the sync-byte stats cover only the real
    (unpadded) whole packets actually read."""
    datas = [r.read(step_bytes) for r in readers]
    if all(len(d) == 0 for d in datas):
        return 0, None, 0, 0
    checked = bad = 0
    for d in datas:
        firsts = np.frombuffer(d, np.uint8)[
            : len(d) - len(d) % P.MPEG2_BYTES : P.MPEG2_BYTES
        ]
        checked += firsts.size
        bad += int(np.count_nonzero(firsts != 0x47))
    whole = max(1, max(-(-len(d) // field_bytes) for d in datas))
    blk = whole * field_bytes
    cols = [
        np.frombuffer(d + bytes(blk - len(d)), dtype=np.uint8).reshape(
            whole, field_bytes
        )
        for d in datas
    ]
    return whole, np.stack(cols, axis=1), checked, bad


def run(cfg: EncoderConfig, input_paths, max_fields: int = 0,
        stats: bool = False, checkpoint: str | None = None,
        checkpoint_every: int = 64, resume: bool = False,
        profile_dir: str | None = None) -> dict:
    cfg.validate()
    import contextlib

    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE
    from atsc_tpu.utils.checkpoint import load_state, save_state
    from atsc_tpu.utils.profiling import profile

    if isinstance(input_paths, str):
        input_paths = [input_paths]
    if len(input_paths) not in (1, cfg.channels):
        raise ValueError(
            f"{len(input_paths)} inputs for {cfg.channels} channels"
        )
    if cfg.mux and cfg.out_format != "cf32":
        raise ValueError("--mux emits cf32 only")
    resampler = None
    out_sps = None  # output sample rate per emitted stream (Hz)
    sdr_sps = None  # hardware clock for a soapy sink (un-ppm-stretched)
    if cfg.rate is not None or cfg.ppm:
        from fractions import Fraction

        from atsc_tpu.ops.resample import (
            SYMBOL_RATE_FRACTION,
            StreamResampler,
        )

        if cfg.out_format != "cf32":
            raise ValueError("--rate/--ppm emit cf32 only (quantized wire "
                             "formats are produced in-kernel at the "
                             "nominal rate)")
        if cfg.channels > 1 and not cfg.mux:
            # per-channel resampled streams emit a VARIABLE number of
            # samples per field, so a channel-interleaved output would be
            # unparseable (neither decode --rate nor the fixed per-field
            # -c B layout can consume it)
            raise ValueError("--rate/--ppm with --channels > 1 requires "
                             "--mux (one wideband stream); separate "
                             "resampled outputs need one encode run per "
                             "channel")
        native = (Fraction(6_000_000 * cfg.channels) if cfg.mux
                  else SYMBOL_RATE_FRACTION)
        target_nominal = Fraction(cfg.rate) if cfg.rate is not None else native
        target = target_nominal
        if cfg.ppm:
            # a DAC clocked ppm fast stretches the sample grid: emit
            # 1 + ppm/1e6 samples per nominal sample (decode --sro ppm
            # is the exact inverse)
            target = target * (1 + Fraction(cfg.ppm) / 1_000_000)
        band = 6_000_000 * (cfg.channels if cfg.mux else 1)
        if target < band:
            raise ValueError(
                f"--rate {float(target):.0f} cannot carry the occupied "
                f"+-{band / 2e6:g} MHz band (needs >= {band / 1e6:g} MS/s)")
        if target != native:
            resampler = StreamResampler(
                native / target, batch=1 if cfg.mux else cfg.channels)
        out_sps = float(target)
        # the SDR must play ppm-stretched samples at the UN-stretched
        # clock, or the emulated SRO cancels on air (the whole point of
        # --ppm is controlled-SRO generation); only --rate changes the
        # hardware clock
        sdr_sps = float(target_nominal)
    sample_bytes = BYTES_PER_SAMPLE[cfg.out_format]
    per_stream = out_sps if out_sps is not None else (
        cfg.channels * 6e6 if cfg.mux else P.SAMPLE_RATE)
    stream_rate = per_stream * (1 if cfg.mux else cfg.channels)
    pace = stream_rate * sample_bytes if cfg.realtime else 0.0
    readers = [TsReader(p) for p in input_paths]
    if cfg.sink == "soapy" or cfg.sink.startswith("soapy:"):
        driver = cfg.sink.split(":", 1)[1] if ":" in cfg.sink else cfg.driver
        # --mux emits ONE wideband stream at channels*6 MHz: the SDR must
        # run at the multiplex rate with a matching analog bandwidth, not
        # the per-channel symbol rate / 6 MHz defaults. --rate overrides
        # the SDR clock with the resampled output rate.
        sink = SoapySdrSink(driver=driver, frequency_hz=cfg.frequency_hz,
                            gain_db=cfg.gain_db, stream_format=cfg.out_format,
                            sample_rate=(sdr_sps if out_sps is not None
                                         else (stream_rate if cfg.mux
                                               else None)),
                            bandwidth_hz=(cfg.channels * 6e6 if cfg.mux
                                          else 6_000_000.0))
    else:
        sink = IqSink(cfg.sink, pace_bytes_per_sec=pace)
    meshed = cfg.n_time * cfg.n_ch > 1
    if meshed:
        import jax

        from atsc_tpu.parallel.field_shard import ShardedEncoder
        from atsc_tpu.parallel.mesh import make_mesh

        f_dev = max(1, cfg.fields_per_step // cfg.n_time)
        enc = ShardedEncoder(
            make_mesh(cfg.n_time, cfg.n_ch), batch=cfg.channels,
            fields_per_device=f_dev, out_format=cfg.out_format,
        )
        state = enc.init_state()
        t_total = enc.t_total
    else:
        # quantized formats going straight to a byte sink use the packed
        # wire layout (one (I,Q) pair per int lane, interleaved by the
        # fused kernel itself) — the host's planar->interleaved pass
        # (PERF.md "Host boundary": 187 ms/step at B=384) disappears.
        # mux/resample paths need planar component math, and the SDR sink
        # needs typed planar buffers, so those stay planar.
        wire_out = (cfg.out_format in ("cs16", "cs8")
                    and out_sps is None and isinstance(sink, IqSink))
        enc = Encoder(batch=cfg.channels, out_format=cfg.out_format,
                      wire=wire_out)
        t_total = cfg.fields_per_step
    muxer = None
    if cfg.mux:
        from atsc_tpu.ops.mux import FdmMuxer
        muxer = FdmMuxer(cfg.channels)
    meter = ThroughputMeter(channels=cfg.channels)

    def emit_mux_chunk(chunk: np.ndarray) -> None:
        """(2, m) wideband multiplex chunk -> (resample ->) sink."""
        if resampler is not None and chunk.shape[-1]:
            chunk = resampler.push_planar(chunk[None])[0]
        _write_planar(sink, chunk[None])

    def emit_field(arr: np.ndarray) -> None:
        """One encoded field per channel: planar (B, 2, >= 260,416), or
        packed wire lanes (B, >= 260,416) on the wire_out path."""
        if muxer is not None:
            emit_mux_chunk(muxer.push(arr[:, :, : P.SYMBOLS_PER_FIELD]))
        elif resampler is not None:
            _write_planar(sink, resampler.push_planar(
                np.ascontiguousarray(arr[:, :, : P.SYMBOLS_PER_FIELD],
                                     dtype=np.float32)))
        elif arr.ndim == 2:
            # kernel-interleaved wire lanes: verbatim bytes, no host pass
            sink.write_wire(arr, P.SYMBOLS_PER_FIELD)
        elif isinstance(sink, IqSink):
            # planar handoff: native sink interleaves off the GIL
            sink.write_planar(arr, P.SYMBOLS_PER_FIELD)
        else:
            sink.write(iq_interleave(arr))

    field_bytes = P.FIELD_TS_BYTES
    step_bytes = field_bytes * t_total
    fields_done = 0
    sync_checked = 0  # TS packet sync-byte health (the reference drops
    sync_bad = 0      # byte 0 of each 188 positionally and never checks)
    if resume:
        if not checkpoint:
            raise ValueError("--resume requires --checkpoint")
        loaded, fields_done = load_state(checkpoint)
        if meshed:
            state = jax.device_put(loaded, enc.state_sharding)
        else:
            enc.state = loaded
        from atsc_tpu.utils.checkpoint import load_mux_carry

        carry = load_mux_carry(checkpoint)
        if (carry is not None) != (muxer is not None):
            raise ValueError(
                "checkpoint and --mux disagree: resume a --mux run with "
                "--mux and a plain run without it"
            )
        if muxer is not None:
            muxer.set_state(carry)
        from atsc_tpu.utils.checkpoint import load_resample_state

        rs_saved = load_resample_state(checkpoint)
        if (rs_saved is not None) != (resampler is not None):
            raise ValueError(
                "checkpoint and --rate disagree: resume a --rate run with "
                "the same --rate and a nominal-rate run without it"
            )
        if resampler is not None:
            if (int(rs_saved["num"]), int(rs_saved["den"])) != (
                    resampler.num, resampler.den):
                raise ValueError(
                    "--rate differs from the checkpointed run's rate"
                )
            resampler = StreamResampler.load_full_state(rs_saved)
        # file inputs: skip the already-encoded prefix of each stream
        skip = fields_done * field_bytes
        for r in readers:
            left = skip
            while left > 0:
                got = r.read(min(left, step_bytes))
                if not got:
                    break
                left -= len(got)
    last_saved = fields_done
    state_clean = True   # meshed: state has not advanced past pad fields
    eof = False          # loop ended by input exhaustion (vs max_fields)
    try:
        with (profile(profile_dir) if profile_dir
              else contextlib.nullcontext()):
            while True:
                whole, ts, checked, bad = _read_step(
                    readers, step_bytes, field_bytes
                )
                if whole == 0:
                    eof = True
                    break
                sync_checked += checked
                sync_bad += bad
                if ts.shape[1] == 1 and cfg.channels > 1:
                    ts = np.broadcast_to(
                        ts, (whole, cfg.channels, field_bytes)
                    )
                if meshed:
                    if whole < t_total:   # zero-pad the EOF tail step
                        ts = np.concatenate([
                            ts, np.zeros((t_total - whole, cfg.channels,
                                          field_bytes), np.uint8),
                        ])
                        state_clean = False
                    state, iq = enc.step(state, ts)
                    iq_np = np.asarray(iq)     # (T, B, 2, PADDED_OUT)
                    for f in range(whole):
                        emit_field(iq_np[f])
                else:
                    # per-field dispatch (a scanned multi-field step pays an
                    # extra device copy of the stacked IQ — see PERF.md)
                    for f in range(whole):
                        emit_field(np.asarray(enc.encode(ts[f])))
                meter.add_fields(whole * cfg.channels)
                fields_done += whole
                if (checkpoint and state_clean
                        and fields_done - last_saved >= checkpoint_every):
                    save_state(checkpoint,
                               state if meshed else enc.state, fields_done,
                               mux_carry=(None if muxer is None
                                          else muxer.get_state()),
                               resample_state=(None if resampler is None
                                               else resampler.full_state()))
                    last_saved = fields_done
                if max_fields and meter.fields >= max_fields * cfg.channels:
                    break
        # a checkpointed mid-stream stop (max_fields) must NOT flush: the
        # flush zero-pads the carried remainder, which the resumed run
        # renders from real data instead. At EOF, or without a
        # checkpoint, emit everything still buffered.
        if eof or not checkpoint:
            if muxer is not None:
                emit_mux_chunk(muxer.flush())
            if resampler is not None:
                _write_planar(sink, resampler.flush_planar())
    finally:
        for r in readers:
            r.close()
        sink.close()
    if checkpoint and fields_done != last_saved and state_clean:
        save_state(checkpoint, state if meshed else enc.state, fields_done,
                   mux_carry=None if muxer is None else muxer.get_state(),
                   resample_state=(None if resampler is None
                                   else resampler.full_state()))

    summary = meter.summary()
    if out_sps is not None:
        summary["output_rate"] = out_sps
    # input-health telemetry: fraction of 188-byte packets whose sync
    # byte isn't 0x47 — a misaligned or non-TS input encodes to a
    # perfectly valid 8VSB signal no demod downstream can make sense of
    summary["ts_sync_errors"] = sync_bad
    summary["ts_packets"] = sync_checked
    if sync_checked and sync_bad / sync_checked > 0.5 and stats:
        print(f"warning: {sync_bad}/{sync_checked} TS packets lack the "
              "0x47 sync byte — input is misaligned or not a transport "
              "stream", file=sys.stderr)
    if stats:
        print(json.dumps(summary), file=sys.stderr)
    return summary


#: CLI --trellis value -> IqReceiver trellis mode
_TRELLIS_MODE = {"hard": "hard", "viterbi": "soft", "viterbi-i8": "soft-i8"}


def _trellis_mode(args) -> str:
    return _TRELLIS_MODE[args.trellis]


def build_decode_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="atsc_tpu decode",
        description="TPU-native 8VSB receiver: baseband IQ -> MPEG-TS",
    )
    ap.add_argument("input", help="IQ capture ('-' = stdin) produced by the "
                                  "encoder, starting at the stream epoch; or "
                                  "'soapy[:driver]' to capture live from a "
                                  "SoapySDR receiver (see -d/-f/-g)")
    ap.add_argument("-o", "--output", default="-",
                    help="TS output path or '-' (stdout)")
    ap.add_argument("-c", "--channels", type=int, default=1,
                    help="channel count the capture was encoded with")
    ap.add_argument("--mesh", default=None, metavar="TIMExCH",
                    help="multi-device decode over a jax mesh (e.g. '4x2'): "
                         "consecutive fields across time shards, channels "
                         "across ch shards. Every trellis tier shards "
                         "(hard/viterbi/viterbi-i8/--ntsc comb, zf "
                         "equalizer), quantized --format captures upload "
                         "verbatim, --checkpoint/--resume persist the "
                         "sharded state, and --cfo/--align condition the "
                         "capture host-side (adaptive equalizer, strictly "
                         "per-field training — --forgetting does not "
                         "apply; not combinable with --sro/--rate/"
                         "--erasures/--resync/--ntsc auto/--cfo track)")
    ap.add_argument("--fields-per-step", type=int, default=4,
                    help="(--mesh) fields decoded per device step")
    ap.add_argument("--demux", type=int, default=0, metavar="B",
                    help="the capture is a B-slot FDM multiplex at B*6 MHz "
                         "(encode --mux layout): demultiplex on-device and "
                         "decode all B channels (adaptive equalizer; output "
                         "is channel-interleaved per field like -c B)")
    ap.add_argument("--format", dest="in_format", default="cf32",
                    choices=("cf32", "cs16", "cs8"),
                    help="IQ wire format of the capture")
    ap.add_argument("--first-field", type=int, default=0,
                    help="oscillator epoch (field index) of the stream start")
    ap.add_argument("--sro", default="0", metavar="PPM|auto",
                    help="sample-rate offset of the capture: a fixed ppm "
                         "value (streaming — composes with --rate and live "
                         "'soapy' input), or 'auto' to estimate it from the "
                         "sync-peak drift across the capture (sub-ppm; "
                         "reads the whole input up front). The stream is "
                         "polyphase-resampled to the nominal symbol rate; "
                         "implies --align auto (the resampler's bulk delay "
                         "shifts the field boundaries)")
    ap.add_argument("--rate", default=None, metavar="SPS",
                    help="sample rate of the capture in samples/s (e.g. "
                         "20e6 for a 20 MS/s SDR): streaming polyphase-"
                         "resample to the nominal symbol rate, tracking "
                         "the conversion position as an exact rational so "
                         "an unbounded live run never drifts. On live "
                         "'soapy' input the tuner is run at this rate. "
                         "Implies --align auto; single-channel only — "
                         "except with --demux, where the capture is "
                         "resampled to the B*6 MHz multiplex rate and the "
                         "band is aligned via slot 0's PN511")
    ap.add_argument("--cfo", default="0", metavar="HZ|auto|track",
                    help="carrier frequency offset of the capture: a fixed "
                         "Hz value, or 'auto' to estimate it from the pilot "
                         "tone (windowed-FFT peak + quadratic interpolation "
                         "— sub-Hz from ~2 fields). 'track' re-estimates "
                         "the residual every 8 fields from the pilot in "
                         "the last two field blocks and retunes the "
                         "corrector phase-continuously — for long live "
                         "captures whose tuner drifts or steps "
                         "(temperature, PLL re-lock); pair with "
                         "--forgetting < 1 so the equalizer re-trains "
                         "quickly after a step. "
                         "Non-zero CFO implies --equalizer adaptive "
                         "(residual rotation is absorbed by per-field "
                         "training)")
    ap.add_argument("--align", default="none", choices=("none", "auto"),
                    help="'auto': locate the first field boundary by PN511 "
                         "correlation (phase/gain-robust) and decode from "
                         "there — for captures that do not start at a field "
                         "boundary. Single-channel only; implies "
                         "--equalizer adaptive (the epoch phase offset is "
                         "absorbed by training)")
    ap.add_argument("--resync", default="off", choices=("off", "auto"),
                    help="'auto': detect sync loss (a run of fields whose "
                         "RS segments are mostly uncorrectable — e.g. an "
                         "SDR overflow dropped an unknown number of "
                         "samples) and re-acquire the field boundary by "
                         "PN511 correlation in the buffered stream, "
                         "resetting decoder/equalizer state there. Implies "
                         "--equalizer adaptive (the re-acquired epoch "
                         "carries an unknown phase offset). Recommended "
                         "for live 'soapy' input")
    ap.add_argument("--equalizer", default="zf",
                    choices=("zf", "adaptive", "adaptive-dd"),
                    help="'zf': fixed zero-forcing inverse of the known TX "
                         "chain (ideal channel); 'adaptive': widely-linear "
                         "RLS trained on each field's sync symbols — use "
                         "for captures that passed through an unknown "
                         "linear channel (multipath, gain/phase, ripple); "
                         "'adaptive-dd': + a decision-directed second pass "
                         "per field (every 8th decided symbol becomes a "
                         "reliability-weighted training row — ~1 dB more "
                         "sensitivity near threshold for one extra "
                         "solve+apply)")
    ap.add_argument("--forgetting", type=float, default=1.0,
                    help="adaptive equalizer memory: 1.0 = average all "
                         "fields (static channel), 0.0 = retrain per field")
    ap.add_argument("--train-every", type=int, default=1, metavar="K",
                    help="adaptive equalizer retrain cadence: train + "
                         "solve on every K-th field, apply the cached "
                         "taps between (production receivers retrain far "
                         "less than every 24 ms field; the solve is ~60%% "
                         "of the adaptive per-field budget). Under --mesh "
                         "K must divide --fields-per-step/n_time")
    ap.add_argument("--trellis", default="hard",
                    choices=("hard", "viterbi", "viterbi-i8"),
                    help="'hard': slice symbols then invert the trellis "
                         "algebraically (exact on clean captures); "
                         "'viterbi': soft-decision maximum-likelihood "
                         "trellis decoding (~3.5 dB coding gain on noisy "
                         "captures); 'viterbi-i8': the same ML decode on "
                         "int8-quantized soft levels — ~35%% more "
                         "throughput at large batch, same measured "
                         "sensitivity (incompatible with --erasures/"
                         "--ntsc; --stats omits mer_db)")
    ap.add_argument("--eq-profile", default="auto",
                    choices=("auto", "exact", "fast"),
                    help="zf equalizer accuracy/speed tier: 'exact' = full "
                         "+-256-tap support at 6-pass fp32 matmul precision "
                         "(golden regression), 'fast' = +-128 taps at bf16 "
                         "(~0.03-level worst-case error vs the 1.0 slicing "
                         "margin; the production default)")
    def _chunks(value: str) -> int:
        n = int(value)
        if n < 1 or 21528 % n:
            raise argparse.ArgumentTypeError(
                f"{n} must be a divisor of 21528 (e.g. 8, 12, 24, 46, 92)"
            )
        return n

    ap.add_argument("--viterbi-chunks", type=_chunks, default=1,
                    metavar="N",
                    help="chunk-parallel Viterbi: decode each encoder "
                         "stream as N independent chunks with 128-symbol "
                         "warmup halos (N-times less sequential scan depth "
                         "on the accelerator; byte-identical at operating "
                         "SNRs; must divide 21528, e.g. 24). 1 = exact MLSE")
    ap.add_argument("--ntsc", default="off", choices=("off", "comb", "auto"),
                    help="analog NTSC co-channel interference rejection: "
                         "12-symbol comb filter (nulls every 897 kHz, near "
                         "the NTSC visual/chroma/audio carriers) + 16-state "
                         "partial-response ML trellis decoding; 'auto' "
                         "measures the first field's slicer residuals and "
                         "engages the comb only if it wins (it costs ~3 dB "
                         "against white noise)")
    ap.add_argument("--erasures", default="off", choices=("off", "burst"),
                    help="'burst': detect impulse-noise bursts from slicer "
                         "residuals and pass the affected bytes to RS as "
                         "erasures (2*errors + erasures <= 20 per segment "
                         "instead of errors <= 10 — roughly doubles the "
                         "correctable burst length)")
    ap.add_argument("--max-fields", type=int, default=0)
    ap.add_argument("--checkpoint", default=None, metavar="PATH",
                    help="periodically save the complete resumable receiver "
                         "state (decode progress, un-consumed sample window, "
                         "decoder/Viterbi/RLS state, RS stats) to PATH")
    ap.add_argument("--checkpoint-every", type=int, default=64,
                    metavar="FIELDS")
    ap.add_argument("--resume", action="store_true",
                    help="resume from --checkpoint (input must be seekable "
                         "or re-fed from the same stream position; not "
                         "combinable with --align/--sro auto-conditioning)")
    ap.add_argument("--stats", action="store_true",
                    help="print a JSON decode summary to stderr")
    ap.add_argument("--profile", default=None, metavar="LOGDIR",
                    help="capture a JAX/XLA device trace of the decode")
    # SDR flags for the live 'soapy' input (mirror of the encode side)
    ap.add_argument("-d", "--driver", default="hackrf",
                    help="SoapySDR driver for the 'soapy' input")
    ap.add_argument("-f", "--frequency", type=float, default=473e6)
    ap.add_argument("-g", "--gain", type=float, default=30.0,
                    help="receive gain in dB")
    return ap


def _is_live(path: str) -> bool:
    return path == "soapy" or path.startswith("soapy:")


def _open_capture(args, sample_rate: float, bandwidth_hz: float):
    """Decode input source: '-' = stdin, 'soapy[:driver]' = live SoapySDR
    receive stream (in --format wire samples), else a capture file."""
    if args.input == "-":
        return sys.stdin.buffer
    if _is_live(args.input):
        from atsc_tpu.runtime.io import SoapySdrSource

        driver = (args.input.split(":", 1)[1] if ":" in args.input
                  else args.driver)
        return SoapySdrSource(
            driver=driver, frequency_hz=args.frequency, gain_db=args.gain,
            sample_rate=sample_rate, stream_format=args.in_format,
            bandwidth_hz=bandwidth_hz,
        )
    return open(args.input, "rb")


class _TsOut:
    """Decode TS output: one interleaved stream ('-' or a path, channels
    interleaved per field — the default), or one file per channel when
    the path contains '{ch}' (e.g. `-o 'slot{ch}.ts'` with --demux 8 —
    the headend form; the reference is single-channel and has no
    equivalent)."""

    def __init__(self, path: str, channels: int):
        self.per_channel = "{ch}" in path
        if self.per_channel:
            self._fps = [open(path.replace("{ch}", str(i)), "wb")
                         for i in range(channels)]
        else:
            self._fps = [sys.stdout.buffer if path == "-"
                         else open(path, "wb")]

    @classmethod
    def wrap(cls, fp) -> "_TsOut":
        """Adopt an already-open single interleaved stream (resume path)."""
        out = cls.__new__(cls)
        out.per_channel = False
        out._fps = [fp]
        return out

    def write_fields(self, ts: np.ndarray) -> None:
        """ts: (B, FIELD_TS_BYTES) — one decoded field for B channels."""
        if self.per_channel:
            for fp, row in zip(self._fps, ts):
                fp.write(row.tobytes())
        else:
            self._fps[0].write(ts.tobytes())

    def flush(self) -> None:
        for fp in self._fps:
            fp.flush()

    def close(self) -> None:
        for fp in self._fps:
            if fp is not sys.stdout.buffer:
                fp.close()


def _parse_sps(s: str):
    """'20e6' / '16000000' / '10762237.76' -> exact Fraction samples/s."""
    from fractions import Fraction

    try:
        return Fraction(s)
    except ValueError:
        return Fraction(float(s))


class _ResampledCapture:
    """Streaming rate-conversion adapter for decode input: wraps a
    capture-rate wire stream (any --format, file or live SDR) and serves
    nominal-symbol-rate cf32 wire bytes through a
    `ops/resample.StreamResampler`. read(n) returns exactly n bytes until
    the source is exhausted (then the resampler tail, then b''), so every
    capture-conditioning stage downstream (align/CFO/equalizer) runs
    unchanged at the nominal rate."""

    _CHUNK = 1 << 19  # capture samples ingested per source read

    def __init__(self, fin, fmt: str, rate):
        from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE
        from atsc_tpu.ops.resample import StreamResampler

        self._fin = fin
        self._fmt = fmt
        self._bps = BYTES_PER_SAMPLE[fmt]
        self._rs = StreamResampler(rate, batch=1)
        self._pend = bytearray()
        self._eof = False

    def _ingest(self) -> None:
        want = self._CHUNK * self._bps
        raw = self._fin.read(want)
        out = (self._rs.push(_wire_to_complex(raw, self._fmt)[None])
               if raw else None)
        if len(raw) < want:
            self._eof = True
            tail = self._rs.flush()
            out = (np.concatenate([out, tail], -1)
                   if out is not None else tail)
        if out.shape[-1]:
            self._pend += np.ascontiguousarray(out[0]).view(
                np.float32).tobytes()

    def read(self, n: int = -1) -> bytes:
        while not self._eof and (n < 0 or len(self._pend) < n):
            self._ingest()
        if n < 0:
            n = len(self._pend)
        out = bytes(self._pend[:n])
        del self._pend[:n]
        return out

    def seekable(self) -> bool:
        return False

    def close(self) -> None:
        if self._fin is not sys.stdin.buffer:
            self._fin.close()

    def __getattr__(self, name):  # live-source stats (overflows, gaps, ...)
        return getattr(self._fin, name)


def _wire_to_complex(buf: bytes, fmt: str) -> np.ndarray:
    """Wire bytes -> flat complex64 samples (any whole-sample length)."""
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE, dequantize_iq

    buf = buf[: len(buf) - len(buf) % BYTES_PER_SAMPLE[fmt]]
    if fmt == "cf32":
        arr = np.frombuffer(buf, dtype=np.float32)
    else:
        codes = np.frombuffer(
            buf, dtype=np.int16 if fmt == "cs16" else np.int8
        )
        arr = dequantize_iq(codes, fmt)
    return np.ascontiguousarray(arr.reshape(-1, 2)).view(np.complex64)[:, 0]


def _iq_block_to_complex(buf: bytes, channels: int, fmt: str) -> np.ndarray:
    """One field-block of wire bytes -> (channels, 260416) complex64."""
    return _wire_to_complex(buf, fmt).reshape(channels, P.SYMBOLS_PER_FIELD)


def _iq_block_to_codes(buf: bytes, channels: int, fmt: str) -> np.ndarray:
    """One field-block of cs16/cs8 wire bytes -> (channels, 260416, 2)
    integer codes, verbatim (no host dequantization)."""
    codes = np.frombuffer(buf, dtype=np.int16 if fmt == "cs16" else np.int8)
    return codes.reshape(channels, P.SYMBOLS_PER_FIELD, 2)


class _SampleFifo:
    """Per-channel sample FIFO for the conditioned mesh decode loop:
    (B, n[, 2]) chunks in (push order preserved), arbitrary-length
    slices out. Used only when --cfo/--align conditioning breaks the
    file's field-block alignment."""

    def __init__(self):
        self._chunks: list[np.ndarray] = []
        self.have = 0

    def push(self, arr: np.ndarray) -> None:
        if arr.shape[1]:
            self._chunks.append(arr)
            self.have += arr.shape[1]

    def pop(self, n: int) -> np.ndarray:
        assert n <= self.have, (n, self.have)
        out, got = [], 0
        while got < n:
            ch = self._chunks[0]
            take = min(ch.shape[1], n - got)
            out.append(ch[:, :take])
            if take == ch.shape[1]:
                self._chunks.pop(0)
            else:
                self._chunks[0] = ch[:, take:]
            got += take
        self.have -= n
        return np.concatenate(out, axis=1) if len(out) > 1 else out[0]


def run_decode_mesh(args) -> dict:
    """Multi-device decode: the sample-synchronous receive chain
    (parallel/rx_shard.ShardedReceiver) with a one-step lookahead so
    every step boundary gets real +-384-sample equalizer context (clean
    captures therefore decode with zero RS corrections, exactly like the
    streaming path).

    Round-5 tier parity (VERDICT r4 #2/#6): every trellis tier shards
    (--trellis viterbi/viterbi-i8, --ntsc comb), quantized captures
    upload verbatim through the sharded decode_codes path (dequantized
    on-device), --checkpoint/--resume persist the sharded state
    (utils.checkpoint.save_sharded_receiver), and --cfo/--align
    condition the capture host-side before the mesh (CFO derotation is
    a streaming O(1)-state pass; alignment drops a prefix — both
    decode with the per-field adaptive equalizer, exactly like the
    sequential receiver's conditioning)."""
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE
    from atsc_tpu.parallel.mesh import make_mesh
    from atsc_tpu.parallel.rx_shard import ShardedReceiver

    for flag, default in (("sro", "0"), ("rate", None),
                          ("forgetting", 1.0), ("erasures", "off"),
                          ("resync", "off")):
        if getattr(args, flag) != default:
            raise ValueError(f"--mesh decode does not support --{flag}"
                             if flag != "forgetting" else
                             "--mesh adaptive training is strictly "
                             "per-field; --forgetting does not apply")
    try:
        n_time, n_ch = (int(v) for v in args.mesh.lower().split("x"))
    except ValueError:
        raise ValueError(f"--mesh wants TIMExCH (e.g. 4x2), got "
                         f"{args.mesh!r}") from None
    if args.viterbi_chunks > 1:
        raise ValueError("--mesh decode does not support --viterbi-chunks")
    if args.ntsc == "auto":
        raise ValueError("--mesh wants an explicit comb decision: use "
                         "--ntsc comb (run `analyze` or a sequential "
                         "--ntsc auto probe to decide first)")
    if args.cfo == "track":
        raise ValueError("--mesh supports a fixed/auto --cfo; 'track' "
                         "re-estimation is a sequential-receiver feature")

    b = args.channels
    n = P.SYMBOLS_PER_FIELD
    align_auto = args.align == "auto"
    cfo_auto = args.cfo == "auto"
    cfo_hz = 0.0 if cfo_auto else float(args.cfo)
    conditioning = align_auto or cfo_auto or cfo_hz != 0.0
    trellis = _trellis_mode(args)
    if args.ntsc == "comb":
        if args.trellis != "hard":
            raise ValueError("--ntsc comb IS the ML trellis tier (16-state "
                             "partial-response Viterbi) — drop --trellis")
        trellis = "ntsc"
    equalizer = args.equalizer
    if conditioning and equalizer == "zf":
        equalizer = "adaptive"   # epoch phase/residual rotation needs training
    if equalizer != "zf" and trellis != "hard":
        raise ValueError("--mesh ML trellis tiers (viterbi/viterbi-i8/"
                         "--ntsc comb) shard with the zf equalizer only")
    if conditioning and trellis != "hard":
        raise ValueError("--mesh --cfo/--align conditioning decodes with "
                         "the adaptive equalizer (hard trellis)")
    if args.checkpoint and conditioning:
        raise ValueError("--mesh --cfo/--align conditioning is not "
                         "checkpointable (decode the capture in one run, "
                         "or pre-convert it)")
    resume = bool(getattr(args, "resume", False))
    if resume and not args.checkpoint:
        raise ValueError("--resume requires --checkpoint")
    if resume and _is_live(args.input):
        raise ValueError("--resume needs a repositionable capture, "
                         "not a live stream")
    if resume and "{ch}" in args.output:
        raise ValueError("per-channel output ('{ch}') is not resumable; "
                         "resume into a single interleaved output")
    if _is_live(args.input) and b != 1:
        raise ValueError("a live SDR capture is single-channel; use "
                         "--demux for a wideband multi-channel band")

    fmt = args.in_format
    # quantized captures ride the sharded decode_codes path verbatim;
    # conditioning needs float samples, so it dequantizes on the host
    quantized = fmt != "cf32" and not conditioning
    rx = ShardedReceiver(
        make_mesh(n_time, n_ch), batch=b,
        fields_per_device=max(1, args.fields_per_step // n_time),
        first_field=args.first_field, eq_profile=args.eq_profile,
        equalizer=equalizer, trellis=trellis,
        wire_format=fmt if quantized else "cf32",
    )
    t = rx.t_total
    margin = 384  # decode_* with_context contract (ShardedReceiver._margin)
    sample_bytes = BYTES_PER_SAMPLE[fmt]
    block = n * sample_bytes * b

    fields = 0           # TS fields emitted
    fields_consumed = 0  # capture fields fed into decoded steps
    last_ckpt = 0
    fout = None
    import os

    if resume:
        from atsc_tpu.utils.checkpoint import restore_sharded_receiver

        extra = restore_sharded_receiver(args.checkpoint, rx)
        if extra.get("in_format", fmt) != fmt:
            raise ValueError(f"checkpoint --format "
                             f"{extra.get('in_format')!r} != {fmt!r}")
        fields_consumed = int(extra.get("fields_consumed", 0))
        fields = int(extra.get("fields_emitted", 0))
        expect = fields * P.FIELD_TS_BYTES * b
        if args.output == "-":
            fout = _TsOut.wrap(sys.stdout.buffer)
        elif os.path.exists(args.output):
            fp = open(args.output, "r+b")
            fp.truncate(min(os.path.getsize(args.output), expect))
            fp.seek(0, 2)
            fout = _TsOut.wrap(fp)

    fin = _open_capture(args, P.SAMPLE_RATE, 6e6)
    if fout is None:
        fout = _TsOut(args.output, b)

    left = np.zeros((b, margin) + ((2,) if quantized else ()),
                    np.int16 if fmt == "cs16" and quantized else
                    np.int8 if quantized else np.complex64)
    if resume and fields_consumed > 0:
        # seek past the consumed capture, re-reading the final consumed
        # field block for the next step's left edge context
        skip = (fields_consumed - 1) * block
        if fin.seekable():
            fin.seek(skip)
        else:
            while skip > 0:
                got = fin.read(min(skip, 1 << 20))
                if not got:
                    break
                skip -= len(got)
        prev = _read_field_blocks(fin, 1, b, fmt, quantized)
        if prev is not None:
            left = prev[:, -margin:]

    def read_step():
        """-> ((B, T*N[, 2]) zero-padded step, real field count)."""
        arr = _read_field_blocks(fin, t, b, fmt, quantized)
        if arr is None:
            return None, 0
        whole = arr.shape[1] // n
        if whole < t:
            pad = np.zeros((b, t * n - arr.shape[1]) + arr.shape[2:],
                           arr.dtype)
            arr = np.concatenate([arr, pad], axis=1)
        return arr, whole

    cond_info: dict = {}
    fifo = None
    if conditioning:
        from atsc_tpu.models.receiver import (
            CfoCorrector, estimate_cfo, find_field_sync_iq,
        )

        fifo = _SampleFifo()
        # buffer enough for CFO estimation (~4 fields) + sync search
        while fifo.have < 4 * n + 8192:
            arr = _read_field_blocks(fin, t, b, fmt, quantized=False)
            if arr is None:
                break
            fifo.push(arr)
        if fifo.have < (2 * n + 707 if align_auto else n):
            raise ValueError("capture too short for --cfo/--align "
                             "conditioning under --mesh")
        buffered = fifo.pop(fifo.have)
        if cfo_auto:
            cfo_hz = estimate_cfo(buffered[0])
        corrector = CfoCorrector(cfo_hz)
        buffered = np.ascontiguousarray(corrector(buffered))
        cond_info["cfo_hz"] = round(float(cfo_hz), 3)
        if align_auto:
            off, parity = find_field_sync_iq(buffered[0])
            buffered = buffered[:, off:]
            cond_info.update(align_offset=int(off),
                             align_parity=int(parity))
            # re-base the oscillator epoch on the detected parity
            rx = ShardedReceiver(
                make_mesh(n_time, n_ch), batch=b,
                fields_per_device=max(1, args.fields_per_step // n_time),
                first_field=parity, eq_profile=args.eq_profile,
                equalizer=equalizer, trellis=trellis,
            )
            t = rx.t_total
        fifo.push(np.ascontiguousarray(buffered))

        def read_step():
            """Conditioned twin: serve (B, T*N) steps from the fifo,
            topping it up (derotating chunks in stream order)."""
            nonlocal eof
            while fifo.have < t * n and not eof:
                arr = _read_field_blocks(fin, t, b, fmt, quantized=False)
                if arr is None:
                    eof = True
                    break
                fifo.push(np.ascontiguousarray(corrector(arr)))
            whole = min(fifo.have // n, t)
            if whole == 0:
                return None, 0
            arr = fifo.pop(whole * n)
            if whole < t:
                arr = np.concatenate(
                    [arr, np.zeros((b, (t - whole) * n), arr.dtype)],
                    axis=1)
            return arr, whole

        eof = False

    total_real = 0
    corrected = 0
    uncorrectable = 0

    def maybe_checkpoint(force: bool = False) -> None:
        nonlocal last_ckpt
        if not args.checkpoint:
            return
        if force or fields - last_ckpt >= args.checkpoint_every:
            from atsc_tpu.utils.checkpoint import save_sharded_receiver

            fout.flush()
            save_sharded_receiver(
                args.checkpoint, rx,
                extra={"in_format": fmt,
                       "fields_consumed": fields_consumed,
                       "fields_emitted": fields,
                       "segments_corrected": corrected,
                       "segments_uncorrectable": uncorrectable},
            )
            last_ckpt = fields

    def decode_step(left, cur, right, start_field, real):
        nonlocal fields, corrected, uncorrectable, fields_consumed
        arr = np.concatenate([left, cur, right], axis=1)
        if quantized:
            ts, nerr = rx.decode_codes(arr, with_context=True)
        else:
            ts, nerr = rx.decode_iq(arr, with_context=True)
        fields_consumed += real
        for k in range(t):
            # output k is TS field start_field + k - 1: skip the pre-start
            # virtual field (k=0 of the very first step) and, on a padded
            # EOF step, outputs past the last real field's TS (stats count
            # emitted fields only — a pad field's garbage is dropped)
            if start_field + k - 1 < 0 or k > real - 1:
                continue
            fout.write_fields(ts[k])
            fields += 1
            corrected += int((nerr[k] > 0).sum())
            uncorrectable += int((nerr[k] < 0).sum())
            if (args.max_fields and fields >= args.max_fields
                    and not args.checkpoint):
                # stop mid-step only when un-checkpointed: a resumable
                # run finishes the step (the sharded state has already
                # advanced past it), overshooting --max-fields by < T
                return True
        return bool(args.max_fields and fields >= args.max_fields)

    import contextlib

    stack = contextlib.ExitStack()
    if getattr(args, "profile", None):
        from atsc_tpu.utils.profiling import profile

        stack.enter_context(profile(args.profile))
    try:
        held, held_real = read_step()
        start = fields_consumed
        while held is not None:
            nxt, nxt_real = read_step()
            right = (nxt[:, :margin] if nxt is not None
                     else np.zeros_like(left))
            total_real += held_real
            if decode_step(left, held, right, start, held_real):
                break
            maybe_checkpoint()
            left = held[:, -margin:]
            held, held_real = nxt, nxt_real
            start += t
        maybe_checkpoint(force=True)
    finally:
        stack.close()
        if fin is not sys.stdin.buffer:
            fin.close()
        fout.close()
    summary = {
        "fields_decoded": fields,
        "segments_corrected": corrected,
        "segments_uncorrectable": uncorrectable,
        "mesh": f"{n_time}x{n_ch}",
        "trellis": trellis,
        "equalizer": equalizer,
    }
    summary.update(cond_info)
    if args.stats:
        print(json.dumps(summary), file=sys.stderr)
    return summary


def _read_field_blocks(fin, k: int, b: int, fmt: str, quantized: bool):
    """Read up to k whole per-field wire blocks: -> (B, got*N) complex64
    (quantized=False — integer formats are dequantized host-side) or
    (B, got*N, 2) int codes (quantized=True, verbatim for the sharded
    decode_codes path); None at EOF. A trailing partial block is dropped
    with a warning."""
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE

    n = P.SYMBOLS_PER_FIELD
    block = n * BYTES_PER_SAMPLE[fmt] * b
    buf = fin.read(block * k)
    whole = len(buf) // block
    if len(buf) % block:
        print(f"warning: dropping {len(buf) % block}-byte partial "
              "field block at EOF", file=sys.stderr)
    if whole == 0:
        return None
    buf = buf[: whole * block]
    if quantized:
        codes = np.frombuffer(
            buf, dtype=np.int16 if fmt == "cs16" else np.int8)
        return np.ascontiguousarray(
            codes.reshape(whole, b, n, 2).transpose(1, 0, 2, 3)
            .reshape(b, whole * n, 2)
        )
    flat = _wire_to_complex(buf, fmt)
    return np.ascontiguousarray(
        flat.reshape(whole, b, n).transpose(1, 0, 2).reshape(b, -1)
    )


def run_decode_demux(args) -> dict:
    """Wideband headend receive: on-device FDM demultiplex (ops/mux.py)
    feeding one batched adaptive receiver — B transport streams out of
    one B*6 MHz capture. `--rate` accepts captures clocked at any SDR
    master rate (streaming-resampled to the B*6 MHz multiplex rate;
    implies `--align auto` since the conversion shifts the epoch);
    `--align auto` locates the field boundary in slot 0's demuxed
    baseband (all slots are sample-synchronous by construction)."""
    from atsc_tpu.models.receiver import IqReceiver, find_field_sync_iq
    from atsc_tpu.ops.mux import FdmDemuxer

    for flag, default in (("cfo", "0"), ("sro", "0"), ("mesh", None)):
        if getattr(args, flag) != default:
            raise ValueError(f"--demux does not support --{flag}")
    rate_frac = None
    if args.rate is not None:
        from fractions import Fraction

        rate_frac = _parse_sps(args.rate) / Fraction(6_000_000 * args.demux)
        if rate_frac < 1:
            raise ValueError(
                f"--rate below the {args.demux * 6} MHz multiplex rate "
                "cannot carry the band")
    align = args.align == "auto" or (rate_frac is not None
                                     and rate_frac != 1)
    resume = bool(getattr(args, "resume", False))
    if args.checkpoint and (rate_frac is not None or align):
        raise ValueError("--demux --rate/--align conditioning is not "
                         "checkpointable (decode the capture in one run, "
                         "or pre-convert it)")
    if resume and not args.checkpoint:
        raise ValueError("--resume requires --checkpoint")
    if resume and _is_live(args.input):
        raise ValueError("--resume needs a repositionable capture, "
                         "not a live stream")
    if resume and "{ch}" in args.output:
        raise ValueError("per-channel output ('{ch}') is not resumable; "
                         "resume into a single interleaved output")
    if args.channels != 1:
        raise ValueError("--demux sets the channel count itself")
    if (args.viterbi_chunks > 1
            and not args.trellis.startswith("viterbi")
            and args.ntsc == "off"):
        raise ValueError("--viterbi-chunks needs a soft trellis path: "
                         "add --trellis viterbi or --ntsc comb/auto")
    if args.trellis == "viterbi-i8":
        raise ValueError("--demux decodes with the adaptive equalizer; "
                         "the quantized tier needs the device equalizer "
                         "— use --trellis viterbi")
    b = args.demux
    if b < 1:
        raise ValueError(f"--demux wants a slot count >= 1, got {b}")
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE

    dmx = FdmDemuxer(b)

    def make_rx(first_field: int) -> IqReceiver:
        return IqReceiver(
            batch=b,
            backend=("adaptive-dd" if args.equalizer == "adaptive-dd"
                     else "adaptive"),
            forgetting=args.forgetting,
            first_field=first_field,
            trellis=_trellis_mode(args),
            erasures=None if args.erasures == "off" else args.erasures,
            ntsc=None if args.ntsc == "off" else args.ntsc,
            viterbi_chunks=args.viterbi_chunks, eq_profile=args.eq_profile,
            measure_mer=args.stats and args.trellis != "viterbi-i8",
            resync=None if args.resync == "off" else args.resync,
            train_every=args.train_every,
        )
    wb_read = 0  # wideband multiplex samples consumed (resume cursor)
    fout = None
    if resume:
        import os

        from atsc_tpu.utils.checkpoint import load_receiver

        rx = load_receiver(args.checkpoint)
        if rx.batch != b:
            raise ValueError(f"checkpoint slots {rx.batch} != --demux {b}")
        carry = rx.checkpoint_arrays.get("demux_carry")
        if carry is None:
            raise ValueError("checkpoint is not a --demux decode "
                             "checkpoint")
        want_be = ("adaptive-dd" if args.equalizer == "adaptive-dd"
                   else "adaptive")
        if args.equalizer != "zf" and rx.backend != want_be:
            raise ValueError(f"checkpoint equalizer backend {rx.backend!r} "
                             f"!= --equalizer {args.equalizer!r}")
        dmx.set_state(carry)
        wb_read = int(rx.checkpoint_extra.get("wideband_read", 0))
        rx.measure_mer = args.stats and rx.trellis != "soft-i8"
    else:
        # construct (and therefore flag-validate) the receiver BEFORE
        # opening the output: a usage error must not truncate a file.
        # An --align run rebuilds it with the detected parity later.
        rx = make_rx(args.first_field)
    # live wideband headend receive: the SDR runs at the multiplex rate
    # (or at --rate, streaming-resampled down to it)
    cap_sps = float(_parse_sps(args.rate)) if args.rate else dmx.rate_hz
    fin = _open_capture(args, cap_sps, dmx.rate_hz)
    in_fmt = args.in_format
    if rate_frac is not None and rate_frac != 1:
        fin = _ResampledCapture(fin, in_fmt, rate_frac)
        in_fmt = "cf32"
    sample_bytes = BYTES_PER_SAMPLE[in_fmt]
    if resume:
        import os

        skip = wb_read * sample_bytes
        if fin.seekable():
            fin.seek(skip)
        else:
            while skip > 0:
                got = fin.read(min(skip, 1 << 20))
                if not got:
                    break
                skip -= len(got)
        # re-open the output where the checkpointed state left it
        expect = rx.fields_emitted * P.FIELD_TS_BYTES * b
        if args.output == "-":
            fout = _TsOut.wrap(sys.stdout.buffer)
        elif os.path.exists(args.output):
            fp = open(args.output, "r+b")
            fp.truncate(min(os.path.getsize(args.output), expect))
            fp.seek(0, 2)
            fout = _TsOut.wrap(fp)
    if fout is None:
        fout = _TsOut(args.output, b)
    fields = 0
    last_ckpt = 0

    def emit(decoded) -> None:
        nonlocal fields
        for ts, _ in decoded:
            fout.write_fields(ts)
            fields += 1

    # --align/--rate: hold the demuxed baseband until slot 0's PN511
    # locates the field boundary (all slots are sample-synchronous, so
    # one search aligns the whole band); the residual fractional delay
    # of the rate conversion is a linear channel the per-field adaptive
    # training absorbs
    pend_bb: list[np.ndarray] = []
    aligned = not align
    align_info: dict = {}

    def _start_aligned() -> None:
        nonlocal aligned, rx
        buf = np.concatenate(pend_bb, axis=-1)
        off, parity = find_field_sync_iq(buf[0])
        align_info.update(align_offset=int(off), align_parity=int(parity))
        rx = make_rx(parity)
        aligned = True
        pend_bb.clear()
        emit(rx.push(buf[:, off:]))

    def feed(bb: np.ndarray) -> None:
        if aligned:
            if bb.shape[-1]:
                emit(rx.push(bb))
            return
        if bb.shape[-1]:
            pend_bb.append(bb)
        if sum(x.shape[-1] for x in pend_bb) >= 2 * P.SYMBOLS_PER_FIELD:
            _start_aligned()

    def maybe_checkpoint(force: bool = False) -> None:
        nonlocal last_ckpt
        if not args.checkpoint:
            return
        if force or fields - last_ckpt >= args.checkpoint_every:
            from atsc_tpu.utils.checkpoint import save_receiver

            fout.flush()
            save_receiver(args.checkpoint, rx,
                          extra={"in_format": args.in_format,
                                 "demux_slots": b,
                                 "wideband_read": wb_read},
                          extra_arrays={"demux_carry": dmx.get_state()})
            last_ckpt = fields

    import contextlib

    stack = contextlib.ExitStack()
    if getattr(args, "profile", None):
        from atsc_tpu.utils.profiling import profile

        stack.enter_context(profile(args.profile))
    try:
        while True:
            buf = fin.read(1 << 22)
            if not buf:
                break
            wb_read += len(buf) // sample_bytes
            feed(dmx.push(_wire_to_complex(buf, in_fmt)))
            maybe_checkpoint()
            if args.max_fields and fields >= args.max_fields:
                break
        if not args.max_fields or fields < args.max_fields:
            feed(dmx.flush())
            if not aligned:
                # short capture: align with whatever is buffered, if a
                # whole field (+ sync probe span) made it through
                if sum(x.shape[-1] for x in pend_bb) >= (
                        P.SYMBOLS_PER_FIELD + 707):
                    _start_aligned()
                else:
                    print("warning: capture too short to locate a field "
                          "boundary; nothing decoded", file=sys.stderr)
            if aligned:
                emit(rx.flush())
        maybe_checkpoint(force=True)
    finally:
        stack.close()
        if fin is not sys.stdin.buffer:
            fin.close()
        fout.close()
    summary = {
        "fields_decoded": fields,
        "segments_corrected": rx.decoder.segments_corrected,
        "segments_uncorrectable": rx.decoder.segments_uncorrectable,
        "demux_slots": b,
    }
    summary.update(align_info)
    if rate_frac is not None:
        summary["resample_rate"] = float(rate_frac)
    if args.resync != "off":
        summary["resyncs"] = rx.resyncs
    if _is_live(args.input):
        summary |= {"overflows": fin.overflows,
                    "gaps_filled": fin.gaps_filled,
                    "gap_samples": fin.gap_samples}
    if rx.mer is not None:
        summary["mer_db"] = [round(float(v), 2) for v in rx.mer]
    if args.stats:
        print(json.dumps(summary), file=sys.stderr)
    return summary


def run_decode(args) -> dict:
    import io

    if getattr(args, "demux", 0):
        return run_decode_demux(args)
    if getattr(args, "mesh", None):
        return run_decode_mesh(args)

    from atsc_tpu.models.receiver import (
        CfoCorrector,
        IqReceiver,
        estimate_cfo,
        estimate_sro,
        find_field_sync_iq,
        resample_stream,
    )
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE

    fmt = args.in_format
    resume = bool(getattr(args, "resume", False))
    if resume and not args.checkpoint:
        raise ValueError("--resume requires --checkpoint")
    if "{ch}" in args.output and resume:
        raise ValueError("per-channel output ('{ch}') is not resumable; "
                         "resume into a single interleaved output")
    if _is_live(args.input):
        if args.channels != 1:
            raise ValueError("a live SDR capture is single-channel; use "
                             "--demux for a wideband multi-channel band")
        if args.sro == "auto":
            raise ValueError("--sro auto reads the whole capture up front "
                             "and cannot run on a live stream (capture to "
                             "a file first and measure, then pass the "
                             "numeric ppm value — that path streams)")
        if resume:
            raise ValueError("--resume needs a repositionable capture, "
                             "not a live stream")
    # streaming rate conversion (--rate capture clock, numeric --sro ppm):
    # exact-rational capture-samples-per-output ratio, applied by a
    # StreamResampler wrapped around the input — live-capable, no
    # whole-capture read (`--sro auto` below still needs one)
    from fractions import Fraction

    stream_rate = None
    if args.rate is not None:
        from atsc_tpu.ops.resample import capture_rate

        stream_rate = capture_rate(_parse_sps(args.rate))
    if args.sro not in ("0", "auto"):
        stream_rate = ((stream_rate or Fraction(1))
                       * (1 + _parse_sps(args.sro) / 1_000_000))
    if stream_rate is not None and args.channels != 1:
        raise ValueError("--rate/--sro are single-channel only")
    capture_sps = float(_parse_sps(args.rate)) if args.rate else P.SAMPLE_RATE
    fin = _open_capture(args, capture_sps, 6e6)
    fout = None  # opened once the resume state (if any) is known
    align = args.align == "auto"
    cfo_auto = args.cfo in ("auto", "track")
    cfo_track = args.cfo == "track"
    sro_rate = None
    if stream_rate is not None and stream_rate != 1:
        fin = _ResampledCapture(fin, fmt, stream_rate)
        fmt, align = "cf32", True  # the resampler's bulk delay shifts
        #                            the field boundaries
    if args.sro == "auto":
        # whole-capture conditioning: estimate the rate from sync-peak
        # drift, resample to the nominal symbol rate, re-wrap as an
        # in-memory cf32 stream, and force auto-alignment (composes with
        # --rate: the streaming wrapper above runs first)
        if args.channels != 1:
            raise ValueError("--sro is single-channel only")
        raw = _wire_to_complex(fin.read(), fmt)
        if fin is not sys.stdin.buffer:
            fin.close()
        sro_rate = estimate_sro(raw)
        cond = resample_stream(raw, sro_rate)[0]
        fin = io.BytesIO(
            np.stack([cond.real, cond.imag], -1).astype(np.float32).tobytes()
        )
        fmt, align = "cf32", True
    block = P.SYMBOLS_PER_FIELD * BYTES_PER_SAMPLE[fmt] * args.channels
    if (align or cfo_auto) and args.channels != 1:
        raise ValueError("--align/--cfo auto are single-channel only")
    if (args.viterbi_chunks > 1
            and not args.trellis.startswith("viterbi")
            and args.ntsc == "off"):
        raise ValueError("--viterbi-chunks needs a soft trellis path: "
                         "add --trellis viterbi or --ntsc comb/auto")
    first_field, offset, pending = args.first_field, 0, None
    equalizer = args.equalizer
    if args.resync == "auto" and equalizer == "zf":
        equalizer = "adaptive"  # a re-acquired epoch needs training
    iq0 = None
    if align or cfo_auto:
        iq0 = _wire_to_complex(fin.read(2 * block), fmt)
    cfo_hz = estimate_cfo(iq0) if cfo_auto else float(args.cfo)
    if (cfo_hz != 0.0 or cfo_track) and equalizer == "zf":
        equalizer = "adaptive"  # residual rotation needs training
    correct = CfoCorrector(cfo_hz)
    if align:
        if equalizer == "zf":
            equalizer = "adaptive"  # the epoch phase offset needs training
        iq0c = correct(iq0)
        offset, first_field = find_field_sync_iq(iq0c)
        pending = iq0c[:, offset:]
    elif iq0 is not None:
        pending = correct(iq0)
    # quantized fast path: with no host-side conditioning pending, cs16/
    # cs8 codes are buffered and uploaded verbatim (2-4x less H2D) and
    # dequantized inside the jitted equalizer step
    codes_path = (fmt in ("cs16", "cs8") and equalizer == "zf"
                  and not align and cfo_hz == 0.0 and pending is None)
    if resume and (align or sro_rate is not None or stream_rate is not None
                   or cfo_auto):
        raise ValueError("--resume cannot re-run --align/--sro/--rate/"
                         "--cfo auto conditioning (decode the capture in "
                         "one run, or pre-convert it)")
    if resume:
        import os

        from atsc_tpu.utils.checkpoint import load_receiver

        rx = load_receiver(args.checkpoint)
        if rx.batch != args.channels:
            raise ValueError(f"checkpoint batch {rx.batch} != --channels "
                             f"{args.channels}")
        saved_fmt = rx.checkpoint_extra.get("in_format", fmt)
        if saved_fmt != fmt:
            raise ValueError(f"checkpoint input format {saved_fmt!r} != "
                             f"--format {fmt!r}")
        # restore conditioning: the saved numeric CFO applies unless the
        # user explicitly overrides it
        cfo_hz = (float(args.cfo) if args.cfo != "0"
                  else float(rx.checkpoint_extra.get("cfo_hz", 0.0)))
        correct = CfoCorrector(cfo_hz)
        rx.measure_mer = args.stats and rx.trellis != "soft-i8"
        # skip input already consumed by the checkpointed stream
        consumed = rx._stream.end
        skip = consumed * BYTES_PER_SAMPLE[fmt] * args.channels
        if fin.seekable():
            fin.seek(skip)
        else:
            while skip > 0:
                skip -= len(fin.read(min(skip, 1 << 20)))
        # phase continuity with the already-written output: restore the
        # corrector's accumulated phase exactly (a --cfo track run retuned
        # mid-stream, so "final rate x consumed samples" is NOT the phase
        # at the checkpoint); legacy checkpoints fall back to that product
        saved_phi = rx.checkpoint_extra.get("cfo_phi")
        if saved_phi is not None:
            correct._phi = float(saved_phi)
            correct._n = consumed
        else:
            correct.skip(consumed)
        if args.resync != "off" and rx.resync is None:
            raise ValueError("checkpoint was saved without --resync; "
                             "decode flags cannot change on --resume")
        if args.equalizer != "zf" and rx.backend != args.equalizer:
            raise ValueError(f"checkpoint equalizer backend {rx.backend!r} "
                             f"!= --equalizer {args.equalizer!r}")
        codes_path = rx.wire_format != "cf32"
        # re-open the output exactly where the checkpointed state left
        # it: fields flushed after the last checkpoint would otherwise
        # be duplicated on resume
        emitted = rx.fields_emitted
        expect = emitted * P.FIELD_TS_BYTES * args.channels
        if args.output == "-":
            fout = sys.stdout.buffer
        elif os.path.exists(args.output):
            size = os.path.getsize(args.output)
            if size < expect:
                print(f"warning: {args.output} is {expect - size} bytes "
                      "short of the checkpointed decode position — those "
                      "fields were lost before being written",
                      file=sys.stderr)
            fout = open(args.output, "r+b")
            fout.truncate(min(size, expect))
            fout.seek(0, 2)
        else:
            fout = open(args.output, "wb")
        fout = _TsOut.wrap(fout)
    else:
        rx = IqReceiver(
            batch=args.channels, first_field=first_field,
            backend=equalizer if equalizer != "zf" else "device",
            forgetting=args.forgetting,
            trellis=_trellis_mode(args),
            erasures=None if args.erasures == "off" else args.erasures,
            wire_format=fmt if codes_path else "cf32",
            eq_profile=args.eq_profile,
            ntsc=None if args.ntsc == "off" else args.ntsc,
            viterbi_chunks=args.viterbi_chunks,
            # the i8 tier's int8 level codes cannot feed the MER
            # accumulator; --stats still reports everything else
            measure_mer=args.stats and args.trellis != "viterbi-i8",
            resync=None if args.resync == "off" else args.resync,
            train_every=args.train_every,
        )
        fout = _TsOut(args.output, args.channels)
    fields = 0
    last_ckpt = 0
    track_tail: list[np.ndarray] = []  # last 2 corrected field blocks
    cfo_retunes = 0
    last_track = 0

    def emit(decoded) -> None:
        nonlocal fields
        for ts, _ in decoded:
            fout.write_fields(ts)
            fields += 1

    def maybe_checkpoint(force: bool = False) -> None:
        nonlocal last_ckpt
        if not args.checkpoint:
            return
        if force or fields - last_ckpt >= args.checkpoint_every:
            from atsc_tpu.utils.checkpoint import save_receiver

            fout.flush()
            save_receiver(args.checkpoint, rx,
                          extra={"in_format": fmt, "cfo_hz": cfo_hz,
                                 "cfo_phi": correct._phi})
            last_ckpt = fields

    import contextlib

    stack = contextlib.ExitStack()
    if getattr(args, "profile", None):
        from atsc_tpu.utils.profiling import profile

        stack.enter_context(profile(args.profile))
    try:
        if pending is not None:
            emit(rx.push(pending))
        while True:
            buf = fin.read(block)
            if len(buf) < block:
                if buf and align:
                    emit(rx.push(correct(_wire_to_complex(buf, fmt))))
                elif buf:
                    print(f"warning: dropping {len(buf)}-byte partial field "
                          "block at EOF", file=sys.stderr)
                break
            if codes_path:
                decoded = rx.push_codes(
                    _iq_block_to_codes(buf, args.channels, fmt)
                )
            else:
                blk = correct(_iq_block_to_complex(buf, args.channels, fmt))
                decoded = rx.push(blk)
                if cfo_track:
                    track_tail.append(blk)
                    del track_tail[:-2]
            emit(decoded)
            if (cfo_track and len(track_tail) == 2
                    and fields - last_track >= 8):
                # tracking update: the pilot's offset in the *corrected*
                # stream is the residual CFO; fold it in phase-continuously
                last_track = fields
                resid = estimate_cfo(np.concatenate(track_tail, axis=-1))
                if 0.05 <= abs(resid) <= 1500.0:
                    cfo_hz = correct.cfo_hz + resid
                    correct.retune(cfo_hz)
                    cfo_retunes += 1
            maybe_checkpoint()
            if args.max_fields and fields >= args.max_fields:
                break
        if not args.max_fields or fields < args.max_fields:
            emit(rx.flush())
        maybe_checkpoint(force=True)
    finally:
        stack.close()
        if fin is not sys.stdin.buffer:
            fin.close()
        if fout is not None:
            fout.close()

    summary = {
        "fields_decoded": fields,
        "segments_corrected": rx.decoder.segments_corrected,
        "segments_uncorrectable": rx.decoder.segments_uncorrectable,
    }
    if args.erasures != "off":
        summary["segments_erasure_assisted"] = (
            rx.decoder.segments_erasure_assisted
        )
    if args.ntsc != "off":
        summary["ntsc_comb"] = rx.ntsc_active
    if args.resync != "off" or rx.resync is not None:
        summary["resyncs"] = rx.resyncs
    if _is_live(args.input):
        summary |= {"overflows": fin.overflows,
                    "gaps_filled": fin.gaps_filled,
                    "gap_samples": fin.gap_samples}
    if rx.mer is not None:
        summary["mer_db"] = [round(float(v), 2) for v in rx.mer]
    if align:
        summary |= {"align_offset": offset, "align_parity": first_field}
    if cfo_hz != 0.0:
        summary["cfo_hz"] = round(cfo_hz, 3)
    if cfo_track:
        summary["cfo_retunes"] = cfo_retunes
    if sro_rate is not None:
        summary["sro_ppm"] = round((sro_rate - 1.0) * 1e6, 3)
    elif args.sro != "0":
        summary["sro_ppm"] = float(_parse_sps(args.sro))
    if args.rate is not None:
        summary["resample_rate"] = float(stream_rate)
    if args.stats:
        print(json.dumps(summary), file=sys.stderr)
    return summary


def build_analyze_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="atsc_tpu analyze",
        description="Signal-quality triage of an 8VSB IQ capture without "
                    "decoding: power, field alignment, carrier offset, "
                    "sample-rate offset, MER (broadcast monitoring metric)",
    )
    ap.add_argument("input", help="IQ capture path, '-' (stdin), or "
                                  "'soapy[:driver]' to grab a few fields "
                                  "live off a SoapySDR receiver. One "
                                  "channel at the symbol rate by default; "
                                  "--demux/--rate cover wideband FDM "
                                  "multiplexes and other SDR clocks")
    ap.add_argument("--format", dest="in_format", default="cf32",
                    choices=("cf32", "cs16", "cs8"))
    ap.add_argument("--fields", type=int, default=4,
                    help="fields to analyze (>= 3 enables the SRO "
                         "estimate); one extra field of alignment slack "
                         "is read/grabbed on top")
    ap.add_argument("--cfo-search", type=float, default=3000.0,
                    help="one-sided carrier-offset search range (Hz)")
    ap.add_argument("--demux", type=int, default=0, metavar="B",
                    help="the capture is a B-slot FDM multiplex at "
                         "B*6 MHz (encode --mux output / wideband SDR "
                         "grab): demux and report every slot")
    ap.add_argument("--rate", default=None, metavar="SPS",
                    help="capture sample rate (e.g. 20e6 for a 20 MS/s "
                         "SDR grab): stream-resampled down to the native "
                         "band rate before analysis; for a live grab the "
                         "SDR is clocked at this rate")
    ap.add_argument("-d", "--driver", default="hackrf",
                    help="SoapySDR driver for a live grab")
    ap.add_argument("-f", "--frequency", type=float, default=473e6)
    ap.add_argument("-g", "--gain", type=float, default=30.0)
    return ap


def _analyze_iq(iq: np.ndarray, cfo_search: float,
                force_adaptive: bool = False,
                resampled: bool = False) -> dict:
    """The per-channel metric core of `analyze`: (n,) complex baseband at
    the symbol rate -> {rms, sro_ppm, cfo_hz, align, mer_db, ...}.

    resampled: the samples already went through one rate conversion
    (--rate / demux): small SRO readings are then within the
    interpolator's phase-ripple noise and a second cascaded resample
    costs more MER than the residual drift, so the auto-correction gate
    is wider."""
    from atsc_tpu.models.receiver import (
        equalize_field_device,
        estimate_cfo,
        estimate_sro,
        find_field_sync_iq,
        mer_db,
        resample_stream,
    )

    n = P.SYMBOLS_PER_FIELD
    out: dict = {
        "samples": int(iq.size),
        "rms": round(float(np.sqrt(np.mean(np.abs(iq) ** 2))), 6),
    }
    if iq.size < n + P.SYMBOLS_PER_SEGMENT:
        out["error"] = (f"capture too short to analyze: {iq.size} samples "
                        "(< one field + one segment)")
        return out

    # impulse blanking (standard monitor front end): a strong noise
    # burst otherwise CAPTURES the estimators — the PN511 correlator
    # peaks on the burst (false alignment), and SRO/CFO follow it. The
    # 8VSB envelope is Rayleigh (median = 1.177 sigma), so 4x the median
    # is ~4.7 sigma: clean samples essentially never trip it. Blanked
    # spans slice terribly, which is exactly right — the burst detector
    # below still flags them and the MER still reflects the hit; only
    # the sync/rate/carrier estimators stop seeing the impulse energy.
    # Robustness: gap-filled captures (SoapySdrSource zero-fills
    # overflows) can be mostly exact zeros, which would collapse a
    # plain median to 0 and blank the whole signal — take the median
    # over NON-zero samples and floor it at a fraction of the overall
    # RMS so a degenerate baseline can never blank everything.
    amp = np.abs(iq)
    nz = amp[amp > 0]
    base = max(float(np.median(nz)) if nz.size else 0.0,
               0.25 * out["rms"])
    hot = amp > 4.0 * base if base > 0 else np.zeros(amp.shape, bool)
    n_hot = int(hot.sum())
    if n_hot:
        out["blanked_samples"] = n_hot
        iq = np.where(hot, 0, iq)

    # order matters: SRO scales every frequency, so the pilot-based CFO
    # estimate taken on an off-rate capture is biased by pilot_Hz * ppm
    # (~81 Hz at 30 ppm). Align (PN511 correlation is CFO-robust over its
    # 47 us window) -> resample to nominal -> then measure the TRUE
    # carrier offset.
    off, parity = find_field_sync_iq(iq)
    if iq.size - off >= int(2.2 * n):
        rate = float(estimate_sro(iq[off:]))   # capture samples / nominal
        sro_ppm = (rate - 1.0) * 1e6
        out["sro_ppm"] = round(sro_ppm, 3)
        # correct anything beyond the ~1-sample-per-field drift level —
        # EXCEPT on already-resampled inputs, where a few ppm is the
        # interpolator's own phase-ripple noise and a second cascaded
        # resample degrades the MER more than the residual drift
        gate = 5.0 if resampled else 2.0
        if abs(sro_ppm) > gate:
            iq = resample_stream(iq, rate)[0]

    cfo = float(estimate_cfo(iq, search_hz=cfo_search))
    out["cfo_hz"] = round(cfo, 2)
    if abs(cfo) > 0.5:
        iq = iq * np.exp(
            -2j * np.pi * cfo / P.SAMPLE_RATE * np.arange(iq.size))

    off, parity = find_field_sync_iq(iq)
    out["align_offset"] = int(off)
    out["align_parity"] = int(parity)

    if iq.size - off >= n:
        levs: dict = {}  # method -> equalized levels (burst triage below)

        def _adaptive_mer() -> float:
            # phase/epoch-agnostic: the sync-trained adaptive equalizer
            # absorbs any fixed rotation or linear channel
            from atsc_tpu.models.receiver import field_window
            from atsc_tpu.ops.adaptive_eq import AdaptiveEqualizer

            win, osc = field_window(iq[None], off, first_field=parity)
            lev = AdaptiveEqualizer(batch=1).process_field(
                win, osc, parity, soft=True)
            levs["adaptive"] = np.asarray(lev)
            return float(mer_db(lev)[0])

        mer = None
        if off == 0 and parity == 0 and not force_adaptive:
            # looks epoch-aligned: try the ZF inverse of the known TX
            # chain (exact on true loopback). But off==0/parity==0 does
            # NOT prove epoch alignment — a capture cut at a FRAME
            # boundary has the same signature with the oscillator ~pi
            # off — so a poor ZF MER falls back to the adaptive
            # measurement rather than issuing a false not-decodable
            # verdict.
            lev = equalize_field_device(iq[None], 0, soft=True)
            levs["zf"] = np.asarray(lev)
            mer = float(mer_db(lev)[0])
            out["mer_method"] = "zf"
        if mer is None or mer < 20.0:
            adaptive = _adaptive_mer()
            if mer is None or adaptive > mer:
                mer = adaptive
                out["mer_method"] = "adaptive"
        out["mer_db"] = round(mer, 2)
        out["decodable"] = bool(out["mer_db"] >= 15.2)

        # impulse-noise triage on the measured field: heavy-tailed
        # windowed slicer residuals mark gated/burst events, which the
        # RS erasure tier (2*errors + erasures <= 20) recovers far past
        # the errors-only budget — a LOW MER with bursts present is an
        # erasure problem, not (only) a white-noise one, so the soft-
        # trellis gate below uses the burst-excluded MER
        from atsc_tpu.ops.erasures import burst_erasure_flags

        lev_used = levs[out["mer_method"]]
        bflags = burst_erasure_flags(lev_used)[:, :n]
        n_burst = int(bflags.sum())
        out["burst_symbols"] = n_burst
        if n_burst:
            clean = lev_used[:, :n].copy()
            sliced = np.clip(
                np.rint((clean - P.PILOT_OFFSET + 7.0) / 2.0), 0, 7
            ) * 2.0 - 7.0 + P.PILOT_OFFSET
            mask = bflags.astype(bool)
            clean[mask] = sliced[mask]       # zero the burst residuals
            out["mer_clean_db"] = round(float(mer_db(clean)[0]), 2)

        # analog co-channel triage: compare slicer residuals on the
        # plain vs 12-symbol-combed field (ops/ntsc.py detect_ntsc —
        # the comb's ~3 dB white-noise penalty is baked into the vote,
        # so clean/AWGN captures never trip it)
        from atsc_tpu.ops.ntsc import detect_ntsc

        out["ntsc_detected"] = bool(detect_ntsc(lev_used[:, :n]))
    else:
        out["note"] = ("capture too short after alignment for a MER "
                       "field; raise --fields")

    # deliver on the promise: the decode flags this capture needs
    # (capture-context flags — --rate/--demux — are prepended by
    # run_analyze, which knows them)
    flags = []
    if abs(out.get("sro_ppm", 0.0)) > (5.0 if resampled else 2.0):
        flags.append("--sro auto")
    if abs(out.get("cfo_hz", 0.0)) > 5.0:
        flags.append("--cfo auto")
    if out.get("align_offset", 0) or out.get("align_parity", 0):
        flags.append("--align auto")
    if out.get("mer_method") == "adaptive" and "--align auto" not in flags:
        flags.append("--equalizer adaptive")
    # >= 192 flagged symbols = at least one real windowed burst event
    # (the detector dilates each event to ~3 windows); single-window
    # flickers on borderline captures stay below this
    burst_advised = out.get("burst_symbols", 0) >= 192
    if burst_advised:
        flags.append("--erasures burst")
    # soft-trellis gate: when the erasure tier IS advised, judge the
    # white-noise margin from the burst-excluded MER (bursts go to the
    # erasure tier; advising viterbi off burst-depressed MER would cost
    # throughput for nothing on an otherwise-clean capture). Sub-
    # threshold flickers keep the plain MER — they are part of the
    # white-noise picture the soft tier exists for.
    mer = (out.get("mer_clean_db") if burst_advised
           else out.get("mer_db"))
    if mer is None:
        mer = out.get("mer_db")
    if mer is not None and mer < 20.0:
        flags.append("--trellis viterbi")
    if out.get("ntsc_detected"):
        # the comb tier supersedes both: its PR Viterbi is already ML,
        # and the burst detector assumes the plain 8-level slicer
        # (IqReceiver rejects --ntsc + --erasures for that reason)
        flags = [f for f in flags
                 if f not in ("--trellis viterbi", "--erasures burst")]
        flags.append("--ntsc auto")
    out["decode_flags"] = " ".join(flags)
    return out


def run_analyze(args) -> dict:
    """Measure a capture the way a broadcast monitor would: estimate and
    back out CFO, locate the field sync (PN511), estimate SRO from sync
    drift, then equalize one aligned field and report its MER. Estimators
    are the same ones `decode`'s conditioning front end uses, so the
    report predicts which decode flags the capture needs. With --demux B
    the input is a B-slot FDM multiplex at B*6 MHz: it is demuxed and
    every slot gets its own report (per-slot MER table — the headend
    monitoring view)."""
    from atsc_tpu.ops.quantize import BYTES_PER_SAMPLE

    n = P.SYMBOLS_PER_FIELD
    fmt = args.in_format
    slots = int(getattr(args, "demux", 0) or 0)
    if slots:
        from atsc_tpu.ops.mux import FdmDemuxer

        demux = FdmDemuxer(slots)
        per_field_wb = int(np.ceil(n * demux.rate_hz / P.SAMPLE_RATE))
        # +1 field of budget: the first sync can land up to a field in
        # (mid-stream capture), and the SRO/MER gates need their spans
        # AFTER the alignment offset
        want_samples = (args.fields + 1) * per_field_wb + 8192
        native, bw = demux.rate_hz, slots * 6e6
    else:
        want_samples = (args.fields + 1) * n + 2 * P.SYMBOLS_PER_SEGMENT
        native, bw = P.SAMPLE_RATE, 6_000_000.0

    # --rate: the capture (file or live SDR clock) runs at an arbitrary
    # rate; stream-resample it to the native band rate first (the same
    # adapter decode uses; rates below native upsample — fine as long as
    # the occupied band is carried)
    rate_frac = None
    cap_sps = native
    if getattr(args, "rate", None) is not None:
        from fractions import Fraction

        from atsc_tpu.ops.resample import capture_rate

        sps = _parse_sps(args.rate)
        band = 6_000_000 * max(slots, 1)
        if sps < band:
            raise ValueError(
                f"--rate {float(sps):.0f} cannot carry the occupied "
                f"+-{band / 2e6:g} MHz band (needs >= {band / 1e6:g} MS/s)")
        rate_frac = (sps / Fraction(band) if slots else capture_rate(sps))
        cap_sps = float(sps)

    fin = _open_capture(args, cap_sps, bw)
    if rate_frac is not None and rate_frac != 1:
        fin = _ResampledCapture(fin, fmt, rate_frac)
        fmt = "cf32"
    want = want_samples * BYTES_PER_SAMPLE[fmt]
    try:
        buf = fin.read(want)
    finally:
        if fin is not sys.stdin.buffer:
            fin.close()
    iq = _wire_to_complex(buf, fmt)

    resampled = rate_frac is not None and rate_frac != 1
    # capture-context flags the decoder definitionally needs for THIS
    # capture, regardless of what the estimators find
    ctx = []
    if getattr(args, "rate", None) is not None:
        ctx.append(f"--rate {args.rate}")

    if not slots:
        out = _analyze_iq(iq, args.cfo_search, resampled=resampled)
        if "error" in out:
            raise ValueError(out["error"])
        out["decode_flags"] = " ".join(ctx + ([out["decode_flags"]]
                                              if out["decode_flags"] else []))
        return out

    bb = np.concatenate([demux.push(iq), demux.flush()], axis=-1)
    if bb.shape[-1] < n + P.SYMBOLS_PER_SEGMENT:
        raise ValueError(
            f"capture too short to analyze: {bb.shape[-1]} demuxed "
            "samples per slot (< one field + one segment)")
    per_slot = [
        _analyze_iq(bb[s], args.cfo_search, force_adaptive=True,
                    resampled=True)
        for s in range(slots)
    ]
    # decode --demux conditions the whole band, not per slot: it rejects
    # --sro/--cfo/--equalizer, aligns off slot 0, and takes the clock via
    # --rate — so the actionable advice is band-level
    band = [f"--demux {slots}", *ctx]
    if any(s.get("align_offset", 0) or s.get("align_parity", 0)
           for s in per_slot):
        band.append("--align auto")
    out = {
        "multiplex_rate": float(native),
        "slots": slots,
        "samples": int(iq.size),
        "rms": round(float(np.sqrt(np.mean(np.abs(iq) ** 2))), 6),
        "per_slot": per_slot,
        "decode_flags": " ".join(band),
    }
    for s in per_slot:   # per-slot flags are not actionable under --demux
        s.pop("decode_flags", None)
    if (getattr(args, "rate", None) is None
            and any(abs(s.get("sro_ppm", 0.0)) > 5.0 for s in per_slot)):
        out["note"] = ("slots report a sample-rate offset: the wideband "
                       "clock is off — decode with --rate set to the "
                       "capture's true sample rate")
    return out


def main(argv=None) -> int:
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    if argv[:1] == ["analyze"]:
        print(json.dumps(run_analyze(
            build_analyze_argparser().parse_args(argv[1:]))))
        return 0
    if argv[:1] == ["decode"]:
        run_decode(build_decode_argparser().parse_args(argv[1:]))
        return 0
    if argv[:1] == ["encode"]:
        argv = argv[1:]
    args = build_argparser().parse_args(argv)
    channels = args.channels
    if len(args.input) > 1:
        if channels not in (1, len(args.input)):
            print(f"error: {len(args.input)} inputs but --channels "
                  f"{channels}", file=sys.stderr)
            return 2
        channels = len(args.input)
    n_time = n_ch = 1
    if args.mesh:
        try:
            n_time, n_ch = (int(v) for v in args.mesh.lower().split("x"))
        except ValueError:
            print(f"error: --mesh wants TIMExCH (e.g. 4x2), got "
                  f"{args.mesh!r}", file=sys.stderr)
            return 2
    cfg = EncoderConfig(
        channels=channels,
        fields_per_step=args.fields_per_step,
        n_time=n_time,
        n_ch=n_ch,
        mux=args.mux,
        sink=args.output,
        realtime=args.realtime,
        out_format=args.out_format,
        rate=_parse_sps(args.rate) if args.rate is not None else None,
        ppm=args.ppm,
        frequency_hz=args.frequency,
        gain_db=args.gain,
        driver=args.driver,
    )
    run(cfg, args.input, max_fields=args.max_fields, stats=args.stats,
        checkpoint=args.checkpoint, checkpoint_every=args.checkpoint_every,
        resume=args.resume, profile_dir=args.profile)
    return 0


if __name__ == "__main__":
    sys.exit(main())
