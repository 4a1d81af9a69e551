"""Receive-path field-stream sharding: decode T = n_time * F consecutive
received symbol fields per channel in one step, fields distributed over
the "time" mesh axis, channels over "ch".

Mirror of parallel/field_shard.py for the inverse chain (the reference is
transmit-only and single-threaded — both directions of parallelism are
new here). The decoder's cross-field state is even lighter than the
encoder's, because nothing recurses through *decoded* data:

  * the trellis precoder state z2_prev of field k is just bit 2 of field
    k-1's last received symbol per encoder — pure local compute on the
    neighbor's input, exchanged as one ring-permute of 12 bits/channel;
  * the de-interleaver needs field k-1's interleaved byte image, which is
    field-local compute (decommutate + trellis decode of that field) —
    one ring-permute of 64,584 B/channel;
  * RS syndromes are field-local MXU matmuls.

So the device step is embarrassingly parallel plus two O(1) ppermutes,
and its outputs (pre-correction codewords + syndromes) equal the
sequential models/decoder.py decode_field chain exactly. Reed-Solomon
correction of dirty segments runs as one follow-up device dispatch
(ops.rs_decode.rs_correct_field, as in Decoder.decode); clean fields
skip even that.

The soft (Viterbi) tier shards too: see _local_step_soft — path
metrics are the one state component that recurses through decoded
data, handled with a warmup ring-permute at shard seams (the
chunked-MLSE argument). On TPU meshes the per-device Viterbi runs the
fused Pallas kernels (ops/pallas/viterbi_acs.py) inside shard_map —
pallas_call is a per-device op, so the sharding layer is unaffected;
the CPU dryrun exercises the XLA fallback branch of the same step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from atsc_tpu import params as P
from atsc_tpu.models.decoder import DecoderState, init_decoder_state
from atsc_tpu.ops.decode import (
    decommutate_field,
    deinterleave_field,
    derandomize_field,
    enc_major_to_round_major,
    trellis_decode_field,
)
from atsc_tpu.ops.rs_decode import rs_correct_field_jit, syndrome_field
from atsc_tpu.parallel.mesh import CH_AXIS, TIME_AXIS


def _local_step(state: DecoderState, fields: jnp.ndarray):
    """Per-device decode body (runs under shard_map).

    fields: (F, b, >=260416) int8 local received fields; state leaves are
    (b, ...) local channel shards, replicated over the time axis.
    Returns (new state, codewords (F, b, 312, 207), syndromes (F, b, 312, 20)).
    """
    f_dev = fields.shape[0]
    b = fields.shape[1]
    t_idx = jax.lax.axis_index(TIME_AXIS)
    n_time = jax.lax.axis_size(TIME_AXIS)
    ring = [(t, (t + 1) % n_time) for t in range(n_time)]

    # ---- field-local: decommutate + read each field's tail z2 bits ------
    syms = jax.vmap(decommutate_field)(fields)       # (F, b, 12, 21528) int8
    z2_tails = (syms[..., -1].astype(jnp.int32) >> 2) & 1      # (F, b, 12)

    # precoder state of local field f = tail of field f-1 (left neighbor's
    # last field for f=0; the carried state on device 0)
    tail_from_left = jax.lax.ppermute(z2_tails[-1], TIME_AXIS, ring)
    incoming_z2 = jnp.where(t_idx == 0, state.z2_prev, tail_from_left)
    z2_prev = jnp.concatenate([incoming_z2[None], z2_tails[:-1]], axis=0)

    bytes_enc, _ = jax.vmap(trellis_decode_field)(syms, z2_prev)
    cur_il = jax.vmap(enc_major_to_round_major)(bytes_enc)     # (F, b, 64584)

    # ---- de-interleave: needs the previous field's interleaved image ----
    il_from_left = jax.lax.ppermute(cur_il[-1], TIME_AXIS, ring)
    incoming_il = jnp.where(t_idx == 0, state.prev_il, il_from_left)
    prev_il = jnp.concatenate([incoming_il[None], cur_il[:-1]], axis=0)
    rs = jax.vmap(deinterleave_field)(cur_il, prev_il)         # (F, b, 64584)

    codewords = rs.reshape(f_dev, b, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    syn = jax.vmap(syndrome_field)(codewords)

    # ---- next state (replicated over time via masked psum) --------------
    is_last_u8 = (t_idx == n_time - 1).astype(jnp.uint8)
    new_state = DecoderState(
        prev_il=jax.lax.psum(cur_il[-1] * is_last_u8, TIME_AXIS),
        z2_prev=jax.lax.psum(
            z2_tails[-1] * is_last_u8.astype(jnp.int32), TIME_AXIS
        ),
    )
    return new_state, codewords, syn


def _finish_decode(state_cls, t_idx, n_time, ring, state, metrics,
                   bytes_enc, z2_tails):
    """Shared tail of the ML local steps (soft 4-state, i8, NTSC
    16-state): ring-permute the precoder tails, fix up bit 7 of byte 0
    (the only bit that depends on the incoming z2 — the per-field
    decode ran with z2_prev = 0), de-interleave, and assemble the
    replicated next state.

    bytes_enc (F, b, 12, 5382) uint8 decoded with z2_prev = 0;
    z2_tails (F, b, 12) int32. Returns (new_state, codewords, syn)."""
    f_dev, b = bytes_enc.shape[:2]
    tail_from_left = jax.lax.ppermute(z2_tails[-1], TIME_AXIS, ring)
    incoming_z2 = jnp.where(t_idx == 0, state.z2_prev, tail_from_left)
    z2_prev = jnp.concatenate([incoming_z2[None], z2_tails[:-1]], axis=0)
    # x2 of pair 0 is z2_0 ^ z2_prev; the zero-z2_prev decode emitted
    # z2_0, so flip bit 7 of byte 0 wherever the true incoming bit is 1
    fix = (z2_prev.astype(jnp.uint8) & 1) << 7
    bytes_enc = bytes_enc.at[..., 0].set(bytes_enc[..., 0] ^ fix)
    cur_il = jax.vmap(enc_major_to_round_major)(bytes_enc)

    il_from_left = jax.lax.ppermute(cur_il[-1], TIME_AXIS, ring)
    incoming_il = jnp.where(t_idx == 0, state.prev_il, il_from_left)
    prev_il = jnp.concatenate([incoming_il[None], cur_il[:-1]], axis=0)
    rs = jax.vmap(deinterleave_field)(cur_il, prev_il)

    codewords = rs.reshape(f_dev, b, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    syn = jax.vmap(syndrome_field)(codewords)
    is_last_u8 = (t_idx == n_time - 1).astype(jnp.uint8)
    new_state = state_cls(
        prev_il=jax.lax.psum(cur_il[-1] * is_last_u8, TIME_AXIS),
        z2_prev=jax.lax.psum(
            z2_tails[-1] * is_last_u8.astype(jnp.int32), TIME_AXIS
        ),
        metrics=jax.lax.psum(
            metrics * is_last_u8.astype(jnp.float32), TIME_AXIS
        ),
    )
    return new_state, codewords, syn


def _local_step_soft(state, fields: jnp.ndarray, warmup: int = 128):
    """Soft (maximum-likelihood trellis) twin of _local_step.

    fields: (F, b, >=260416) float32 soft levels — or int8 quantized
    soft-level codes (the viterbi-i8 tier: the decommutate gather moves
    int8, 4x less HBM traffic, and the Viterbi kernel dequantizes
    in-register); state is a SoftDecoderState (adds the (b, 12, 4)
    carried Viterbi path metrics).

    Cross-shard metric seam: path metrics recurse through the WHOLE
    symbol stream, so an exact sharded ACS would serialize the time
    axis. Instead each non-first shard warms flat metrics on the last
    `warmup` observations of its left neighbor's stream (one extra
    O(warmup) ring permute of b*12*warmup floats) — the chunked-Viterbi
    argument (ops/viterbi.py): survivors merge within ~32 symbols whp,
    so kept decisions equal the MLSE path at any decodable SNR and RS
    absorbs the rare seam disagreement. Shard 0 keeps the carried
    metrics, so the stream head and the cross-step state stay exact.

    The per-field decode goes through ops.viterbi.viterbi_decode_field
    with z2_prev = 0 (the true incoming precoder bit arrives only with
    the ring permute; it affects exactly bit 7 of byte 0, patched in
    _finish_decode) — so on TPU meshes each device runs the fused
    Pallas ACS/traceback kernels (pallas_call is a per-device op under
    shard_map), and the int8 tier reuses the same kernel's in-register
    dequantization. The CPU dryrun exercises the XLA scan branch of
    the same step.
    """
    from atsc_tpu.models.decoder import SoftDecoderState
    from atsc_tpu.ops.viterbi import _acs_scan, viterbi_decode_field

    f_dev, b = fields.shape[:2]
    t_idx = jax.lax.axis_index(TIME_AXIS)
    n_time = jax.lax.axis_size(TIME_AXIS)
    ring = [(t, (t + 1) % n_time) for t in range(n_time)]

    quantized = fields.dtype == jnp.int8
    soft = jax.vmap(decommutate_field)(
        fields if quantized else fields.astype(jnp.float32)
    )                                             # (F, b, 12, 21528)

    # ---- shard-seam metric warmup -----------------------------------
    tail_obs = jax.lax.ppermute(
        soft[-1][..., -warmup:], TIME_AXIS, ring)          # (b, 12, W)
    if quantized:
        from atsc_tpu.ops.quantize import SOFT_LEVEL_INV

        tail_obs = tail_obs.astype(jnp.float32) * jnp.float32(
            SOFT_LEVEL_INV)
    m_flat = jnp.zeros((b, P.TRELLIS_ENCODERS, 4), jnp.float32)
    m_warm, _ = _acs_scan(m_flat, jnp.moveaxis(tail_obs, -1, 0), 16)
    metrics = jnp.where(t_idx == 0, state.metrics, m_warm)

    # ---- local sequential MLSE over this shard's F fields -----------
    z2_zero = jnp.zeros((b, P.TRELLIS_ENCODERS), jnp.int32)
    bytes_l, tails_l = [], []
    for f in range(f_dev):
        by, z2t, metrics = viterbi_decode_field(soft[f], z2_zero, metrics)
        bytes_l.append(by)
        tails_l.append(z2t)
    return _finish_decode(SoftDecoderState, t_idx, n_time, ring, state,
                          metrics, jnp.stack(bytes_l), jnp.stack(tails_l))


def _local_step_ntsc(state, fields: jnp.ndarray, warmup: int = 128):
    """NTSC-rejection twin of _local_step_soft: 12-symbol comb + 16-state
    partial-response ML trellis (ops/ntsc.py — the analog co-channel
    path). The comb's 12-symbol delay is field-local (ops/ntsc.py module
    docstring: every delayed reference lands inside the same field), so
    the only cross-device state beyond the hard tier's is the (b, 12,
    16) PR path-metric ring — the same seam-warmup treatment as the
    soft tier, with the PR ACS and its per-position reset tables.

    fields: (F, b, >=260416) float32 soft levels (NOT combed, NOT
    sliced); state is an NtscDecoderState.
    """
    from atsc_tpu.models.decoder import NtscDecoderState
    from atsc_tpu.ops.ntsc import (
        _pr_acs_scan,
        _pr_reset_tables,
        comb_field,
        viterbi_pr_decode_field,
    )

    f_dev, b = fields.shape[:2]
    t_idx = jax.lax.axis_index(TIME_AXIS)
    n_time = jax.lax.axis_size(TIME_AXIS)
    ring = [(t, (t + 1) % n_time) for t in range(n_time)]

    y = jax.vmap(
        lambda lv: decommutate_field(comb_field(lv.astype(jnp.float32)))
    )(fields)                                     # (F, b, 12, 21528)

    # ---- shard-seam metric warmup (PR ACS wants its reset tables) ----
    tail_obs = jax.lax.ppermute(
        y[-1][..., -warmup:], TIME_AXIS, ring)             # (b, 12, W)
    reset, const = _pr_reset_tables()
    xs = (jnp.moveaxis(tail_obs, -1, 0),
          jnp.asarray(reset[-warmup:]), jnp.asarray(const[-warmup:]))
    m_flat = jnp.zeros((b, P.TRELLIS_ENCODERS, 16), jnp.float32)
    m_warm, _ = _pr_acs_scan(m_flat, xs, 16)
    metrics = jnp.where(t_idx == 0, state.metrics, m_warm)

    z2_zero = jnp.zeros((b, P.TRELLIS_ENCODERS), jnp.int32)
    bytes_l, tails_l = [], []
    for f in range(f_dev):
        by, z2t, metrics = viterbi_pr_decode_field(y[f], z2_zero, metrics)
        bytes_l.append(by)
        tails_l.append(z2t)
    return _finish_decode(NtscDecoderState, t_idx, n_time, ring, state,
                          metrics, jnp.stack(bytes_l), jnp.stack(tails_l))


def _correct_and_derand(obj, derand, codewords, syn):
    """Shared fixup: RS-correct dirty segments in one device dispatch
    (ops.rs_decode.rs_correct_field — batched inversionless BM +
    bit-matmul Chien/Forney, updating obj's segments_corrected/
    segments_uncorrectable counters), de-randomize, and reshape to TS
    fields. codewords (T, B, 312, 207); syn (T, B, 312, 20). Returns
    (ts (T, B, 58656) uint8, n_errors (T, B, 312))."""
    t, b = codewords.shape[:2]
    n_errors = np.zeros((t, b, P.DATA_SEGMENTS), dtype=np.int32)
    dirty = np.asarray(jnp.any(syn != 0, axis=-1))
    if dirty.any():
        codewords, n_dev = rs_correct_field_jit(
            jnp.asarray(codewords), jnp.asarray(syn)
        )
        n_errors = np.asarray(n_dev)
        obj.segments_corrected += int((n_errors > 0).sum())
        obj.segments_uncorrectable += int((n_errors < 0).sum())
    flat = codewords.reshape(t * b, P.DATA_SEGMENTS, P.SEGMENT_FEC_BYTES)
    ts = np.asarray(derand(flat)).reshape(t, b, P.FIELD_TS_BYTES)
    return ts, n_errors


#: trellis tiers every sharded receive class accepts ('soft-i8' = the
#: int8-quantized soft tier; 'ntsc' = comb + 16-state PR Viterbi)
TRELLIS_TIERS = ("hard", "soft", "soft-i8", "ntsc")


def _trellis_plumbing(trellis: str, batch: int):
    """(state PartitionSpec tree, initial state, shard_map body) for a
    trellis tier: 'hard' = DecoderState + _local_step; 'soft' and
    'soft-i8' = SoftDecoderState (+ 4-state metrics leaf) +
    _local_step_soft (the i8 tier is the same step — the dtype of the
    incoming fields selects the in-kernel dequantization); 'ntsc' =
    NtscDecoderState (16-state PR metrics) + _local_step_ntsc."""
    if trellis in ("soft", "soft-i8"):
        from atsc_tpu.models.decoder import (
            SoftDecoderState,
            init_soft_decoder_state,
        )

        spec = SoftDecoderState(
            prev_il=PSpec(CH_AXIS, None),
            z2_prev=PSpec(CH_AXIS, None),
            metrics=PSpec(CH_AXIS, None, None),
        )
        return spec, init_soft_decoder_state(batch), _local_step_soft
    if trellis == "ntsc":
        from atsc_tpu.models.decoder import (
            NtscDecoderState,
            init_ntsc_decoder_state,
        )

        spec = NtscDecoderState(
            prev_il=PSpec(CH_AXIS, None),
            z2_prev=PSpec(CH_AXIS, None),
            metrics=PSpec(CH_AXIS, None, None),
        )
        return spec, init_ntsc_decoder_state(batch), _local_step_ntsc
    spec = DecoderState(
        prev_il=PSpec(CH_AXIS, None),
        z2_prev=PSpec(CH_AXIS, None),
    )
    return spec, init_decoder_state(batch), _local_step


class ShardedDecoder:
    """Multi-device symbol-field decoder over a ("time", "ch") mesh.

    Decodes T = n_time * fields_per_device consecutive received fields for
    B channels per step; B must be divisible by n_ch. Step k's output TS
    fields are k-1-shifted exactly like the sequential Decoder (one-field
    interleaver latency: a cold-start decoder's first output field is the
    encoder's virtual pre-start field — drop it).
    """

    def __init__(self, mesh: Mesh, batch: int, fields_per_device: int = 1,
                 trellis: str = "hard"):
        if trellis not in TRELLIS_TIERS:
            raise ValueError(f"unknown trellis mode {trellis!r}")
        self.mesh = mesh
        self.batch = batch
        self.f_dev = fields_per_device
        self.trellis = trellis
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_ch = mesh.shape[CH_AXIS]
        self.t_total = self.n_time * fields_per_device
        assert batch % self.n_ch == 0
        self.segments_corrected = 0
        self.segments_uncorrectable = 0

        state_spec, init_state, step_fn = _trellis_plumbing(trellis, batch)
        fields_spec = PSpec(TIME_AXIS, CH_AXIS, None)
        cw_spec = PSpec(TIME_AXIS, CH_AXIS, None, None)

        mapped = jax.shard_map(
            step_fn,
            mesh=mesh,
            in_specs=(state_spec, fields_spec),
            out_specs=(state_spec, cw_spec, cw_spec),
            check_vma=False,
        )
        self._step = jax.jit(mapped, donate_argnums=(0,))
        self._derand = jax.jit(derandomize_field)
        self.state_sharding = jax.tree.map(
            lambda s: NamedSharding(mesh, s), state_spec,
            is_leaf=lambda x: isinstance(x, PSpec),
        )
        self.fields_sharding = NamedSharding(mesh, fields_spec)
        # put_global, not device_put: in a multi-process runtime the
        # state sharding spans remote devices device_put cannot address
        # (parallel/distributed.py put_global); identical single-process
        from atsc_tpu.parallel.distributed import put_global

        self._state = put_global(init_state, self.state_sharding)

    @property
    def state(self) -> DecoderState:
        return self._state

    def decode(self, fields: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(T, B, >=260416) received fields k..k+T-1 (int8 sliced
        symbols for trellis='hard'; float32 soft levels for 'soft' and
        'ntsc'; int8 quantized soft-level codes at
        ops.quantize.SOFT_LEVEL_SCALE for 'soft-i8') ->
        (ts (T, B, 58656) uint8 of fields k-1..k+T-2,
        n_errors (T, B, 312) int32; -1 marks uncorrectable segments)."""
        fields = jax.device_put(jnp.asarray(fields), self.fields_sharding)
        self._state, codewords, syn = self._step(self._state, fields)
        return _correct_and_derand(self, self._derand, codewords, syn)


class ShardedReceiver:
    """Full multi-device receive chain: planar IQ in, TS out.

    Each device equalizes its own fields locally (the +-384-sample window
    context is supplied host-side in the overlapping windows — the
    equalizer needs no collectives at all) and then runs the sharded
    decode body above; the only cross-device traffic remains the two O(1)
    ring permutes.

    equalizer: "zf" (the sample-synchronous known-chain inverse — the
    high-throughput configuration), or "adaptive"/"adaptive-dd" (the
    per-field sync-trained WL-RLS of ops/adaptive_eq.py, + the
    decision-directed pass for -dd). Adaptive training here is strictly
    per-field (the sequential IqReceiver's forgetting=0.0 setting, which
    is also its fastest-tracking one) — each field's 2,068 sync symbols
    already overdetermine the solve, and field-local training is what
    makes the equalizer shard with ZERO cross-device state: sharded
    output equals the sequential forgetting=0 receiver exactly.
    train_every=k (adaptive only, k | fields_per_device) adds the
    retrain-cadence tier: each time shard trains on its local multiples
    of k and rides the cached taps between — still zero cross-device
    state, still byte-equal to the sequential cadence schedule.

    trellis: "hard", "soft" (float MLSE), "soft-i8" (int8-quantized
    soft levels, dequantized in the Viterbi kernel), or "ntsc" (comb +
    16-state partial-response MLSE) — the full sequential tier set
    (r4 VERDICT #2); the ML tiers shard with the zf equalizer. Richer
    host conditioning (SRO/resync) stays in IqReceiver; CFO/alignment
    conditioning for mesh decodes lives in the CLI front end
    (cli.run_decode_mesh --cfo/--align).
    """

    def __init__(self, mesh: Mesh, batch: int, fields_per_device: int = 1,
                 first_field: int = 0, eq_profile: str = "auto",
                 equalizer: str = "zf", trellis: str = "hard",
                 wire_format: str = "cf32", train_every: int = 1):
        from atsc_tpu.models.receiver import (
            _DEV_MARGIN, _eq_step_fn, _fused_eq_enabled, eq_window_bounds,
            DEFAULT_EQ_PROFILE, EQ_PROFILES,
        )

        if equalizer not in ("zf", "adaptive", "adaptive-dd"):
            raise ValueError(f"unknown equalizer {equalizer!r}")
        if trellis not in TRELLIS_TIERS:
            raise ValueError(f"unknown trellis mode {trellis!r}")
        if wire_format not in ("cf32", "cs16", "cs8"):
            raise ValueError(f"unknown wire format {wire_format!r}")
        if equalizer != "zf" and (trellis != "hard"
                                  or wire_format != "cf32"):
            raise ValueError("ML trellis tiers / quantized windows shard "
                             "with the zf equalizer (the adaptive tiers "
                             "stay hard-symbol, cf32 — use the "
                             "sequential IqReceiver for those combos)")
        if train_every != 1 and equalizer == "zf":
            raise ValueError("train_every is the adaptive equalizer's "
                             "retrain cadence — zf does not train")
        self.trellis = trellis
        self.wire_format = wire_format
        self.equalizer = equalizer
        self.eq_profile = eq_profile
        self.train_every = train_every
        dequant = 1.0
        if wire_format != "cf32":
            from atsc_tpu.ops.quantize import quantize_scale

            dequant = 1.0 / quantize_scale(wire_format)
        # 'soft'/'ntsc' want float levels out of the equalizer;
        # 'soft-i8' wants int8 soft-level codes (soft_q)
        soft = trellis in ("soft", "soft-i8", "ntsc")
        soft_q = trellis == "soft-i8"
        self.mesh = mesh
        self.batch = batch
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_ch = mesh.shape[CH_AXIS]
        self.t_total = self.n_time * fields_per_device
        assert batch % self.n_ch == 0
        #: public edge-context amount (decode_iq with_context contract)
        self._margin = _DEV_MARGIN
        # internal equalizer-window geometry (may differ when the fused
        # Pallas kernel is active — its window starts at the FIR operand
        # and carries the kernel's block-aligned length)
        self.window = P.SYMBOLS_PER_FIELD + 2 * _DEV_MARGIN
        self._eq_margin = _DEV_MARGIN
        self._next_field = first_field       # oscillator epoch counter
        self.segments_corrected = 0
        self.segments_uncorrectable = 0

        if equalizer == "zf":
            if _fused_eq_enabled(eq_profile):
                # the fused Pallas kernel per field — the same per-device
                # math as the sequential receiver's device_eq_step
                from atsc_tpu.ops.pallas.eq_fir import eq_fir_fused

                lo_off, wlen = eq_window_bounds(eq_profile)
                self.window = wlen
                self._eq_margin = -lo_off
                resolved = (DEFAULT_EQ_PROFILE if eq_profile == "auto"
                            else eq_profile)
                eq_k = EQ_PROFILES[resolved][0]
                exact = resolved == "exact"

                def eq(win, osc):
                    out = eq_fir_fused(win, osc, eq_k=eq_k, exact=exact,
                                       soft=soft, dequant=dequant,
                                       soft_q=soft_q)
                    return jax.lax.slice_in_dim(
                        out, 0, P.SYMBOLS_PER_FIELD, axis=-1)
            else:
                eq = _eq_step_fn(soft, dequant, eq_profile, soft_q)

            def eq_fields(wins, oscs, start_parity):
                # (F, b, N): int8 symbols (hard) / float32 levels (soft)
                return jax.vmap(eq)(wins, oscs)
        else:
            from atsc_tpu.ops.adaptive_eq import (
                EQ_DIM, _training_set, dd_refine_and_equalize,
                equalize_with_taps, rls_update, solve_and_equalize,
            )

            if train_every != 1 and fields_per_device % train_every:
                raise ValueError(
                    f"train_every={train_every} must divide "
                    f"fields_per_device={fields_per_device}: the cadence "
                    "is device-local (each time shard trains on its own "
                    "multiples-of-k local fields, which equals the "
                    "sequential schedule exactly when k | F)")
            resolved = (DEFAULT_EQ_PROFILE if eq_profile == "auto"
                        else eq_profile)
            prec = EQ_PROFILES[resolved][1]
            dd = equalizer == "adaptive-dd"
            _, targets = _training_set()
            tgt = jnp.asarray(targets)                  # (2, n) float32
            lam = jnp.float32(0.0)                      # per-field training
            ridge = jnp.float32(1e-4)
            f_dev = fields_per_device

            def eq_train(win, osc, parity):
                # win (b, 2, W); osc (2, W); parity traced int32 scalar;
                # returns (symbols, solved taps — reused by the cadence
                # fields until the next train)
                b_loc = win.shape[0]
                r0 = jnp.zeros((b_loc, EQ_DIM, EQ_DIM), jnp.float32)
                v0 = jnp.zeros((b_loc, EQ_DIM), jnp.float32)
                r, v = rls_update(r0, v0, win, osc, tgt[parity], lam)
                if dd:
                    lev, _ = solve_and_equalize(
                        r, v, win, osc, ridge, soft=True,
                        apply_precision="default",
                    )
                    return dd_refine_and_equalize(
                        r, v, lev, win, osc, ridge, apply_precision=prec,
                    )
                return solve_and_equalize(
                    r, v, win, osc, ridge, apply_precision=prec,
                )

            def eq_fields(wins, oscs, start_parity):
                # field f on time-shard t has global index t*F + f;
                # train on local multiples of train_every (k | F makes
                # those exactly the global multiples — the sequential
                # AdaptiveEqualizer(train_every=k, forgetting=0) schedule)
                t_idx = jax.lax.axis_index(TIME_AXIS)
                pars = (start_parity + t_idx * f_dev
                        + jnp.arange(f_dev)) % 2
                syms, w = [], None
                for f in range(f_dev):
                    if f % train_every == 0:
                        sym, w = eq_train(wins[f], oscs[f], pars[f])
                    else:
                        sym = equalize_with_taps(
                            w, wins[f], oscs[f], apply_precision=prec)
                    syms.append(sym)
                return jnp.stack(syms)

        state_spec, init_state, step_fn = _trellis_plumbing(trellis, batch)

        def body(state, wins, oscs, start_parity):
            # wins (F, b, 2, W) float32 (or integer codes); oscs float32
            fields = eq_fields(wins, oscs, start_parity)
            return step_fn(state, fields)

        win_spec = PSpec(TIME_AXIS, CH_AXIS, None, None)
        osc_spec = PSpec(TIME_AXIS, None, None)
        cw_spec = PSpec(TIME_AXIS, CH_AXIS, None, None)
        mapped = jax.shard_map(
            body, mesh=mesh,
            in_specs=(state_spec, win_spec, osc_spec, PSpec()),
            out_specs=(state_spec, cw_spec, cw_spec),
            check_vma=False,
        )
        self._step = jax.jit(mapped, donate_argnums=(0,))
        self._derand = jax.jit(derandomize_field)
        self.state_sharding = jax.tree.map(
            lambda s: NamedSharding(mesh, s), state_spec,
            is_leaf=lambda x: isinstance(x, PSpec),
        )
        self._win_sharding = NamedSharding(mesh, win_spec)
        self._osc_sharding = NamedSharding(mesh, osc_spec)
        # put_global, not device_put: in a multi-process runtime the
        # state sharding spans remote devices device_put cannot address
        # (parallel/distributed.py put_global); identical single-process
        from atsc_tpu.parallel.distributed import put_global

        self._state = put_global(init_state, self.state_sharding)

    @property
    def eq_margin(self) -> int:
        """Samples of left context the equalizer window needs before a
        field's first sample (the window covers
        [g0 - eq_margin, g0 - eq_margin + window))."""
        return self._eq_margin

    @property
    def win_sharding(self):
        """NamedSharding for the (T, B, 2, window) per-step windows —
        build global inputs with parallel.distributed.put_global in a
        multi-process runtime (see tools/distributed_decode.py)."""
        return self._win_sharding

    @property
    def osc_sharding(self):
        """NamedSharding for the (T, 2, window) oscillator spans."""
        return self._osc_sharding

    def decode_iq(
        self, iq: np.ndarray, with_context: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        """iq: (B, T*260416) complex baseband — the next T = t_total
        consecutive fields of the stream, field-aligned.

        SINGLE-PROCESS convenience entry: it device_puts the full global
        window and fetches the full output, which a multi-process
        runtime cannot do (remote shards are unaddressable). Multi-host
        drivers assemble windows per host and run the sharded step
        directly — tools/distributed_decode.py is the production
        pattern (put_global(win_sharding) in, addressable shards out). With
        with_context=True, iq instead carries 384 extra samples on each
        side ((B, T*260416 + 768)) so the equalizer sees real context at
        the step edges; otherwise edge context is zero-filled (the
        resulting handful of boundary symbol errors deinterleave across
        codewords and RS absorbs them). Returns (ts (T, B, 58656),
        n_errors (T, B, 312)) with the usual one-field output latency."""
        from atsc_tpu.models.receiver import field_window

        if self.wire_format != "cf32":
            raise ValueError("this receiver consumes integer wire codes "
                             "— use decode_codes()")
        iq = np.atleast_2d(iq)
        n = P.SYMBOLS_PER_FIELD
        off = -self._margin if with_context else 0
        assert iq.shape[1] == self.t_total * n - 2 * off, (
            f"want exactly {self.t_total} fields of samples"
            + (" + 2*384 context" if with_context else "")
        )
        wins = np.empty((self.t_total, iq.shape[0], 2, self.window),
                        np.float32)
        oscs = np.empty((self.t_total, 2, self.window), np.float32)
        for f in range(self.t_total):
            # oscillator epoch: this step begins at absolute stream field
            # _next_field; field_window's g0 is step-relative
            wins[f], oscs[f] = field_window(
                iq, f * n, first_field=self._next_field, stream_offset=off,
                margin=self._eq_margin, length=self.window,
            )
        start_parity = jnp.int32(self._next_field % 2)
        self._next_field += self.t_total
        wj = jax.device_put(jnp.asarray(wins), self._win_sharding)
        oj = jax.device_put(jnp.asarray(oscs), self._osc_sharding)
        self._state, codewords, syn = self._step(
            self._state, wj, oj, start_parity
        )
        return self._correct(codewords, syn)

    def decode_codes(
        self, codes: np.ndarray, with_context: bool = False
    ) -> tuple[np.ndarray, np.ndarray]:
        """Quantized twin of decode_iq for wire_format='cs16'/'cs8':
        codes (B, T*260416, 2) int16/int8 interleaved (I, Q) wire
        samples, uploaded VERBATIM — the dequantization scale is folded
        into the equalizer's derotation constant on-device, exactly like
        the sequential IqReceiver's push_codes path. With
        with_context=True, codes instead carries 384 extra samples on
        each side ((B, T*260416 + 768, 2)) so the equalizer sees real
        context at the step edges; otherwise edge context is
        zero-filled (RS absorbs the boundary symbols).
        Returns (ts (T, B, 58656), n_errors (T, B, 312))."""
        from atsc_tpu.models.receiver import _osc_planar

        if self.wire_format == "cf32":
            raise ValueError("decode_codes needs wire_format='cs16'/'cs8'")
        codes = np.asarray(codes)
        if codes.ndim == 2:
            codes = codes[None]
        n = P.SYMBOLS_PER_FIELD
        off = -self._margin if with_context else 0
        assert codes.shape[1] == self.t_total * n - 2 * off, (
            f"want exactly {self.t_total} fields of code samples"
            + (" + 2*384 context" if with_context else "")
        )
        b = codes.shape[0]
        wins = np.zeros((self.t_total, b, 2, self.window), codes.dtype)
        oscs = np.empty((self.t_total, 2, self.window), np.float32)
        for f in range(self.t_total):
            lo = f * n - self._eq_margin
            hi = lo + self.window
            a_lo, a_hi = max(lo, off), min(hi, codes.shape[1] + off)
            if a_hi > a_lo:
                src = codes[:, a_lo - off : a_hi - off]
                wins[f, :, 0, a_lo - lo : a_hi - lo] = src[..., 0]
                wins[f, :, 1, a_lo - lo : a_hi - lo] = src[..., 1]
            oscs[f] = _osc_planar(lo, hi, self._next_field)
        start_parity = jnp.int32(self._next_field % 2)
        self._next_field += self.t_total
        wj = jax.device_put(jnp.asarray(wins), self._win_sharding)
        oj = jax.device_put(jnp.asarray(oscs), self._osc_sharding)
        self._state, codewords, syn = self._step(
            self._state, wj, oj, start_parity
        )
        return self._correct(codewords, syn)

    def _correct(self, codewords, syn) -> tuple[np.ndarray, np.ndarray]:
        return _correct_and_derand(self, self._derand, codewords, syn)


def dryrun(n_devices: int) -> None:
    """Compile + run one full multi-chip decode step on an n_devices mesh
    with both axes in use (time-block x channel sharding), covering the
    symbol-field decoder (hard, soft/Viterbi, quantized soft-i8, and
    NTSC partial-response tiers) and the IQ-in receive chain (zf,
    adaptive, soft/soft-i8/ntsc trellis, quantized cs8 windows)."""
    from atsc_tpu.parallel.mesh import make_mesh

    n_time = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    n_ch = n_devices // n_time
    mesh = make_mesh(n_time, n_ch)
    dec = ShardedDecoder(mesh, batch=n_ch, fields_per_device=1)
    fields = np.zeros(
        (dec.t_total, n_ch, P.SYMBOLS_PER_FIELD), dtype=np.int8
    )
    ts, nerr = dec.decode(fields)
    assert ts.shape == (dec.t_total, n_ch, P.FIELD_TS_BYTES)
    for tier, dtype in (("soft", np.float32), ("soft-i8", np.int8),
                        ("ntsc", np.float32)):
        dec_ml = ShardedDecoder(mesh, batch=n_ch, fields_per_device=1,
                                trellis=tier)
        levels = np.zeros(
            (dec_ml.t_total, n_ch, P.SYMBOLS_PER_FIELD), dtype=dtype
        )
        ts, nerr = dec_ml.decode(levels)
        assert ts.shape == (dec_ml.t_total, n_ch, P.FIELD_TS_BYTES)
    rx = ShardedReceiver(mesh, batch=n_ch, fields_per_device=1)
    iq = np.zeros((n_ch, rx.t_total * P.SYMBOLS_PER_FIELD), np.complex64)
    ts, nerr = rx.decode_iq(iq)
    assert ts.shape == (rx.t_total, n_ch, P.FIELD_TS_BYTES)
    rxa = ShardedReceiver(mesh, batch=n_ch, fields_per_device=1,
                          equalizer="adaptive")
    ts, nerr = rxa.decode_iq(iq)
    assert ts.shape == (rxa.t_total, n_ch, P.FIELD_TS_BYTES)
    for tier in ("soft", "soft-i8", "ntsc"):
        rxs = ShardedReceiver(mesh, batch=n_ch, fields_per_device=1,
                              trellis=tier)
        ts, nerr = rxs.decode_iq(iq)
        assert ts.shape == (rxs.t_total, n_ch, P.FIELD_TS_BYTES)
    rxq = ShardedReceiver(mesh, batch=n_ch, fields_per_device=1,
                          wire_format="cs8")
    codes = np.zeros((n_ch, rxq.t_total * P.SYMBOLS_PER_FIELD, 2), np.int8)
    ts, nerr = rxq.decode_codes(codes)
    assert ts.shape == (rxq.t_total, n_ch, P.FIELD_TS_BYTES)
