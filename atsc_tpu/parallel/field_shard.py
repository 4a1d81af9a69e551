"""Field-stream time-block sharding: encode T = n_time * F consecutive
fields per channel in one step, fields distributed over the "time" mesh
axis, channels over "ch".

Why this is possible (SURVEY.md §5.7): after symbol generation the fields
are embarrassingly parallel (the padded field-sync tail supplies the RRC
lookahead), and every cross-field dependency is O(1) state that is either
closed-form in the field index (sync parity, oscillator phasor) or
XOR-linear in the data (trellis carries — prefix-XOR of per-field
parities) or a single field buffer (interleaver double-buffer, reserved
symbols). The step therefore needs only:

  * one ring-permute of each device's last RS field to its right neighbor
    (interleaver cross-field input),
  * one all-gather of per-device 36-bit trellis parity totals + an
    exclusive XOR scan across the time axis,
  * one ring-permute of 12 boundary symbols (reserved-symbol tails),

all O(1) in the number of fields per device. The bit-exactness contract is
preserved: results equal the sequential encoder's exactly (tested against
it on a virtual 8-device mesh).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from atsc_tpu import params as P
from atsc_tpu.models.encoder import (
    EncoderState,
    _use_fused_offset_fir,
    init_state,
)
from atsc_tpu.ops.assemble import assemble_field_structured, field_levels, _tables as _assemble_tables
from atsc_tpu.ops.interleave import interleave_field_enc_major
from atsc_tpu.ops.offset import _osc_planar, _scale_planar
from atsc_tpu.ops.randomize import randomize_field
from atsc_tpu.ops.rrc_filter import rrc_filter_field
from atsc_tpu.ops.rs_encode import rs_encode_field
from atsc_tpu.ops.trellis import trellis_encode_field
from atsc_tpu.parallel.mesh import CH_AXIS, TIME_AXIS


@functools.lru_cache(maxsize=1)
def _tail_src() -> np.ndarray:
    """Gather indices of the last 12 data symbols of a field (the reserved
    symbols of the next field) into the flattened (12*21528,) symbol array."""
    src, _, _ = _assemble_tables()
    return src[P.SYMBOLS_PER_FIELD - P.RESERVED_SYMBOLS : P.SYMBOLS_PER_FIELD]


@functools.lru_cache(maxsize=1)
def _even_pos() -> np.ndarray:
    """(21528,) int8: 1 at even bit-pair positions (z0_even), 0 at odd."""
    pat = np.zeros(P.TRELLIS_SYMBOLS_PER_ENCODER, dtype=np.int8)
    pat[0::2] = 1
    return pat


def _phasor_chain(phasor0: jnp.ndarray, t_total: int) -> jnp.ndarray:
    """Replay the float32 per-field phasor recurrence for t_total fields.

    phasor0: (B, 2) -> (t_total, B, 2) where element g is the phasor of
    global field g of this step. Bit-identical to the sequential encoder's
    stepwise complex64 multiply.
    """
    s = _scale_planar()
    sr, si = jnp.float32(s[0]), jnp.float32(s[1])

    def step(ph, _):
        nxt = jnp.stack(
            [ph[:, 0] * sr - ph[:, 1] * si, ph[:, 0] * si + ph[:, 1] * sr],
            axis=-1,
        )
        return nxt, ph

    _, chain = jax.lax.scan(step, phasor0, None, length=t_total)
    return chain  # chain[g] = phasor *before* advancing at field g


def _local_step(state: EncoderState, ts: jnp.ndarray, fields_per_device: int,
                out_format: str = "cf32"):
    """Per-device body (runs under shard_map).

    ts: (F, b, 58656) local fields; state leaves are (b, ...) local
    channel shards, replicated over the time axis.
    """
    f_dev = fields_per_device
    t_idx = jax.lax.axis_index(TIME_AXIS)
    n_time = jax.lax.axis_size(TIME_AXIS)
    t_total = f_dev * n_time
    b = ts.shape[1]

    # ---- field-local FEC ----------------------------------------------------
    rand = jax.vmap(randomize_field)(ts)                  # (F, b, 312, 207)
    rs = jax.vmap(rs_encode_field)(rand)
    rs_flat = rs.reshape(f_dev, b, P.DATA_PER_FIELD)

    # ---- interleaver: needs previous field's RS output ----------------------
    ring = [(t, (t + 1) % n_time) for t in range(n_time)]
    rs_from_left = jax.lax.ppermute(rs_flat[-1], TIME_AXIS, ring)
    incoming_rs = jnp.where(t_idx == 0, state.prev_rs, rs_from_left)
    prev_rs = jnp.concatenate([incoming_rs[None], rs_flat[:-1]], axis=0)
    il = jax.vmap(interleave_field_enc_major)(rs_flat, prev_rs)  # (F,b,12,5382)
    il = jax.lax.optimization_barrier(il)  # see models/encoder.py: stops XLA
    # from re-fusing (= recomputing) the gather into every trellis consumer

    # ---- trellis: local zero-carry scans + XOR carry propagation ------------
    zeros = jnp.zeros((b, P.TRELLIS_ENCODERS), dtype=jnp.int32)
    sym_local, dd, dd1, dd2 = jax.vmap(
        lambda x: trellis_encode_field(x, zeros, zeros, zeros)
    )(il)
    deltas = jnp.stack([dd, dd1, dd2], axis=1)            # (F, 3, b, 12)

    # exclusive XOR scan over local fields
    incl = jnp.cumsum(deltas, axis=0)
    excl = (incl - deltas) & 1
    total = incl[-1] & 1                                   # (3, b, 12)

    # exclusive XOR scan across time devices (all-gather of 36 bits/channel)
    gathered = jax.lax.all_gather(total, TIME_AXIS)        # (n_time, 3, b, 12)
    dev_idx = jax.lax.broadcasted_iota(jnp.int32, (n_time, 1, 1, 1), 0)
    dev_prefix = jnp.sum(jnp.where(dev_idx < t_idx, gathered, 0), axis=0) & 1

    state_carry = jnp.stack(
        [state.trellis_d, state.trellis_d1, state.trellis_d2], axis=0
    )  # (3, b, 12)
    carries = (excl + dev_prefix[None] + state_carry[None]) & 1  # (F, 3, b, 12)

    # apply carries: z2 toggles symbol bit 2; z0 toggles bit 0, with the
    # d1 carry on even bit-pair positions and the d2 carry on odd ones
    even = jnp.asarray(_even_pos())                        # (21528,) int8
    c_d = carries[:, 0].astype(jnp.int8)[..., None]        # (F, b, 12, 1)
    c_d1 = carries[:, 1].astype(jnp.int8)[..., None]
    c_d2 = carries[:, 2].astype(jnp.int8)[..., None]
    mask = c_d * 4 + c_d1 * even + c_d2 * (1 - even)
    symbols = jnp.bitwise_xor(sym_local, mask)             # (F, b, 12, 21528)
    symbols = jax.lax.optimization_barrier(symbols)

    new_trellis = (state_carry + jnp.sum(gathered, axis=0)) & 1  # (3, b, 12)

    # ---- reserved-symbol tails across field boundaries ----------------------
    flat_syms = symbols.reshape(f_dev, b, -1)
    tails = jnp.take(flat_syms, jnp.asarray(_tail_src()), axis=-1)  # (F,b,12) i8
    tail_from_left = jax.lax.ppermute(tails[-1], TIME_AXIS, ring)
    incoming_saved = jnp.where(t_idx == 0, state.saved, tail_from_left)
    saved = jnp.concatenate([incoming_saved[None], tails[:-1]], axis=0)

    # ---- closed-form parity + phasor per global field index -----------------
    g0 = t_idx * f_dev
    local_g = g0 + jnp.arange(f_dev)                       # global field index
    parity = (state.parity[None, :] + local_g[:, None]) & 1  # (F, b)

    phasors_all = _phasor_chain(state.phasor, t_total)     # (T, b, 2)
    phasors = jax.lax.dynamic_slice_in_dim(phasors_all, g0, f_dev, axis=0)

    # ---- assemble + offset + RRC (field-local) ------------------------------
    # The back half is field-local, so the per-device work is identical to
    # the sequential encoder's: on TPU backends it runs the fused Pallas
    # level-map+offset+FIR kernel (with in-kernel cs16/cs8 quantization);
    # the CPU/test path keeps the unfused XLA ops (models/encoder.py:35-45).
    if _use_fused_offset_fir():
        from atsc_tpu.ops.pallas.offset_fir import (
            QUANT_FIELD_LEN,
            offset_fir_fused,
        )

        pad_to = P.PADDED_SYMBOLS if out_format == "cf32" else QUANT_FIELD_LEN
        field, _ = jax.vmap(
            lambda s, p, sv: assemble_field_structured(s, p, sv, pad_to=pad_to)
        )(symbols, parity, saved)
        iq = offset_fir_fused(
            field.reshape(f_dev * b, pad_to),
            phasors.reshape(f_dev * b, 2),
            out_format=out_format,
        )
        iq = iq.reshape(f_dev, b, 2, iq.shape[-1])
    else:
        field, _ = jax.vmap(assemble_field_structured)(symbols, parity, saved)
        levels = field_levels(field)                       # (F, b, 261248) f32

        osc_re, osc_im = _osc_planar()
        tr = jnp.asarray(osc_re)
        ti = jnp.asarray(osc_im)
        pr = phasors[..., 0:1]
        pi = phasors[..., 1:2]
        out_re = levels * (tr[None, None] * pr - ti[None, None] * pi)
        out_im = levels * (tr[None, None] * pi + ti[None, None] * pr)
        iq_padded = jnp.stack([out_re, out_im], axis=2)    # (F, b, 2, 261248)

        iq = rrc_filter_field(
            iq_padded.reshape(f_dev * b, 2, P.PADDED_SYMBOLS)
        )
        iq = iq.reshape(f_dev, b, 2, P.PADDED_OUT)
        if out_format != "cf32":
            from atsc_tpu.ops.quantize import quantize_iq

            iq = quantize_iq(iq, out_format)

    # ---- next state (replicated over time via masked psum) ------------------
    is_last_u8 = (t_idx == n_time - 1).astype(jnp.uint8)
    is_last_i8 = is_last_u8.astype(jnp.int8)
    new_state = EncoderState(
        prev_rs=jax.lax.psum(rs_flat[-1] * is_last_u8, TIME_AXIS),
        trellis_d=new_trellis[0],
        trellis_d1=new_trellis[1],
        trellis_d2=new_trellis[2],
        saved=jax.lax.psum(tails[-1] * is_last_i8, TIME_AXIS),
        parity=(state.parity + t_total) & 1,
        phasor=phasors_all[-1],  # phasor *after* t_total-1 advances...
    )
    # phasors_all[g] is the phasor used AT field g; the carried phasor must
    # be the one for field t_total (one more advance):
    s = _scale_planar()
    last = phasors_all[-1]
    new_phasor = jnp.stack(
        [last[:, 0] * jnp.float32(s[0]) - last[:, 1] * jnp.float32(s[1]),
         last[:, 0] * jnp.float32(s[1]) + last[:, 1] * jnp.float32(s[0])],
        axis=-1,
    )
    new_state = new_state._replace(phasor=new_phasor)
    return new_state, iq


class ShardedEncoder:
    """Multi-device encoder over a ("time", "ch") mesh.

    Encodes T = n_time * fields_per_device consecutive fields for B
    channels per step; B must be divisible by n_ch. Results are exactly
    equal to the sequential encoder's.
    """

    def __init__(self, mesh: Mesh, batch: int, fields_per_device: int = 1,
                 out_format: str = "cf32"):
        self.mesh = mesh
        self.batch = batch
        self.f_dev = fields_per_device
        self.n_time = mesh.shape[TIME_AXIS]
        self.n_ch = mesh.shape[CH_AXIS]
        self.t_total = self.n_time * fields_per_device
        self.out_format = out_format
        assert batch % self.n_ch == 0

        state_spec = EncoderState(
            prev_rs=PSpec(CH_AXIS, None),
            trellis_d=PSpec(CH_AXIS, None),
            trellis_d1=PSpec(CH_AXIS, None),
            trellis_d2=PSpec(CH_AXIS, None),
            saved=PSpec(CH_AXIS, None),
            parity=PSpec(CH_AXIS),
            phasor=PSpec(CH_AXIS, None),
        )
        ts_spec = PSpec(TIME_AXIS, CH_AXIS, None)
        iq_spec = PSpec(TIME_AXIS, CH_AXIS, None, None)

        body = functools.partial(_local_step, fields_per_device=fields_per_device,
                                 out_format=out_format)
        mapped = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(state_spec, ts_spec),
            out_specs=(state_spec, iq_spec),
            check_vma=False,
        )
        self._step = jax.jit(mapped, donate_argnums=(0,))
        self.state_sharding = jax.tree.map(
            lambda s: NamedSharding(mesh, s), state_spec,
            is_leaf=lambda x: isinstance(x, PSpec),
        )
        self.ts_sharding = NamedSharding(mesh, ts_spec)

    def init_state(self, field_index: int = 0) -> EncoderState:
        st = init_state(self.batch, field_index)
        return jax.device_put(st, self.state_sharding)

    def step(self, state: EncoderState, ts) -> tuple[EncoderState, jax.Array]:
        """ts: (T, B, 58656) uint8 -> ((state), (T, B, 2, >=260416) planar
        IQ — float32 for cf32, int16/int8 codes for cs16/cs8; samples
        [0, 260416) are the valid field output either way)."""
        ts = jax.device_put(jnp.asarray(ts), self.ts_sharding)
        return self._step(state, ts)


def dryrun(n_devices: int) -> None:
    """Compile + run one full multi-chip step on an n_devices mesh with
    both mesh axes in use (time-block x channel sharding), in both the
    cf32 and the quantized (cs8) output formats."""
    from atsc_tpu.parallel.mesh import make_mesh

    n_time = 2 if n_devices % 2 == 0 and n_devices >= 2 else 1
    n_ch = n_devices // n_time
    mesh = make_mesh(n_time, n_ch)
    enc = ShardedEncoder(mesh, batch=n_ch, fields_per_device=1)
    ts = np.zeros((enc.t_total, n_ch, P.FIELD_TS_BYTES), dtype=np.uint8)
    state = enc.init_state()
    state, iq = enc.step(state, ts)
    jax.block_until_ready(iq)
    assert iq.shape == (enc.t_total, n_ch, 2, P.PADDED_OUT)

    enc8 = ShardedEncoder(mesh, batch=n_ch, fields_per_device=1,
                          out_format="cs8")
    state8 = enc8.init_state()
    state8, iq8 = enc8.step(state8, ts)
    jax.block_until_ready(iq8)
    assert iq8.dtype == jnp.int8 and iq8.shape[-1] >= P.SYMBOLS_PER_FIELD
