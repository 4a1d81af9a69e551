"""Fused Pallas soft-Viterbi: in-kernel ACS forward scan + traceback.

The XLA formulation (ops/viterbi.py) is *issue-overhead*-bound, not
compute-bound: each of the 21,528 sequential trellis steps is ~30 tiny
elementwise ops on (B, 12, 4) operands, and every op pays a full XLA
kernel-pass overhead on a few-KB array (unrolling 24 steps per scan body
bought 13x in round 4, but the per-op cost floor remains — 37 ms/field
at B=256). Here the whole forward scan runs inside ONE Pallas kernel:
the (batch, encoder) axes flatten to (R, 128) vector registers
(R = 12B/128 — zero lane padding when B % 32 == 0), the 4-state axis
unrolls into named variables so every ACS update is straight-line VPU
code with no gathers, shuffles, or relayouts, and decisions leave as 4
packed trellis steps per int32 lane (8 bits/step: 2 bits per state).

Numerics are deliberately IDENTICAL to the XLA path: same distance
formula, same compare/min/select orderings, and the same re-normalize-
every-24-steps cadence, so path metrics and decisions are bit-identical
(f32 elementwise ops are exact on both backends) — verified in
tests/test_viterbi.py and on chip (tools/chip_gauntlet.py).

Trellis semantics anchor: reference src/atsc/trellis.h:10-51 (state
s = 2*D1 + D2; Z0 = D1; on input X1: s' = 2*(X1^D2) + D1); the uncoded
Z2 bit is the per-branch parallel transition resolved by the coset min.

Layouts (one field, T = 21,528 symbols per encoder):
  obs      (T, R, 128) f32   — moveaxis of the (B, 12, T) soft levels
  metrics  (4, R, 128) f32   — state-major carried path metrics
  decisions/bits (T//4, R, 128) int32 — byte k of word i = step 4i+k
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from atsc_tpu import params as P

_LANES = 128
_GROUP = 24          # ACS steps per re-normalization (== XLA path's UNROLL)
_WPG = _GROUP // 4   # packed int32 words per group


@functools.lru_cache(maxsize=1)
def _levels8() -> tuple[float, ...]:
    """Constellation level of symbol v = 4*Z2 + 2*X1 + Z0, pilot included."""
    v = np.arange(8, dtype=np.float32)
    return tuple(float(x) for x in v * 2 - 7 + np.float32(P.PILOT_OFFSET))


def _chunk_groups(groups: int, r: int, lane_bytes: int = 4) -> int:
    """Largest divisor of `groups` whose per-chunk blocks stay <= ~4 MB
    of VMEM (double-buffered by Mosaic). lane_bytes: bytes per
    symbol-lane across ALL of the kernel's blocks — 4 for the 4-state
    tier (f32 obs in, packed int32 decisions out at 1/4 rate), 12 for
    the 16-state PR tier (f32 obs + int32 reset + int32 decisions)."""
    budget = max(1, (4 << 20) // (_GROUP * r * _LANES * lane_bytes))
    best = 1
    for d in range(1, groups + 1):
        if groups % d == 0 and d <= budget:
            best = d
    return best


def _acs_update(m, obs):
    """One add-compare-select, gather-free: m = (m0, m1, m2, m3) path
    metrics, obs (R, 128) f32. Returns (new metrics tuple, decision byte
    (R, 128) int32: bits (2s, 2s+1) = (x1, z2) of new state s)."""
    lv = _levels8()
    i32 = jnp.int32
    d = [(obs - lv[v]) ** 2 for v in range(8)]
    # parallel-branch (Z2) resolution per (x1, z0-branch) pair; the z2
    # candidate bit is materialized as int32 immediately (Mosaic cannot
    # select between i1 vectors: "Unsupported target bitwidth")
    p00, zc00 = jnp.minimum(d[0], d[4]), (d[4] < d[0]).astype(i32)
    p01, zc01 = jnp.minimum(d[1], d[5]), (d[5] < d[1]).astype(i32)
    p10, zc10 = jnp.minimum(d[2], d[6]), (d[6] < d[2]).astype(i32)
    p11, zc11 = jnp.minimum(d[3], d[7]), (d[7] < d[3]).astype(i32)
    m0, m1, m2, m3 = m

    def upd(c0, c1, zc0, zc1):
        x1 = c1 < c0
        z2 = jnp.where(x1, zc1, zc0)
        return (jnp.minimum(c0, c1), x1.astype(i32) | (z2 << 1))

    # new state s' = 2a + b: preds 2b+a (X1=0) and 2b+1-a (X1=1),
    # branch bit Z0 = b (reference trellis.h:23-34 recurrence inverted)
    n0, b0 = upd(m0 + p00, m1 + p10, zc00, zc10)
    n1, b1 = upd(m2 + p01, m3 + p11, zc01, zc11)
    n2, b2 = upd(m1 + p00, m0 + p10, zc00, zc10)
    n3, b3 = upd(m3 + p01, m2 + p11, zc01, zc11)
    dec = b0 | (b1 << 2) | (b2 << 4) | (b3 << 6)
    return (n0, n1, n2, n3), dec


def _acs_kernel(obs_ref, m_ref, dec_ref, mout_ref, msc_ref, *, groups,
                inv_scale=None):
    @pl.when(pl.program_id(0) == 0)
    def _():
        msc_ref[...] = m_ref[...]

    def body(g, _):
        m = (msc_ref[0], msc_ref[1], msc_ref[2], msc_ref[3])
        for j in range(_WPG):
            word = None
            for k in range(4):
                obs = obs_ref[pl.ds(g * _GROUP + j * 4 + k, 1)][0]
                if inv_scale is not None:
                    # quantized soft-level codes: one fused dequant
                    # multiply per step (ops.quantize SOFT_LEVEL_INV)
                    obs = obs.astype(jnp.float32) * jnp.float32(inv_scale)
                m, dec = _acs_update(m, obs)
                word = dec if word is None else word | (dec << (8 * k))
            dec_ref[pl.ds(g * _WPG + j, 1)] = word[None]
        # re-normalize once per group (identical cadence to the XLA path)
        mn = jnp.minimum(jnp.minimum(m[0], m[1]), jnp.minimum(m[2], m[3]))
        msc_ref[0] = m[0] - mn
        msc_ref[1] = m[1] - mn
        msc_ref[2] = m[2] - mn
        msc_ref[3] = m[3] - mn
        return 0

    jax.lax.fori_loop(0, groups, body, 0)
    mout_ref[...] = msc_ref[...]


def _tb_kernel(dec_ref, start_ref, bits_ref, ssc_ref, *, words):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ssc_ref[...] = start_ref[...]

    def body(g, _):
        idx = words - 1 - g
        w = dec_ref[pl.ds(idx, 1)][0]
        s = ssc_ref[...]
        out = None
        for k in (3, 2, 1, 0):
            byte = (w >> (8 * k)) & 0xFF
            sel = (byte >> (s << 1)) & 3
            x1 = sel & 1
            z2 = (sel >> 1) & 1
            ob = (x1 | (z2 << 1)) << (8 * k)
            out = ob if out is None else out | ob
            s = ((s & 1) << 1) | ((s >> 1) ^ x1)
        ssc_ref[...] = s
        bits_ref[pl.ds(idx, 1)] = out[None]
        return 0

    jax.lax.fori_loop(0, words, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret", "inv_scale"))
def acs_forward(obs: jnp.ndarray, metrics: jnp.ndarray,
                interpret: bool = False, inv_scale: float | None = None):
    """Forward ACS over obs (T, R, 128) f32 — or int8 level codes
    dequantized in-kernel by inv_scale — from metrics (4, R, 128) f32.
    Returns (decisions (T//4, R, 128) int32, final metrics (4, R, 128))."""
    t, r, lanes = obs.shape
    assert lanes == _LANES and t % _GROUP == 0, obs.shape
    groups = t // _GROUP
    gc = _chunk_groups(groups, r)
    nch = groups // gc
    dec, mout = pl.pallas_call(
        functools.partial(_acs_kernel, groups=gc, inv_scale=inv_scale),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((gc * _GROUP, r, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, r, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gc * _WPG, r, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((4, r, _LANES), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t // 4, r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((4, r, _LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((4, r, _LANES), jnp.float32)],
        interpret=interpret,
    )(obs, metrics)
    return dec, mout


@functools.partial(jax.jit, static_argnames=("interpret",))
def traceback(dec: jnp.ndarray, start: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    """Reverse traceback over packed decisions from start (R, 128) int32.
    Returns bit words (T//4, R, 128) int32: byte k of word i = the
    (x1 | z2<<1) pair of trellis step 4i+k."""
    words, r, lanes = dec.shape
    assert lanes == _LANES, dec.shape
    gc = _chunk_groups(words // _WPG, r)
    nch = words // (gc * _WPG)
    wc = gc * _WPG
    return pl.pallas_call(
        functools.partial(_tb_kernel, words=wc),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((wc, r, _LANES), lambda i, n=nch: (n - 1 - i, 0, 0)),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (wc, r, _LANES), lambda i, n=nch: (n - 1 - i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((words, r, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, _LANES), jnp.int32)],
        interpret=interpret,
    )(dec, start)


def pack_bits_to_bytes(bits: jnp.ndarray, z2_prev_row: jnp.ndarray):
    """Packed traceback words -> trellis bytes, all on packed operands.

    bits (W, R, 128) int32 (byte k = x1 | z2<<1 of step 4i+k);
    z2_prev_row (R, 128) int32 in {0, 1} — the carried precoder state.
    Returns (bytes (W, R, 128) int32 in [0, 256), z2_last (R, 128)).
    The differential decode x2_t = z2_t ^ z2_{t-1} runs on whole packed
    words (byte-shift within the word + a one-word roll for the
    boundary), and the MSB-first 4-pair byte assembly is a short
    elementwise chain XLA fuses into one pass — ~20x less traffic than
    unpacking to per-symbol planes first.
    """
    ones = jnp.int32(0x01010101)
    x1w = bits & ones
    z2w = (bits >> 1) & ones
    hi = (z2w >> 24) & 1                     # byte 3 -> next word's byte 0
    carry = jnp.concatenate([z2_prev_row[None], hi[:-1]], axis=0)
    x2w = z2w ^ (((z2w << 8) | carry) & ones)
    acc = jnp.zeros_like(bits)
    for k in range(4):
        # pair k of the byte sits at bits (7-2k, 6-2k), MSB-first
        acc = acc | (((x2w >> (8 * k)) & 1) << (7 - 2 * k))
        acc = acc | (((x1w >> (8 * k)) & 1) << (6 - 2 * k))
    return acc, hi[-1]


# -- 16-state NTSC partial-response tier ---------------------------------
#
# Same construction for ops/ntsc.py's combined-state PR Viterbi: 16 named
# metric variables, one branch-metric square per (emitted-level v,
# predecessor-symbol w) pair (all 64 occur), argmin over the 4 symbol
# hypotheses as a compare/select tree with jnp.argmin's first-min tie
# rule. The per-step segment-sync "reset" (the comb reference landing on
# a known sync symbol, ops/ntsc.py _pr_reset_tables) arrives as a packed
# int32 side input: bit 0 = reset, bit 1 = sync-level sign (+5/-5).
# One decision word per step holds all 16 states' 2-bit h_prev picks.

def _pr_update(m, obs, rc):
    """m: tuple of 16 path metrics; obs, rc (R, 128) f32/int32.
    Returns (new metrics tuple, decision word (R, 128) int32)."""
    f32 = jnp.float32
    i32 = jnp.int32
    reset = (rc & 1) == 1
    const = jnp.where((rc >> 1) == 1, f32(5.0), f32(-5.0))
    # a_v = obs - emitted_level(v); pe_w = delayed-reference level per
    # predecessor-symbol index w = 2h + j (j = pred trellis state's D1)
    a = [obs - f32(2 * v - 7) for v in range(8)]
    pe = [jnp.where(reset, const, f32(2 * w - 7)) for w in range(8)]
    # combined state u = s2*4 + h': v = 2h' + (s2&1), x1 = h'&1,
    # pred trellis state = PRED0[s2]^x1 (PRED0 = [0,2,1,3]), j = pred&1
    word = None
    new = []
    for u in range(16):
        s2, h1 = u >> 2, u & 3
        v = 2 * h1 + (s2 & 1)
        x1 = h1 & 1
        sp = (2 * (s2 & 1) + (s2 >> 1)) ^ x1
        j = sp & 1
        cand = [m[sp * 4 + h] + (a[v] + pe[2 * h + j]) ** 2
                for h in range(4)]
        m01 = jnp.minimum(cand[0], cand[1])
        i01 = (cand[1] < cand[0]).astype(i32)
        m23 = jnp.minimum(cand[2], cand[3])
        i23 = (cand[3] < cand[2]).astype(i32)
        pick = m23 < m01
        new.append(jnp.minimum(m01, m23))
        idx = jnp.where(pick, 2 + i23, i01)
        w_u = idx << (2 * u) if u else idx
        word = w_u if word is None else word | w_u
    return tuple(new), word


def _pr_acs_kernel(obs_ref, rc_ref, m_ref, dec_ref, mout_ref, msc_ref, *,
                   groups):
    @pl.when(pl.program_id(0) == 0)
    def _():
        msc_ref[...] = m_ref[...]

    def group(g, _):
        def step(i, m):
            t = g * _GROUP + i
            m, word = _pr_update(m, obs_ref[pl.ds(t, 1)][0],
                                 rc_ref[pl.ds(t, 1)][0])
            dec_ref[pl.ds(t, 1)] = word[None]
            return m

        m = jax.lax.fori_loop(
            0, _GROUP, step, tuple(msc_ref[u] for u in range(16))
        )
        mn = m[0]
        for u in range(1, 16):
            mn = jnp.minimum(mn, m[u])
        for u in range(16):
            msc_ref[u] = m[u] - mn
        return 0

    jax.lax.fori_loop(0, groups, group, 0)
    mout_ref[...] = msc_ref[...]


def _pr_tb_kernel(dec_ref, start_ref, bits_ref, ssc_ref, *, steps):
    @pl.when(pl.program_id(0) == 0)
    def _():
        ssc_ref[...] = start_ref[...]

    def body(g, _):
        # 4 reverse trellis steps -> one packed output word (byte k of
        # word i = the (x1 | z2<<1) pair of step 4i+k, as in _tb_kernel)
        widx = steps // 4 - 1 - g
        s = ssc_ref[...]
        out = None
        for k in (3, 2, 1, 0):
            w = dec_ref[pl.ds(widx * 4 + k, 1)][0]
            h_prev = (w >> (s << 1)) & 3
            x1 = s & 1
            z2 = (s >> 1) & 1
            ob = (x1 | (z2 << 1)) << (8 * k)
            out = ob if out is None else out | ob
            s2 = s >> 2
            pred_s = ((2 * (s2 & 1)) | (s2 >> 1)) ^ x1
            s = (pred_s << 2) | h_prev
        ssc_ref[...] = s
        bits_ref[pl.ds(widx, 1)] = out[None]
        return 0

    jax.lax.fori_loop(0, steps // 4, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pr_acs_forward(obs: jnp.ndarray, rc: jnp.ndarray, metrics: jnp.ndarray,
                   interpret: bool = False):
    """PR forward ACS: obs/rc (T, R, 128) f32/int32, metrics (16, R, 128).
    Returns (decisions (T, R, 128) int32, final metrics (16, R, 128))."""
    t, r, lanes = obs.shape
    assert lanes == _LANES and t % _GROUP == 0, obs.shape
    groups = t // _GROUP
    gc = _chunk_groups(groups, r, lane_bytes=12)
    nch = groups // gc
    return pl.pallas_call(
        functools.partial(_pr_acs_kernel, groups=gc),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((gc * _GROUP, r, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((gc * _GROUP, r, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((16, r, _LANES), lambda i: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((gc * _GROUP, r, _LANES), lambda i: (i, 0, 0)),
            pl.BlockSpec((16, r, _LANES), lambda i: (0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((t, r, _LANES), jnp.int32),
            jax.ShapeDtypeStruct((16, r, _LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((16, r, _LANES), jnp.float32)],
        interpret=interpret,
    )(obs, rc, metrics)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pr_traceback(dec: jnp.ndarray, start: jnp.ndarray,
                 interpret: bool = False) -> jnp.ndarray:
    """PR reverse traceback: dec (T, R, 128) int32 (one word per step),
    start (R, 128) int32 combined state. Returns packed bit words
    (T//4, R, 128) int32 in the _tb_kernel layout."""
    t, r, lanes = dec.shape
    assert lanes == _LANES and t % _GROUP == 0, dec.shape
    gc = _chunk_groups(t // _GROUP, r, lane_bytes=12)
    nch = t // (gc * _GROUP)
    sc = gc * _GROUP
    return pl.pallas_call(
        functools.partial(_pr_tb_kernel, steps=sc),
        grid=(nch,),
        in_specs=[
            pl.BlockSpec((sc, r, _LANES), lambda i, n=nch: (n - 1 - i, 0, 0)),
            pl.BlockSpec((r, _LANES), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (sc // 4, r, _LANES), lambda i, n=nch: (n - 1 - i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((t // 4, r, _LANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((r, _LANES), jnp.int32)],
        interpret=interpret,
    )(dec, start)


@functools.lru_cache(maxsize=1)
def _pr_rc_table() -> np.ndarray:
    """(T, 12) int32 packed reset/const: bit 0 = comb reference lands on
    a segment-sync symbol, bit 1 = that symbol's level sign (+5)."""
    from atsc_tpu.ops.ntsc import _pr_reset_tables

    reset, const = _pr_reset_tables()          # (T, 12) each
    return (reset.astype(np.int32)
            | ((const > 0).astype(np.int32) << 1))


def _pad_batch(fn):
    """Round the batch up to a multiple of 32 channels (so B*12 tiles
    into 128 lanes exactly), run the kernel wrapper, slice the result.
    Padded channels carry zero levels/state — their trellises decode
    garbage that is simply dropped. Even at B=1 the 32x padded kernel
    beats the XLA scan ~4x (the scan's cost is sequential-step-bound,
    not lane-bound, at small batch)."""

    @functools.wraps(fn)
    def wrapped(levels, z2_prev, metrics, interpret=False):
        b = levels.shape[0]
        pad = (-b) % 32
        if pad == 0:
            return fn(levels, z2_prev, metrics, interpret)
        levels = jnp.pad(levels, ((0, pad), (0, 0), (0, 0)))
        z2_prev = jnp.pad(z2_prev, ((0, pad), (0, 0)))
        metrics = jnp.pad(metrics, ((0, pad), (0, 0), (0, 0)))
        by, z2, m = fn(levels, z2_prev, metrics, interpret)
        return by[:b], z2[:b], m[:b]

    return wrapped


@_pad_batch
def viterbi_pr_field_pallas(
    y: jnp.ndarray, z2_prev: jnp.ndarray, metrics: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused-kernel twin of ops.ntsc.viterbi_pr_decode_field (exact
    16-state PR MLSE, bit-identical; T % 24 == 0; batches not divisible
    by 32 are zero-padded — see _pad_batch).

    y: (B, 12, T) float32 combed observations; z2_prev: (B, 12) int32;
    metrics: (B, 12, 16) float32. Returns (bytes (B, 12, T//4) uint8,
    new z2_prev, new metrics)."""
    b, ne, t = y.shape
    assert (b * ne) % _LANES == 0 and t % _GROUP == 0, y.shape
    r = b * ne // _LANES
    obs = jnp.moveaxis(y, -1, 0).reshape(t, r, _LANES)
    rc_t = jnp.asarray(_pr_rc_table()[:t])                  # (T, 12)
    rc = jnp.broadcast_to(rc_t[:, None, :], (t, b, ne)).reshape(
        t, r, _LANES
    )
    m0 = jnp.moveaxis(metrics, -1, 0).reshape(16, r, _LANES)
    dec, mout = pr_acs_forward(obs, rc, m0, interpret=interpret)
    start = jnp.argmin(mout, axis=0).astype(jnp.int32)
    bits = pr_traceback(dec, start, interpret=interpret)
    z2p = z2_prev.astype(jnp.int32).reshape(r, _LANES)
    bytes_w, z2_last = pack_bits_to_bytes(bits, z2p)
    bytes_out = jnp.transpose(bytes_w.astype(jnp.uint8).reshape(t // 4, b, ne),
                              (1, 2, 0))
    new_z2 = z2_last.reshape(b, ne).astype(jnp.int32)
    new_metrics = jnp.transpose(mout.reshape(16, b, ne), (1, 2, 0))
    return bytes_out, new_z2, new_metrics


@_pad_batch
def viterbi_field_pallas(
    levels: jnp.ndarray, z2_prev: jnp.ndarray, metrics: jnp.ndarray,
    interpret: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused-kernel twin of ops.viterbi.viterbi_decode_field (exact MLSE,
    bit-identical output; T % 24 == 0; batches not divisible by 32 are
    zero-padded — see _pad_batch).

    levels: (B, 12, T) float32 soft levels; z2_prev: (B, 12) int32;
    metrics: (B, 12, 4) float32. Returns (bytes (B, 12, T//4) uint8,
    new z2_prev, new metrics)."""
    b, ne, t = levels.shape
    assert (b * ne) % _LANES == 0 and t % _GROUP == 0, levels.shape
    r = b * ne // _LANES
    inv = None
    if levels.dtype == jnp.int8:
        # quantized soft-level codes: the gather upstream and this
        # transpose moved int8 (4x less HBM traffic); dequant in-kernel
        from atsc_tpu.ops.quantize import SOFT_LEVEL_INV

        inv = float(SOFT_LEVEL_INV)
    obs = jnp.moveaxis(levels, -1, 0).reshape(t, r, _LANES)
    m0 = jnp.moveaxis(metrics, -1, 0).reshape(4, r, _LANES)
    dec, mout = acs_forward(obs, m0, interpret=interpret, inv_scale=inv)
    start = jnp.argmin(mout, axis=0).astype(jnp.int32)
    bits = traceback(dec, start, interpret=interpret)
    z2p = z2_prev.astype(jnp.int32).reshape(r, _LANES)
    bytes_w, z2_last = pack_bits_to_bytes(bits, z2p)
    bytes_out = jnp.transpose(bytes_w.astype(jnp.uint8).reshape(t // 4, b, ne),
                              (1, 2, 0))
    new_z2 = z2_last.reshape(b, ne).astype(jnp.int32)
    new_metrics = jnp.transpose(mout.reshape(4, b, ne), (1, 2, 0))
    return bytes_out, new_z2, new_metrics
