"""Soft-decision Viterbi decoding of the 8VSB trellis code.

The hard-decision inverse in ops/decode.py reads the coded bits straight
off sliced symbols and discards the z0 redundancy bit — exact on clean
symbols but it forfeits the trellis code's coding gain entirely. This
module decodes the rate-2/3 trellis (reference src/atsc/trellis.h:10-51
semantics: Z2 = X2 precoded, Z1 = X1, Z0 = D1 with D1<-X1^D2, D2<-D1)
from *soft levels* with maximum-likelihood sequence estimation, buying
the ~3.5 dB the code was put there for. No reference counterpart (its
receive machinery is dead code, and encode-only anyway).

TPU-first shape: the classic sample-serial Viterbi becomes two
`lax.scan`s over the 21,528-symbol encoder streams with everything
vectorized over (batch, 12 encoders, 4 states):

* Forward ACS — the convolutional part has 4 states (D1, D2); the
  uncoded Z2 bit contributes 2 *parallel branches* per transition,
  resolved by a min over the two candidate levels (the standard 8VSB
  coset slicer inside the ACS). Per step: one (B, 12, 8) distance table
  to the constellation, two gathered adds, a min — pure VPU work.
  Decisions pack into 2 bits/state/step.
* Backward traceback — a reverse scan over the packed decisions
  recovering (X1, Z2) per symbol; X2 then falls out of the differential
  precoder inverse exactly as in the hard path.

Streaming state is O(1) per encoder: the 4 path metrics carry across
fields (the encoder never resets), so field k+1's ACS continues field
k's trellis; each field commits its own traceback from the best final
state (per-block truncation, tail unreliability absorbed by RS).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P

_NSYM = P.TRELLIS_SYMBOLS_PER_ENCODER   # 21,528
_NB = P.TRELLIS_BYTES_PER_ENCODER       # 5,382
_BIG = 1e9

# state s = 2*D1 + D2; transition on X1: Z0 = D1, s' = 2*(X1^D2) + D1.
# For new state s' = 2a + b: predecessor (D1=b, D2=a^X1) = 2b + (a^X1).
_PRED0 = np.array([0, 2, 1, 3], dtype=np.int32)   # X1 = 0
_PRED1 = np.array([1, 3, 0, 2], dtype=np.int32)   # X1 = 1
_B_OF = np.array([0, 1, 0, 1], dtype=np.int32)    # Z0 of every branch into s'


@functools.lru_cache(maxsize=1)
def _constellation() -> np.ndarray:
    """(8,) float32 level of symbol v = 4*Z2 + 2*Z1 + Z0 (pilot included)."""
    v = np.arange(8, dtype=np.float32)
    return v * 2 - 7 + np.float32(P.PILOT_OFFSET)


def init_metrics(batch: int) -> jnp.ndarray:
    """(B, 12, 4) float32 path metrics at a cold start: the encoder's
    delay registers are zeroed, so only state 0 is reachable."""
    m = jnp.full((batch, P.TRELLIS_ENCODERS, 4), _BIG, dtype=jnp.float32)
    return m.at[..., 0].set(0.0)


def _acs_update(metrics: jnp.ndarray, obs: jnp.ndarray):
    """One raw add-compare-select (no re-normalization).
    metrics (B, 12, 4); obs (B, 12).

    Written gather-free: the predecessor permutations _PRED0/_PRED1 are
    realized as a 2x2 minor transpose + flip, and the [0,1,0,1] branch
    broadcast as a concat — tiny dynamic gathers (fancy indexing /
    take_along_axis) lower to serialized gather ops on TPU and measured
    ~10 us per ACS step; the static relayouts are ~100x cheaper."""
    d = (obs[..., None] - jnp.asarray(_constellation())) ** 2  # (B,12,8)
    # parallel-branch (Z2) resolution: pmin[x1, b], zc[x1, b]
    lo = d[..., :4].reshape(*d.shape[:-1], 2, 2)     # Z2=0: [x1, b]
    hi = d[..., 4:].reshape(*d.shape[:-1], 2, 2)     # Z2=1
    zc = hi < lo
    pmin = jnp.minimum(hi, lo)                       # (B,12,2,2)
    p0 = pmin[..., 0, :]                             # (B,12,2)  X1=0
    p1 = pmin[..., 1, :]                             #           X1=1
    # metrics[..., _PRED0]: s'=2a+b <- pred 2b+a is the (2,2) transpose;
    # _PRED1 = _PRED0 ^ 1 is the same with the a-axis flipped
    mr = metrics.reshape(*metrics.shape[:-1], 2, 2)
    mt = jnp.swapaxes(mr, -1, -2)
    m_p0 = mt.reshape(metrics.shape)
    m_p1 = jnp.flip(mt, axis=-2).reshape(metrics.shape)
    m0 = m_p0 + jnp.concatenate([p0, p0], axis=-1)   # == p0[..., _B_OF]
    m1 = m_p1 + jnp.concatenate([p1, p1], axis=-1)
    x1 = m1 < m0
    new_m = jnp.minimum(m0, m1)
    zc0 = zc[..., 0, :]
    zc1 = zc[..., 1, :]
    z2 = jnp.where(x1, jnp.concatenate([zc1, zc1], axis=-1),
                   jnp.concatenate([zc0, zc0], axis=-1))
    dec = (x1.astype(jnp.int8) | (z2.astype(jnp.int8) << 1))
    return new_m, dec


def _acs_step(metrics: jnp.ndarray, obs: jnp.ndarray):
    """One add-compare-select step with per-step re-normalization."""
    new_m, dec = _acs_update(metrics, obs)
    new_m = new_m - jnp.min(new_m, axis=-1, keepdims=True)
    return new_m, dec


def _acs_scan(metrics: jnp.ndarray, obs_t: jnp.ndarray, unroll: int):
    """Forward ACS over obs_t (T, B, 12) with `unroll` trellis steps per
    scan body. A per-symbol `lax.scan` pays ~13 us of loop overhead per
    step for a few KB of VPU work (21,528 steps = the old 283 ms/field
    soft floor, PERF.md); unrolling amortizes that overhead over k real
    ACS updates. Metrics re-normalize once per body — branch metrics are
    O(100), so f32 headroom covers any practical unroll. Returns
    (new_metrics, decs (T, B, 12, 4) int8)."""
    t = obs_t.shape[0]
    if unroll <= 1 or t % unroll:
        return jax.lax.scan(_acs_step, metrics, obs_t)
    obs_u = obs_t.reshape(t // unroll, unroll, *obs_t.shape[1:])

    def body(m, obs_k):
        decs = []
        for i in range(unroll):
            m, d = _acs_update(m, obs_k[i])
            decs.append(d)
        m = m - jnp.min(m, axis=-1, keepdims=True)
        return m, jnp.stack(decs)

    new_m, decs = jax.lax.scan(body, metrics, obs_u)
    return new_m, decs.reshape(t, *decs.shape[2:])


def _traceback_step(state: jnp.ndarray, dec: jnp.ndarray):
    """state (B, 12) int32 current trellis state; dec (B, 12, 4) int8.

    The 4-wide dynamic row pick is a compare/select chain, not
    take_along_axis (same TPU tiny-gather trap as _acs_update)."""
    deci = dec.astype(jnp.int32)
    bits = deci[..., 0]
    for s in range(1, 4):
        bits = jnp.where(state == s, deci[..., s], bits)
    x1 = bits & 1
    z2 = (bits >> 1) & 1
    pred = 2 * (state & 1) + ((state >> 1) ^ x1)
    return pred, (x1, z2)


def _traceback_scan(start: jnp.ndarray, decs: jnp.ndarray, unroll: int,
                    step=_traceback_step):
    """Reverse traceback over decs (T, B, 12, S), `unroll` steps per
    scan body (same per-step-overhead amortization as _acs_scan).
    `step` is the per-symbol traceback (4-state or the 16-state PR one).
    Returns (x1 (T, B, 12), z2 (T, B, 12))."""
    t = decs.shape[0]
    if unroll <= 1 or t % unroll:
        _, bits = jax.lax.scan(step, start, decs, reverse=True)
        return bits
    decs_u = decs.reshape(t // unroll, unroll, *decs.shape[1:])

    def body(state, dec_k):
        outs = []
        for i in range(unroll - 1, -1, -1):
            state, bits = step(state, dec_k[i])
            outs.append(bits)
        outs = outs[::-1]                      # forward order in-block
        return state, (jnp.stack([o[0] for o in outs]),
                       jnp.stack([o[1] for o in outs]))

    _, (x1, z2) = jax.lax.scan(body, start, decs_u, reverse=True)
    return (x1.reshape(t, *x1.shape[2:]), z2.reshape(t, *z2.shape[2:]))


def _chunk_plan(t: int, n_chunks: int, warmup: int):
    """Static chunking layout: n_chunks equal windows of length
    L + 2*warmup, clamped inside [0, t) (so the first window has no left
    warmup and the last has a doubled one), plus the per-chunk offset of
    the kept L-symbol region inside its window."""
    if t % n_chunks:
        raise ValueError(f"{n_chunks} chunks must divide {t}")
    length = t // n_chunks
    w = length + 2 * warmup
    if w > t:
        raise ValueError("warmup too large for this chunk count")
    starts = np.clip(np.arange(n_chunks) * length - warmup, 0, t - w)
    offs = np.arange(n_chunks) * length - starts
    return length, w, starts, offs


def _chunked_mlse(step, traceback, obs_xs, metrics,
                  n_chunks: int, warmup: int, t: int):
    """Shared chunked-MLSE driver: windows the per-step scan inputs,
    runs ACS + traceback vectorized over the chunk axis, and re-
    assembles the kept regions.

    obs_xs: tuple of per-step arrays; element 0 is the (B, 12, T)
    observations (windowed over batch dims), the rest are (T, ...) step
    tables (windowed over the leading axis). Returns (bits tuple, new
    metrics from the last chunk's exact tail).
    """
    length, w, starts, offs = _chunk_plan(t, n_chunks, warmup)
    idx = jnp.asarray((starts[:, None] + np.arange(w)).astype(np.int32))
    obs = jnp.take(obs_xs[0], idx, axis=-1)          # (B, 12, C, W)
    xs = (jnp.moveaxis(obs, -1, 0),)                 # (W, B, 12, C)
    for extra in obs_xs[1:]:                         # (T, ...) tables
        win = jnp.take(extra, idx, axis=0)           # (C, W, ...)
        xs += (jnp.moveaxis(win, 1, 0),)             # (W, C, ...)
    final, decs = jax.lax.scan(step, metrics, xs)
    start = jnp.argmin(final, axis=-1).astype(jnp.int32)
    _, bits_t = jax.lax.scan(traceback, start, decs, reverse=True)
    out = []
    for bt in bits_t:
        b = jnp.moveaxis(bt, 0, -1)                  # (B, 12, C, W)
        out.append(jnp.concatenate(
            [b[:, :, c, offs[c] : offs[c] + length]
             for c in range(n_chunks)], axis=-1,
        ))
    return tuple(out), final[:, :, -1, :]


#: default ACS/traceback steps per scan body — measured sweet spot on
#: the v5e (scan-step overhead amortization; see PERF.md round-4 notes).
#: A "lane-major" (4, B*12) re-layout of the whole scan was tried and
#: REJECTED (PERF.md round-4 log): slower at every batch and OOM at
#: B=512 — the entry/exit transposes force pathological downstream
#: layouts, while XLA already lays the batch-major scan out well.
UNROLL = 24


def viterbi_bits(
    levels: jnp.ndarray, metrics: jnp.ndarray, n_chunks: int = 1,
    warmup: int = 128, unroll: int = UNROLL,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MLSE over one field of soft levels.

    levels: (B, 12, 21528) float32 encoder-major soft levels (pilot
    included); metrics: (B, 12, 4) carried path metrics.
    Returns (x1 (B, 12, 21528) int32, z2 (B, 12, 21528) int32,
    new metrics (B, 12, 4)).

    unroll: ACS/traceback steps per scan body (exact MLSE either way —
    only the scan-loop overhead changes; see _acs_scan).

    n_chunks > 1 trades exact MLSE for ~n_chunks-times less sequential
    scan depth (chunks decode independently, vectorized over a chunk
    axis, each warmed up on `warmup` symbols of left context — ~4x the
    survivor-merge depth — before its kept region). Chunk 0 keeps the
    carried metrics, so the field head and the cross-field state stay
    exact; interior chunk seams converge to the MLSE path within the
    warmup whp, and RS absorbs the rare disagreement. With the unrolled
    scan the exact path is fast enough that chunking is a latency lever
    for tiny batches, not a throughput one.
    """
    if n_chunks <= 1:
        obs_t = jnp.moveaxis(levels, -1, 0)          # (T, B, 12)
        new_metrics, decs = _acs_scan(metrics, obs_t, unroll)
        start = jnp.argmin(new_metrics, axis=-1).astype(jnp.int32)
        x1_t, z2_t = _traceback_scan(start, decs, unroll)
        return (
            jnp.moveaxis(x1_t, 0, -1),
            jnp.moveaxis(z2_t, 0, -1),
            new_metrics,
        )
    b = levels.shape[0]
    m0 = jnp.zeros((b, P.TRELLIS_ENCODERS, n_chunks, 4), jnp.float32)
    m0 = m0.at[:, :, 0, :].set(metrics)              # flat init elsewhere
    (x1, z2), new_metrics = _chunked_mlse(
        lambda m, xs: _acs_step(m, xs[0]), _traceback_step,
        (levels,), m0, n_chunks, warmup, _NSYM,
    )
    return x1, z2, new_metrics


def pack_trellis_bytes(x2: jnp.ndarray, x1: jnp.ndarray) -> jnp.ndarray:
    """(B, 12, 21528) input bit-pair planes -> (B, 12, 5382) uint8 bytes
    (MSB-first pairs: pair p occupies bits (7-2p, 6-2p))."""
    b = x2.shape[0]
    x2p = x2.reshape(b, P.TRELLIS_ENCODERS, _NB, 4)
    x1p = x1.reshape(b, P.TRELLIS_ENCODERS, _NB, 4)
    weights2 = jnp.asarray([128, 32, 8, 2], dtype=jnp.int32)
    weights1 = jnp.asarray([64, 16, 4, 1], dtype=jnp.int32)
    return jnp.sum(x2p * weights2 + x1p * weights1, axis=-1).astype(jnp.uint8)


def _use_pallas_viterbi(levels: jnp.ndarray) -> bool:
    """The fused Pallas ACS/traceback kernel (ops/pallas/viterbi_acs.py)
    runs on real TPU backends; measured 5x over the unrolled XLA scan
    (PERF.md round 4: 35.5 -> 7.0 ms/field at B=256), bit-identical
    output. Batches that do not tile into 128 lanes are zero-padded to
    the next multiple of 32 channels inside the kernel wrapper (a padded
    B=1 CLI decode still beats the XLA scan ~4x).
    Override with ATSC_TPU_FUSED_VITERBI=0/1 (forcing 1 on a non-TPU
    backend fails loudly at lowering — the kernels are Mosaic-only)."""
    import os

    t = levels.shape[-1]
    shapes_ok = t % UNROLL == 0
    env = os.environ.get("ATSC_TPU_FUSED_VITERBI")
    if env is not None:
        return env not in ("0", "false", "") and shapes_ok
    # "tpu" exactly: the kernels are Mosaic-lowered (pltpu scratch) —
    # on gpu/other plugin backends the XLA scan path is the right one
    return shapes_ok and jax.default_backend() == "tpu"


def viterbi_decode_field(
    levels: jnp.ndarray, z2_prev: jnp.ndarray, metrics: jnp.ndarray,
    n_chunks: int = 1, unroll: int = UNROLL,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Soft-decision twin of ops.decode.trellis_decode_field.

    levels: (B, 12, 21528) float32 soft levels; z2_prev: (B, 12) int32
    differential-precoder state; metrics: (B, 12, 4) carried path
    metrics. Returns (bytes (B, 12, 5382) uint8, new z2_prev, new
    metrics). n_chunks > 1: chunk-parallel near-MLSE (see viterbi_bits).
    """
    if n_chunks <= 1 and _use_pallas_viterbi(levels):
        from atsc_tpu.ops.pallas.viterbi_acs import viterbi_field_pallas

        return viterbi_field_pallas(levels, z2_prev, metrics)
    if levels.dtype == jnp.int8:
        # quantized soft-level codes: dequantize with the same f32
        # multiply the Pallas kernel uses (bit-identical tiers)
        from atsc_tpu.ops.quantize import SOFT_LEVEL_INV

        levels = levels.astype(jnp.float32) * jnp.float32(SOFT_LEVEL_INV)
    x1, z2, new_metrics = viterbi_bits(levels, metrics, n_chunks,
                                       unroll=unroll)
    z2_shifted = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = z2 ^ z2_shifted
    return pack_trellis_bytes(x2, x1), z2[..., -1], new_metrics
