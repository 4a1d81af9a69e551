"""NTSC co-channel interference rejection: 12-symbol comb filter +
partial-response Viterbi decoding.

8VSB was co-designed with analog NTSC coexistence in mind: a comb filter
H(z) = 1 - z^-12 at the symbol rate puts spectral nulls every fs/12 =
897 kHz, landing near the NTSC visual, chroma and audio carriers of a
co-channel analog transmitter (A/53's receiver guidelines describe
exactly this comb; the reference implements no receiver at all). The comb
turns the 8-level signal into a 15-level partial-response one, and the
trellis code's structure keeps it ML-decodable with a modestly larger
state space.

The framework-specific insight that makes this TPU-friendly: because the
output commutator interleaves the 12 trellis encoders symbol-by-symbol,
the comb's 12-symbol delay is exactly ONE step in each encoder's own
stream — everywhere. Within a segment it is the same encoder's previous
data symbol; across segment boundaries the last 8 data symbols of the
previous segment belong to the right encoders (828 = 69*12 and
820 = 68*12 + 4 make the phases line up); across the field boundary the
field sync's 12 "reserved" symbols are *copies* of the previous field's
last 12 data symbols, which again belong to the right encoders. The only
exception is the 4 symbols per segment whose delayed reference lands on
the 4 known segment-sync symbols — those become per-step "reset"
branches against the known +-5 sync levels.

So the PR Viterbi is the plain per-encoder ACS with the combined state
(trellis state x previous symbol). Consistency (Z0 of the emitted symbol
equals the arrival state's D1 bit) cuts the product space 4 x 8 to 16
reachable states; every arrival state has one predecessor trellis state
and 4 predecessor symbol hypotheses -> a (B, 12, 16, 4) add-compare-
select per step, two lax.scans per field exactly like ops/viterbi.py.
The pilot bias cancels in the comb difference, and white noise power
doubles (the classic ~3 dB comb penalty) — the auto-detector weighs that
against the interference it removes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.ops.viterbi import _PRED0, _PRED1, pack_trellis_bytes

_NSYM = P.TRELLIS_SYMBOLS_PER_ENCODER   # 21,528
_N = P.SYMBOLS_PER_FIELD
_SEG = P.SYMBOLS_PER_SEGMENT            # 832
_BIG = 1e9
_COMB_DELAY = 12
_SYNC_LEVELS = np.array([5.0, -5.0, -5.0, 5.0], dtype=np.float32)


# -- comb filter ---------------------------------------------------------

def comb_field(levels: jnp.ndarray) -> jnp.ndarray:
    """(B, >=260416) soft levels -> (B, 260416) combed observations
    y[p] = lev[p] - lev[p-12]. The first 12 outputs are head-garbage but
    harmless: the first data symbol of a field sits at position 836 and
    references position 824 (a reserved-symbol slot inside the same
    field), so every gathered data observation is valid."""
    lev = levels[..., :_N]
    shifted = jnp.concatenate(
        [jnp.zeros_like(lev[..., :_COMB_DELAY]), lev[..., : -_COMB_DELAY]],
        axis=-1,
    )
    return lev - shifted


# -- per-step reset tables ------------------------------------------------

@functools.lru_cache(maxsize=1)
def _pr_reset_tables() -> tuple[np.ndarray, np.ndarray]:
    """(reset (21528, 12) bool, const (21528, 12) float32): per encoder-
    major symbol (k, e), whether its comb reference lands on a known
    segment-sync symbol, and that symbol's (pilot-free) level. Validates
    the every-delay-is-one-encoder-step structure by construction."""
    from atsc_tpu.ops.decode import _decommutate_src

    src = _decommutate_src().reshape(P.TRELLIS_ENCODERS, _NSYM)
    q = src - _COMB_DELAY                 # delayed reference position
    seg, off = np.divmod(q, _SEG)
    reset = (seg >= 1) & (off < 4)        # segment-sync slots
    const = np.where(reset, _SYNC_LEVELS[np.clip(off, 0, 3)], 0.0)
    # every non-reset reference must be the same encoder's previous
    # symbol (k >= 1) or a reserved-symbol copy of it (k = 0)
    prev_p = np.empty_like(src)
    prev_p[:, 0] = -1
    prev_p[:, 1:] = src[:, :-1]
    reserved = (seg == 0) & (off >= _SEG - P.RESERVED_SYMBOLS)
    ok = reset | (q == prev_p) | (reserved & (np.arange(_NSYM) == 0))
    assert ok.all(), "comb structure violated — commutator tables changed?"
    return (
        np.ascontiguousarray(reset.T),
        np.ascontiguousarray(const.T.astype(np.float32)),
    )


# -- 16-state PR Viterbi ---------------------------------------------------
#
# Combined state u = s*4 + h: s = trellis state 2*D1 + D2 AFTER consuming
# the symbol, h = (v >> 1) of the emitted symbol v (v's low bit Z0 equals
# s's low bit D1' by the code structure, so h's 2 bits (Z2, Z1) complete
# v). Arrival state u' fixes the branch bits: x1 = h'&1, z2 = h'>>1, so
# the predecessor trellis state is unique and only the predecessor's
# symbol hypothesis (4 options) is minimized over.

@functools.lru_cache(maxsize=1)
def _pr_tables() -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    u = np.arange(16)
    s2, h = u >> 2, u & 3
    x1 = h & 1
    v = 2 * h + (s2 & 1)
    lv = (2 * v - 7).astype(np.float32)                    # emitted level
    s_pred = np.where(x1 == 1, _PRED1[s2], _PRED0[s2]).astype(np.int32)
    pred_idx = (s_pred[:, None] * 4 + np.arange(4)).astype(np.int32)
    # predecessor symbol level per (u', hypothesis h_prev)
    prev_lev = (2 * (2 * np.arange(4)[None, :] + (s_pred[:, None] & 1)) - 7
                ).astype(np.float32)                       # (16, 4)
    return lv, s_pred, pred_idx, prev_lev


def init_pr_metrics(batch: int) -> jnp.ndarray:
    """(B, 12, 16) float32 cold-start metrics: the encoder starts in
    trellis state 0 having just 'emitted' symbol 0 (the reserved-symbol
    initialization, reference src/atsc/atsc.cpp:24-26) -> only u = 0."""
    m = jnp.full((batch, P.TRELLIS_ENCODERS, 16), _BIG, dtype=jnp.float32)
    return m.at[..., 0].set(0.0)


def _pr_acs_update(metrics: jnp.ndarray, xs):
    """One raw PR add-compare-select (no re-normalization).
    metrics (B, 12[, C], 16); xs = (y (B, 12[, C]), reset (12[, C],),
    const (12[, C],)) — broadcast-generic so the chunked driver can add
    a chunk axis."""
    y, reset, const = xs
    lv, s_pred, pred_idx, prev_lev = _pr_tables()
    # m_pred[..., u', h] = metrics[..., s_pred[u']*4 + h], built from 16
    # static row slices of the (4, 4)-factored metrics — tiny dynamic
    # gathers (jnp.take) serialize on TPU (see ops.viterbi._acs_update)
    mr = metrics.reshape(*metrics.shape[:-1], 4, 4)      # [s, h]
    m_pred = jnp.stack(
        [mr[..., int(s_pred[u]), :] for u in range(16)], axis=-2
    )                                                    # (B, 12[, C], 16, 4)
    # delayed-reference level: the predecessor-state symbol, or the known
    # segment-sync constant at reset steps (same for all 4 hypotheses)
    prev_term = jnp.where(
        reset[..., None, None], const[..., None, None],
        jnp.asarray(prev_lev),
    )                                                    # (12[, C], 16, 4)
    bm = (y[..., None, None] - jnp.asarray(lv)[:, None] + prev_term) ** 2
    cand = m_pred + bm
    h_prev = jnp.argmin(cand, axis=-1)
    new_m = jnp.min(cand, axis=-1)
    return new_m, h_prev.astype(jnp.int8)


def _pr_acs_step(metrics: jnp.ndarray, xs):
    """One PR add-compare-select step with per-step re-normalization."""
    new_m, dec = _pr_acs_update(metrics, xs)
    new_m = new_m - jnp.min(new_m, axis=-1, keepdims=True)
    return new_m, dec


def _pr_acs_scan(metrics: jnp.ndarray, xs, unroll: int):
    """Forward PR ACS with `unroll` steps per scan body (the same
    scan-step-overhead amortization as ops.viterbi._acs_scan)."""
    t = xs[0].shape[0]
    if unroll <= 1 or t % unroll:
        return jax.lax.scan(_pr_acs_step, metrics, xs)
    xs_u = tuple(x.reshape(t // unroll, unroll, *x.shape[1:]) for x in xs)

    def body(m, xk):
        decs = []
        for i in range(unroll):
            m, d = _pr_acs_update(m, tuple(x[i] for x in xk))
            decs.append(d)
        m = m - jnp.min(m, axis=-1, keepdims=True)
        return m, jnp.stack(decs)

    new_m, decs = jax.lax.scan(body, metrics, xs_u)
    return new_m, decs.reshape(t, *decs.shape[2:])


def _pr_traceback_step(state: jnp.ndarray, dec: jnp.ndarray):
    """state (B, 12) int32 combined state; dec (B, 12, 16) int8.

    Gather-free: the 16-wide dynamic row pick is a compare/select chain
    and s_pred[state] is computed arithmetically (s_pred[u] =
    _PRED0[u>>2] ^ (u&1), and _PRED0[s] = 2*(s&1) + (s>>1))."""
    h = state & 3
    x1 = h & 1
    z2 = h >> 1
    deci = dec.astype(jnp.int32)
    h_prev = deci[..., 0]
    for u in range(1, 16):
        h_prev = jnp.where(state == u, deci[..., u], h_prev)
    s2 = state >> 2
    pred_s = (2 * (s2 & 1) + (s2 >> 1)) ^ x1
    pred = pred_s * 4 + h_prev
    return pred, (x1, z2)


def viterbi_pr_bits(
    y: jnp.ndarray, metrics: jnp.ndarray, n_chunks: int = 1,
    warmup: int = 128, unroll: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """MLSE over one field of combed observations.

    y: (B, 12, 21528) float32 encoder-major comb outputs; metrics:
    (B, 12, 16) carried combined-state path metrics.
    Returns (x1, z2 (B, 12, 21528) int32, new metrics).
    unroll: ACS/traceback steps per scan body (ops.viterbi.UNROLL).
    n_chunks > 1: chunk-parallel near-MLSE (ops.viterbi.viterbi_bits).
    """
    from atsc_tpu.ops.viterbi import UNROLL, _traceback_scan

    if unroll is None:
        unroll = UNROLL
    reset, const = _pr_reset_tables()
    if n_chunks <= 1:
        obs_t = jnp.moveaxis(y, -1, 0)                     # (T, B, 12)
        xs = (obs_t, jnp.asarray(reset), jnp.asarray(const))
        new_metrics, decs = _pr_acs_scan(metrics, xs, unroll)
        start = jnp.argmin(new_metrics, axis=-1).astype(jnp.int32)
        x1_t, z2_t = _traceback_scan(start, decs, unroll,
                                     step=_pr_traceback_step)
        return (
            jnp.moveaxis(x1_t, 0, -1),
            jnp.moveaxis(z2_t, 0, -1),
            new_metrics,
        )
    from atsc_tpu.ops.viterbi import _chunked_mlse

    b = y.shape[0]
    m0 = jnp.full((b, P.TRELLIS_ENCODERS, n_chunks, 16), 0.0, jnp.float32)
    m0 = m0.at[:, :, 0, :].set(metrics)
    # per-step tables arrive as (C, 12); the step wants (12, C)
    step = lambda m, xs: _pr_acs_step(  # noqa: E731
        m, (xs[0], jnp.swapaxes(xs[1], 0, 1), jnp.swapaxes(xs[2], 0, 1))
    )
    (x1, z2), new_metrics = _chunked_mlse(
        step, _pr_traceback_step,
        (y, jnp.asarray(reset), jnp.asarray(const)),
        m0, n_chunks, warmup, _NSYM,
    )
    return x1, z2, new_metrics


def viterbi_pr_decode_field(
    y: jnp.ndarray, z2_prev: jnp.ndarray, metrics: jnp.ndarray,
    n_chunks: int = 1,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PR twin of ops.viterbi.viterbi_decode_field: combed observations
    in, trellis bytes out. Returns (bytes (B, 12, 5382) uint8, new
    z2_prev (B, 12) int32, new metrics (B, 12, 16))."""
    from atsc_tpu.ops.viterbi import _use_pallas_viterbi

    if n_chunks <= 1 and _use_pallas_viterbi(y):
        # fused Pallas 16-state ACS/traceback: bit-identical, measured
        # 15x over the unrolled XLA scan (112.8 -> 7.4 ms/field at B=64)
        from atsc_tpu.ops.pallas.viterbi_acs import viterbi_pr_field_pallas

        return viterbi_pr_field_pallas(y, z2_prev, metrics)
    x1, z2, new_metrics = viterbi_pr_bits(y, metrics, n_chunks)
    z2_shifted = jnp.concatenate([z2_prev[..., None], z2[..., :-1]], axis=-1)
    x2 = z2 ^ z2_shifted
    return pack_trellis_bytes(x2, x1), z2[..., -1], new_metrics


# -- interference detection -------------------------------------------------

def detect_ntsc(levels: np.ndarray, per_channel: bool = False):
    """Decide whether the comb path beats the plain path for this signal.

    Compares hard-slicer residual power on the plain 8-level field vs on
    the combed 15-level field: white noise doubles through the comb, so
    a clean/AWGN capture picks plain, while narrowband co-channel energy
    (which the comb nulls) inflates only the plain residual. levels:
    (B, >=260416) float32 soft levels of one field.

    Returns one bool over the whole batch by default; per_channel=True
    returns a (B,) bool array (the comb costs ~3 dB, so a mixed batch
    should not let one impaired channel decide for the clean ones — the
    receiver votes and warns on disagreement).
    """
    lev = np.atleast_2d(np.asarray(levels, np.float32))[..., :_N]
    r_plain = lev - P.PILOT_OFFSET
    r_plain = r_plain - np.clip(np.rint((r_plain + 7) / 2) * 2 - 7, -7, 7)
    y = lev[..., _COMB_DELAY:] - lev[..., : -_COMB_DELAY]
    r_comb = y - np.clip(np.rint(y / 2) * 2, -14, 14)
    votes = np.mean(r_comb**2, axis=-1) < np.mean(r_plain**2, axis=-1)
    return votes if per_channel else bool(
        np.mean(r_comb**2) < np.mean(r_plain**2)
    )
