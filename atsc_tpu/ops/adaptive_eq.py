"""Training-sequence adaptive equalizer: decode through unknown channels.

The ZF equalizer in models/receiver.py inverts this framework's (and the
reference's) *known* transmit chain — it assumes an ideal channel between
TX and capture. Real 8VSB receivers instead *train* their equalizer on
the known sync symbols every field (A/53's PN511/PN63 field sync exists
for exactly this). This module adds that capability: a widely-linear
least-squares equalizer estimated from the 2,068 known symbols per field
(820 field-sync + 312x4 segment-sync levels), tracking slow channel
drift with exponential forgetting. It absorbs any linear distortion the
capture path adds on top of the modulator — multipath echoes, analog
front-end ripple, complex gain/phase offset, DC bias — none of which the
fixed ZF inverse can handle. (No counterpart anywhere in the reference,
which is transmit-only.)

TPU-first formulation (no adaptive sample-serial LMS loop — that is a
CPU idiom XLA cannot pipeline):

1.  **Block recursive least squares on the MXU.** Per field, gather the
    training design matrix X (rows = [Re u, Im u] windows of T taps
    around each known symbol, plus a bias column; u = derotated
    baseband) and accumulate the normal equations
        R <- lam R + X^T X,   v <- lam v + X^T d
    as two batched matmuls. d is the known level sequence (parity-aware
    field-sync template + segment syncs). One small (D x D) solve per
    field yields the MMSE tap vector w = [p, q, bias].
2.  **Apply as banded matmuls.** The learned filter runs with the same
    blocked-FIR idiom as the transmit RRC (ops/rrc_filter.py) — batched
    (rows,128)x(128,128) MXU products, here with *traced per-channel*
    band matrices built by gathering the tap vector. Hard slicing is
    fused; only (B, 260416) int8 symbols leave the device.

Because every training window lies fully inside the field (the last
segment sync ends >800 samples before the field boundary), training
never reads the zero-filled stream edges — cold start and final-field
flush train on exactly the same footing as steady state.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.tables.sync import sync_templates

_N = P.SYMBOLS_PER_FIELD
_BLK = 128

EQ_HALF = 128                  # one-sided tap support K
EQ_TAPS = 2 * EQ_HALF + 1      # T = 257 taps per I/Q component
EQ_DIM = 2 * EQ_TAPS + 1       # D = 515 unknowns (p, q, bias)
WINDOW_MARGIN = 384            # required context per side of a field window


@functools.lru_cache(maxsize=1)
def _training_set() -> tuple[np.ndarray, np.ndarray]:
    """(positions (n,), targets (2, n) float32) — field-relative indices
    of the known (constant) symbols and their levels per field parity.
    Positions < EQ_HALF are dropped so every feature window stays inside
    [pos - K, pos + K] ⊂ [0, field_end - K)."""
    template, is_const = sync_templates()
    pos = np.nonzero(is_const[:_N])[0]
    pos = pos[pos >= EQ_HALF]
    return pos.astype(np.int32), template[:, pos].astype(np.float32)


def _strided_windows(u: jnp.ndarray, start: int, n: int, step: int,
                     t: int) -> jnp.ndarray:
    """windows[..., i, k] = u[..., start + step*i + k] for i < n, k < t,
    built from contiguous slices + reshapes — never a gather.

    XLA lowers `jnp.take` of sliding windows to an elementwise gather
    (~1 element/cycle on TPU — measured 10.7 ms for the (64, 1940, 257)
    training gather, the dominant cost of rls_update). The same windows
    are a regular structure: fold u into (rows, step) so consecutive
    window rows are consecutive folded rows, then stack the
    ceil(t/step) shifted row-slices and trim to t columns. Copies run
    at full HBM bandwidth.

    Every requested window must lie inside u: an out-of-range window
    would be ZERO-padded here, where the jnp.take formulation this
    replaced clamps indices — the assert keeps the difference moot.
    """
    assert 0 <= start and start + (n - 1) * step + t <= u.shape[-1], (
        start, n, step, t, u.shape)
    n_a = (t - 1) // step + 1
    rows = n + n_a - 1
    v = jax.lax.slice_in_dim(u, start, min(start + rows * step,
                                           u.shape[-1]), axis=-1)
    pad = rows * step - v.shape[-1]
    if pad > 0:
        v = jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, pad),))
    v2 = v.reshape(*u.shape[:-1], rows, step)
    w = jnp.stack([v2[..., a : a + n, :] for a in range(n_a)], axis=-2)
    return w.reshape(*u.shape[:-1], n, n_a * step)[..., :t]


@functools.lru_cache(maxsize=1)
def _training_window_plan() -> tuple[int, int, int, int, int, int] | None:
    """Slice plan for the training positions, or None if the sync
    template ever stops matching the expected shape (one contiguous
    field-sync run + equal-length segment-sync runs on a uniform
    stride, with the tap span fitting inside one stride): (run0_start,
    run0_len, seg_start, seg_stride, seg_len, n_seg_runs). Verified
    against _training_set() exactly."""
    pos, _ = _training_set()
    runs = np.split(pos, np.nonzero(np.diff(pos) > 1)[0] + 1)
    r0, rest = runs[0], runs[1:]
    if not (np.all(np.diff(r0) == 1) and rest
            and len({len(r) for r in rest}) == 1
            and all(np.all(np.diff(r) == 1) for r in rest)):
        return None
    starts = np.array([r[0] for r in rest])
    stride = np.diff(starts)
    if stride.size and not np.all(stride == stride[0]):
        return None
    plan = (int(r0[0]), len(r0), int(starts[0]),
            int(stride[0]) if stride.size else 0, len(rest[0]), len(rest))
    # the fold in _training_windows needs each run's window span to fit
    # inside one stride (rl - 1 + T <= stride); an oversized tap span
    # takes the gather fallback rather than an invalid fold
    if plan[4] - 1 + EQ_TAPS > plan[3]:
        return None
    # paranoia: reconstruct and compare
    a0, n0, s1, st, rl, nr = plan
    rebuilt = np.concatenate(
        [a0 + np.arange(n0)]
        + [s1 + st * s + np.arange(rl) for s in range(nr)])
    return plan if np.array_equal(rebuilt, pos) else None


def _training_windows(u: jnp.ndarray, margin: int) -> jnp.ndarray:
    """(B, W) derotated component -> (B, n_pos, T) feature windows for
    the sync training set, via the slice plan (gather fallback)."""
    plan = _training_window_plan()
    if plan is None:
        pos, _ = _training_set()
        idx = (jnp.asarray(pos)[:, None] + (margin - EQ_HALF)
               + jnp.arange(EQ_TAPS))
        return jnp.take(u, idx, axis=-1)
    a0, n0, s1, stride, rl, nr = plan
    fs = _strided_windows(u, a0 + margin - EQ_HALF, n0, 1, EQ_TAPS)
    # segment-sync runs: fold into (nr, stride) rows, then rl shifted
    # column slices of the per-run window span (rl - 1 + T <= stride)
    ncols = rl - 1 + EQ_TAPS
    assert ncols <= stride, (ncols, stride)
    base = s1 + margin - EQ_HALF
    v = jax.lax.slice_in_dim(u, base, min(base + nr * stride,
                                          u.shape[-1]), axis=-1)
    pad = nr * stride - v.shape[-1]
    if pad > 0:
        v = jnp.pad(v, ((0, 0),) * (v.ndim - 1) + ((0, pad),))
    v = v.reshape(*u.shape[:-1], nr, stride)[..., :ncols]
    seg = jnp.stack([v[..., j : j + EQ_TAPS] for j in range(rl)], axis=-2)
    seg = seg.reshape(*u.shape[:-1], nr * rl, EQ_TAPS)
    return jnp.concatenate([fs, seg], axis=-2)


def _derotate(win: jnp.ndarray, osc: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """win (B, 2, W) planar IQ, osc (2, W) planar oscillator ->
    (Re u, Im u) with u = win * conj(osc) / amplitude^2."""
    inv_p2 = np.float32(1.0 / (P.OSC_AMPLITUDE ** 2))
    wr, wi = win[:, 0], win[:, 1]
    cr, ci = osc[0], osc[1]
    return (wr * cr + wi * ci) * inv_p2, (wi * cr - wr * ci) * inv_p2


@functools.partial(jax.jit, static_argnames=("margin",))
def rls_update(
    r_mat: jnp.ndarray, v: jnp.ndarray, win: jnp.ndarray, osc: jnp.ndarray,
    targets: jnp.ndarray, lam: jnp.ndarray, *, margin: int = WINDOW_MARGIN,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One field's normal-equation accumulation.

    r_mat: (B, D, D); v: (B, D); win: (B, 2, W) planar IQ covering
    [field_start - margin, field_end + margin); osc: (2, W) matching
    oscillator span; targets: (n,) known levels for this field's parity.
    """
    ur, ui = _derotate(win, osc)
    # feature windows: row i = u[pos_i - K .. pos_i + K] (window-relative),
    # built from contiguous slices (_training_windows), never a gather
    xr = _training_windows(ur, margin)         # (B, n, T)
    xi = _training_windows(ui, margin)
    ones = jnp.ones((xr.shape[0], xr.shape[1], 1), xr.dtype)
    x = jnp.concatenate([xr, xi, ones], axis=-1)   # (B, n, D)
    hi = jax.lax.Precision.HIGHEST
    r_new = lam * r_mat + jnp.einsum("bnd,bne->bde", x, x, precision=hi)
    v_new = lam * v + jnp.einsum("bnd,bn->bd", x, targets[None, :], precision=hi)
    return r_new, v_new


def _banded_fir_batched(
    x: jnp.ndarray, taps: jnp.ndarray, n_out: int,
    precision: jax.lax.Precision = jax.lax.Precision.HIGHEST,
) -> jnp.ndarray:
    """Forward FIR out[b, i] = sum_k x[b, i+k] taps[b, k] with traced
    per-channel taps, as blocked MXU matmuls (the rrc_filter idiom with
    the band matrices gathered from the tap vector at trace time)."""
    n_taps = taps.shape[-1]
    n_bands = -(-(n_taps + _BLK - 1) // _BLK)
    nblk_out = -(-n_out // _BLK)
    nblk_in = nblk_out + n_bands - 1
    pad = nblk_in * _BLK - x.shape[-1]
    if pad > 0:
        x = jnp.pad(x, ((0, 0), (0, max(pad, 0))))
    a = x[:, : nblk_in * _BLK].reshape(x.shape[0], nblk_in, _BLK)
    m = np.arange(_BLK)[:, None]
    r = np.arange(_BLK)[None, :]
    out = 0.0
    for s in range(n_bands):
        k = s * _BLK + m - r
        valid = jnp.asarray((k >= 0) & (k < n_taps), jnp.float32)
        w = jnp.take(taps, jnp.asarray(np.clip(k, 0, n_taps - 1)), axis=-1) * valid
        out = out + jnp.einsum(
            "bnk,bkm->bnm", a[:, s : s + nblk_out], w, precision=precision
        )
    return out.reshape(x.shape[0], nblk_out * _BLK)[:, :n_out]


def _apply_taps(
    w: jnp.ndarray, win: jnp.ndarray, osc: jnp.ndarray, margin: int,
    soft: bool, apply_precision: str,
) -> jnp.ndarray:
    """Equalize one field with an already-solved tap vector (traced
    helper shared by solve_and_equalize and equalize_with_taps)."""
    p, q, bias = w[:, :EQ_TAPS], w[:, EQ_TAPS : 2 * EQ_TAPS], w[:, 2 * EQ_TAPS :]
    ur, ui = _derotate(win, osc)
    start = margin - EQ_HALF
    ur = jax.lax.slice_in_dim(ur, start, ur.shape[-1], axis=-1)
    ui = jax.lax.slice_in_dim(ui, start, ui.shape[-1], axis=-1)
    prec = {"highest": jax.lax.Precision.HIGHEST,
            "default": jax.lax.Precision.DEFAULT}[apply_precision]
    lev = (_banded_fir_batched(ur, p, _N, precision=prec)
           + _banded_fir_batched(ui, q, _N, precision=prec) + bias)
    if soft:
        return lev.astype(jnp.float32)
    from atsc_tpu.ops.slicer import slice_symbols

    return slice_symbols(lev)


def _solve_taps(r_mat: jnp.ndarray, v: jnp.ndarray,
                ridge: jnp.ndarray) -> jnp.ndarray:
    """Ridge-regularized normal-equation solve -> (B, D) tap vector.

    The feature Gram matrix is rank-deficient by construction (515
    unknowns, but every feature window is a linear image of only ~369
    underlying level samples), so the ridge is scaled *relative* to R's
    trace: large enough to dominate fp32 accumulation noise in the null
    space, small enough (1e-4 default) that the tap shrinkage is far
    below the 1.0 slicing margin.

    The solve is Cholesky, not LU: the ridged Gram is symmetric positive
    definite, so Cholesky is the right factorization — and the axon TPU
    runtime's batched LU kernel fault-crashes the worker at batch >= ~64
    when jitted (measured on v5e: jitted (64, 515, 515) linalg.solve
    kills the TPU worker process; cho_solve of the same system is fine).
    """
    eye = jnp.eye(EQ_DIM, dtype=r_mat.dtype)
    scale = jnp.trace(r_mat, axis1=-2, axis2=-1)[:, None, None] / EQ_DIM
    chol = jax.scipy.linalg.cholesky(r_mat + ridge * scale * eye, lower=True)
    return jax.scipy.linalg.cho_solve((chol, True), v[..., None])[..., 0]


@functools.partial(jax.jit, static_argnames=("margin", "soft", "apply_precision"))
def solve_and_equalize(
    r_mat: jnp.ndarray, v: jnp.ndarray, win: jnp.ndarray, osc: jnp.ndarray,
    ridge: jnp.ndarray, *, margin: int = WINDOW_MARGIN, soft: bool = False,
    apply_precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Solve the accumulated normal equations and equalize one field.

    Returns (symbols (B, 260416) int8 — or the un-sliced float32 soft
    levels when soft=True, for the Viterbi path — and taps (B, D), the
    solved [p, q, bias] vector, for introspection/tests/reuse by the
    retrain-cadence tier). Solve numerics: see _solve_taps.
    """
    w = _solve_taps(r_mat, v, ridge)
    return _apply_taps(w, win, osc, margin, soft, apply_precision), w


@functools.partial(jax.jit, static_argnames=("margin", "soft", "apply_precision"))
def equalize_with_taps(
    w: jnp.ndarray, win: jnp.ndarray, osc: jnp.ndarray, *,
    margin: int = WINDOW_MARGIN, soft: bool = False,
    apply_precision: str = "highest",
) -> jnp.ndarray:
    """Apply-only equalization with a cached tap vector — the
    retrain-cadence tier's fast path: no Gram accumulation, no
    Cholesky, just the two banded FIRs + bias (production receivers
    retrain far less than every field; the channel drifts on thermal
    timescales while the solve costs ~60% of the per-field budget)."""
    return _apply_taps(w, win, osc, margin, soft, apply_precision)


@functools.partial(jax.jit, static_argnames=("margin", "stride", "soft",
                                              "apply_precision"))
def dd_refine_and_equalize(
    r_mat: jnp.ndarray, v: jnp.ndarray, lev: jnp.ndarray, win: jnp.ndarray,
    osc: jnp.ndarray, ridge: jnp.ndarray, *, margin: int = WINDOW_MARGIN,
    stride: int = 8, soft: bool = False, apply_precision: str = "highest",
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Decision-directed second pass: re-solve the equalizer with the
    first pass's own decisions as training targets, then re-equalize.

    The sync-only solve fits D = 515 unknowns to 2,068 rows — its
    estimation noise (~(1 + D/rows) excess error) is what limits
    sensitivity near threshold. Here every `stride`-th symbol of the
    whole field becomes a training row (~32k rows at stride 8, 16x
    more), with the first pass's sliced level as target, weighted by
    decision reliability w = max(0, 1 - |residual|) so wrong decisions
    near the cell boundary contribute ~nothing. The refined normal
    equations ADD to the sync ones (the known symbols stay exact
    anchors); the result is used for this field only — the carried
    state stays sync-trained, so decision errors never feed back across
    fields.

    lev: (B, 260416) float32 first-pass soft levels. Other args/returns
    exactly as solve_and_equalize.
    """
    from atsc_tpu.ops.slicer import ideal_levels

    pilot = jnp.float32(P.PILOT_OFFSET)
    n_pos = len(range(EQ_HALF, _N - EQ_HALF, stride))
    lev_s = lev[..., EQ_HALF : _N - EQ_HALF : stride]     # strided slice
    ideal = ideal_levels(lev_s)
    w = jnp.maximum(1.0 - jnp.abs(lev_s - pilot - ideal), 0.0)  # reliability
    targets = ideal + pilot                               # (B, n)
    ur, ui = _derotate(win, osc)
    # windows at uniform-stride positions pos_i = K + stride*i: start in
    # the margined window is margin + stride*i — pure slice structure
    xr = _strided_windows(ur, margin, n_pos, stride, EQ_TAPS)  # (B, n, T)
    xi = _strided_windows(ui, margin, n_pos, stride, EQ_TAPS)
    ones = jnp.ones((xr.shape[0], xr.shape[1], 1), xr.dtype)
    x = jnp.concatenate([xr, xi, ones], axis=-1)          # (B, n, D)
    xw = x * w[..., None]
    hi = jax.lax.Precision.HIGHEST
    r2 = r_mat + jnp.einsum("bnd,bne->bde", xw, x, precision=hi)
    v2 = v + jnp.einsum("bnd,bn->bd", xw, targets, precision=hi)
    return solve_and_equalize(r2, v2, win, osc, ridge, margin=margin,
                              soft=soft, apply_precision=apply_precision)


class AdaptiveEqualizer:
    """Per-stream RLS equalizer state: feed one field window at a time.

    forgetting: weight on past fields' normal equations (1.0 = infinite
    memory — lowest noise for static channels; ~0.95 tracks slow drift;
    0.0 trains every field independently — each field's 2,068 sync
    symbols already overdetermine the ~369-dim feature span ~5x, so this
    is the fastest setting for abrupt channel changes).
    ridge: Tikhonov floor keeping the first solve well-posed (one field
    already gives ~1.9k training rows > D = 515 unknowns, so this only
    matters at noise extremes; scaled relative to trace(R)).
    apply_precision: matmul precision of the per-field *apply* FIRs
    ("highest" = 6-pass fp32; "default" = 1-pass bf16 — adds ~0.01-0.05
    level of arithmetic noise, negligible next to the channel estimation
    error on any capture that needs this equalizer). Training/solve
    always run at full precision (normal-equation conditioning).
    decision_directed: after the sync-trained solve, re-solve with every
    dd_stride-th decided symbol as a reliability-weighted training row
    (dd_refine_and_equalize) — ~16x more rows cuts the estimation noise
    that dominates near the decode threshold, at the cost of one extra
    gram + apply pass per field. Per-field only: the carried RLS state
    stays sync-trained, so decision errors never feed back.
    train_every: retrain cadence — train + solve on every k-th field
    and run the cached taps through the apply-only path
    (equalize_with_taps) on the fields between. 1 (default) trains
    every field; production receivers retrain far less often (the
    channel drifts on thermal/mechanical timescales, minutes not the
    24 ms field period), and the train+solve is ~60%% of the per-field
    device budget. A mistrained cadence shows up as RS corrections, so
    the cost of too-long a cadence is visible, not silent.
    """

    def __init__(self, batch: int = 1, forgetting: float = 1.0,
                 ridge: float = 1e-4, apply_precision: str = "highest",
                 decision_directed: bool = False, dd_stride: int = 8,
                 train_every: int = 1):
        if train_every < 1:
            raise ValueError(f"train_every must be >= 1, got {train_every}")
        self.batch = batch
        self._lam = jnp.float32(forgetting)
        self._ridge = jnp.float32(ridge)
        self._apply_precision = apply_precision
        self.decision_directed = decision_directed
        self.dd_stride = dd_stride
        self.train_every = train_every
        self._r = jnp.zeros((batch, EQ_DIM, EQ_DIM), jnp.float32)
        self._v = jnp.zeros((batch, EQ_DIM), jnp.float32)
        self._w_dev: jnp.ndarray | None = None   # last solved (B, D)
        self._fields_seen = 0

    @property
    def taps(self) -> np.ndarray | None:
        """Last solved (B, D) tap vector (fetched on access — keeping
        this lazy removed a per-field device sync from the composed
        receive loop; see PERF.md round 5)."""
        return None if self._w_dev is None else np.asarray(self._w_dev)

    def reset(self) -> None:
        """Forget all accumulated training — e.g. after a stream resync:
        the new epoch re-bases the derotation phase, so the learned tap
        basis no longer applies (one field's 2,068 sync symbols retrain
        it from scratch)."""
        self._r = jnp.zeros_like(self._r)
        self._v = jnp.zeros_like(self._v)
        self._w_dev = None
        self._fields_seen = 0

    def process_field(
        self, win_planar: np.ndarray, osc_planar: np.ndarray, parity: int,
        soft: bool = False,
    ) -> jnp.ndarray:
        """Train on this field's sync symbols (subject to the
        train_every cadence), then equalize it.

        win_planar: (B, 2, N + 2*margin) float32 planar IQ; osc_planar:
        (2, same) planar oscillator; parity: this field's sync parity
        (0 = even). Returns (B, 260416) int8 hard symbols, or float32
        soft levels when soft=True — as a DEVICE array (downstream
        decoder steps consume it in place; np.asarray() to fetch).
        """
        win = jnp.asarray(win_planar)
        osc = jnp.asarray(osc_planar)
        train = (self._w_dev is None
                 or self._fields_seen % self.train_every == 0)
        self._fields_seen += 1
        if not train:
            # cadence fast path: cached taps, no gram, no solve
            return equalize_with_taps(
                self._w_dev, win, osc, soft=soft,
                apply_precision=self._apply_precision,
            )
        _, targets = _training_set()
        self._r, self._v = rls_update(
            self._r, self._v, win, osc, jnp.asarray(targets[parity]),
            self._lam,
        )
        if self.decision_directed:
            # first pass only feeds decisions: 1-pass bf16 apply suffices
            lev, _ = solve_and_equalize(
                self._r, self._v, win, osc, self._ridge, soft=True,
                apply_precision="default",
            )
            sym, w = dd_refine_and_equalize(
                self._r, self._v, lev, win, osc, self._ridge,
                stride=self.dd_stride, soft=soft,
                apply_precision=self._apply_precision,
            )
        else:
            sym, w = solve_and_equalize(
                self._r, self._v, win, osc, self._ridge, soft=soft,
                apply_precision=self._apply_precision,
            )
        self._w_dev = w   # stays on device; .taps fetches on demand
        # return the DEVICE array: the receiver's decoder step consumes
        # it in place — materializing np here cost a pointless
        # (B, 260416) D2H + H2D round trip per field (measured ~800 ms
        # over the dev tunnel at B=64; a real PCIe pays ~2 ms for
        # nothing). Callers that want host data np.asarray() it.
        return sym
