"""FDM multiplexer: B encoded 8VSB channels -> one wideband multiplex.

A broadcast headend drives one wideband DAC/SDR with many 6-MHz channels
at once. This module synthesizes that multiplex on-device from the
encoder's per-channel baseband outputs: each channel is rationally
resampled from the symbol rate to the multiplex rate, shifted to its
6-MHz slot, and summed. (No counterpart in the reference, which emits
one channel at its own symbol rate.)

The ATSC numerology makes this exact: fs = 4.5 MHz * 684/286, so

    fs * 286/513 = 6 MHz  (exactly)

and a multiplex of B slots at R = B * 6 MHz is the rational resampling
ratio p/q = 286*B/513 — every 513 input samples produce exactly 286*B
output samples, no fractional-phase state. TPU-first shape:

* Resampling is one banded MXU matmul per 513-sample input block:
  out_block = window(513 + 2H) @ W, W[i, m] = kaiser_sinc(m*q/p + H - i)
  — the transmit RRC's blocked-FIR idiom with a stride. One shared W for
  all slots (they share the ratio).
* The slot mixer e^{j*2*pi*(2k-B+1)/(2B)*m} has period 2B samples, and
  every block's 286*B output length is a multiple of 2B — so mixing is
  an elementwise multiply by one tiny tiled table, with phase continuity
  across blocks and steps for free (no carried phasor).
* Everything is planar float32 (the axon TPU platform has no complex
  dtype); the mixer is the usual 4-multiply planar rotation, summed over
  slots.

Slots are laid out symmetrically around DC: slot k of B sits at
(k - (B-1)/2) * 6 MHz; tune the SDR to the center of the desired band.
The 8VSB occupied bandwidth is (1+alpha)*fs/2 = 6.0019 MHz — 0.03% wider
than the slot — so critical 6-MHz packing folds a sliver of the RRC tail
(< -50 dBc) onto the neighbor's band edge, same as adjacent channels on
a real 6-MHz raster; the round-trip test decodes through it exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P

RESAMPLE_UP = 286           # output samples per slot per input block...
RESAMPLE_DOWN = 513         # ...of this many input samples (exact 6 MHz)
SLOT_HZ = 6_000_000.0
_HALO = 16                  # one-sided resampler support (input samples)


@functools.lru_cache(maxsize=8)
def _resample_matrix(n_slots: int) -> np.ndarray:
    """(513 + 2*HALO, 286*n_slots) float32 banded interpolation matrix
    for the rational fs -> n_slots*6 MHz resampler (Kaiser(10)-windowed
    sinc at the input rate; pure interpolation, p/q > 1)."""
    p = RESAMPLE_UP * n_slots
    q = RESAMPLE_DOWN
    m = np.arange(p, dtype=np.float64)
    pos = m * q / p + _HALO            # input position of output m
    i = np.arange(q + 2 * _HALO, dtype=np.float64)[:, None]
    t = pos[None, :] - i               # offset in input samples
    x = np.clip(t / (_HALO + 1), -1.0, 1.0)
    w = np.sinc(t) * np.i0(10.0 * np.sqrt(1.0 - x * x)) / np.i0(10.0)
    w[np.abs(t) > _HALO + 1] = 0.0
    # unity DC gain per output phase
    w /= w.sum(axis=0, keepdims=True)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mixer_tables(n_slots: int) -> tuple[np.ndarray, np.ndarray]:
    """((B, 2B) cos, (B, 2B) sin) slot-mixer tables: slot k's carrier
    e^{j*2*pi*(2k-B+1)/(2B)*m} sampled over its 2B-sample period."""
    b = n_slots
    k = np.arange(b)[:, None]
    m = np.arange(2 * b)[None, :]
    ph = 2 * np.pi * (2 * k - b + 1) / (2 * b) * m
    return np.cos(ph).astype(np.float32), np.sin(ph).astype(np.float32)


def mux_blocks(iq_planar: jnp.ndarray) -> jnp.ndarray:
    """(B, 2, n_in + 2*HALO) planar channel IQ (n_in a multiple of 513,
    with HALO context samples on each side) -> (2, n_in*286*B/513)
    planar multiplex at B*6 MHz.

    The input must be block-aligned to the stream: sample HALO of the
    last axis is stream sample `blocks_consumed * 513` of every channel
    (FdmMuxer handles the carry); output sample 0 is then multiplex
    sample `blocks_consumed * 286*B`, keeping the 2B-periodic mixer
    aligned with no carried phase.
    """
    b, _, n_win = iq_planar.shape
    q, halo = RESAMPLE_DOWN, _HALO
    n_in = n_win - 2 * halo
    n_blk = n_in // q
    w = jnp.asarray(_resample_matrix(b))           # (q+2H, 286*B)
    idx = (np.arange(n_blk)[:, None] * q
           + np.arange(q + 2 * halo)[None, :]).astype(np.int32)
    win = jnp.take(iq_planar, jnp.asarray(idx), axis=-1)  # (B,2,n_blk,q+2H)
    res = jnp.einsum("bcnk,km->bcnm", win, w,
                     precision=jax.lax.Precision.HIGHEST)
    res = res.reshape(b, 2, n_blk * RESAMPLE_UP * b)      # (B, 2, M)
    cos_t, sin_t = _mixer_tables(b)
    reps = res.shape[-1] // (2 * b)
    cos = jnp.tile(jnp.asarray(cos_t), (1, reps))         # (B, M)
    sin = jnp.tile(jnp.asarray(sin_t), (1, reps))
    out_re = jnp.sum(res[:, 0] * cos - res[:, 1] * sin, axis=0)
    out_im = jnp.sum(res[:, 0] * sin + res[:, 1] * cos, axis=0)
    return jnp.stack([out_re, out_im])


class FdmMuxer:
    """Streaming multiplexer: push per-channel planar IQ, collect the
    wideband multiplex.

    n_slots: channel count B; slot k sits at (k - (B-1)/2) * 6 MHz.
    push() accepts (B, 2, n) float32 planar IQ chunks (e.g. the
    encoder's per-field output, valid samples only) and returns the
    newly available (2, m) multiplex samples at B*6 MHz; a 513-sample
    input-block remainder plus the resampler halo carry across pushes
    (flush() zero-fills the tail).
    """

    def __init__(self, n_slots: int):
        self.n_slots = n_slots
        self.rate_hz = n_slots * SLOT_HZ
        self._carry = np.zeros((n_slots, 2, _HALO), np.float32)
        self._step = jax.jit(mux_blocks)

    def _run(self, buf: np.ndarray) -> np.ndarray:
        """buf: (B, 2, 2*HALO + k*513 + r). Consumes the k whole blocks,
        keeps the remainder (+ halo) as the next carry."""
        q, halo = RESAMPLE_DOWN, _HALO
        avail = buf.shape[-1] - 2 * halo
        n_blk = avail // q
        if n_blk <= 0:
            self._carry = buf
            return np.zeros((2, 0), np.float32)
        used = n_blk * q
        out = np.asarray(self._step(
            np.ascontiguousarray(buf[..., : used + 2 * halo])
        ))
        self._carry = buf[..., used:]
        return out

    def push(self, iq_planar: np.ndarray) -> np.ndarray:
        iq_planar = np.asarray(iq_planar, np.float32)
        if iq_planar.shape[0] != self.n_slots or iq_planar.ndim != 3:
            raise ValueError(
                f"want ({self.n_slots}, 2, n) planar IQ, got "
                f"{iq_planar.shape}"
            )
        return self._run(np.concatenate([self._carry, iq_planar], axis=-1))

    def get_state(self) -> np.ndarray:
        """The complete resumable state: the carried halo + remainder
        samples (the mixer/resampler are block-aligned and stateless)."""
        return self._carry.copy()

    def set_state(self, carry: np.ndarray) -> None:
        carry = np.asarray(carry, np.float32)
        if carry.ndim != 3 or carry.shape[:2] != (self.n_slots, 2):
            raise ValueError(
                f"want ({self.n_slots}, 2, n) carry, got {carry.shape}"
            )
        self._carry = carry

    def flush(self) -> np.ndarray:
        """End of stream: zero-fill the trailing partial block (plus the
        final halo) and emit everything still buffered."""
        q, halo = RESAMPLE_DOWN, _HALO
        # carry layout: [halo context | s un-consumed stream samples]
        s = self._carry.shape[-1] - halo
        if s <= 0:
            self._carry = np.zeros((self.n_slots, 2, halo), np.float32)
            return np.zeros((2, 0), np.float32)
        pad = (-s) % q + halo
        out = self._run(np.concatenate(
            [self._carry, np.zeros((self.n_slots, 2, pad), np.float32)],
            axis=-1,
        ))
        self._carry = np.zeros((self.n_slots, 2, halo), np.float32)
        return out


# -- device-side demultiplexer ------------------------------------------

@functools.lru_cache(maxsize=8)
def _demux_matrix(n_slots: int) -> np.ndarray:
    """(286*B + 2*H2, 513) float32 banded filter-and-resample matrix for
    the multiplex -> per-slot baseband direction: anti-alias low-pass
    (Kaiser(10) sinc, 3.1 MHz cutoff — kills the 6-MHz neighbors) and
    R -> fs interpolation in one matmul per 286*B-sample input block."""
    p_in = RESAMPLE_UP * n_slots       # input samples per block (at R)
    q_out = RESAMPLE_DOWN              # output samples per block (at fs)
    rate = n_slots * SLOT_HZ
    halo = _demux_halo(n_slots)
    m = np.arange(q_out, dtype=np.float64)
    pos = m * p_in / q_out + halo      # input position of output m
    i = np.arange(p_in + 2 * halo, dtype=np.float64)[:, None]
    t = pos[None, :] - i
    c = 2 * 3.1e6 / rate               # normalized low-pass cutoff
    x = np.clip(t / (halo + 1), -1.0, 1.0)
    w = c * np.sinc(c * t) * np.i0(10.0 * np.sqrt(1.0 - x * x)) / np.i0(10.0)
    w[np.abs(t) > halo + 1] = 0.0
    w /= w.sum(axis=0, keepdims=True)  # unity DC gain per phase
    return w.astype(np.float32)


def _demux_halo(n_slots: int) -> int:
    """One-sided demux filter support in multiplex samples: the 3.1-MHz
    low-pass needs length scaling with the rate for a fixed transition."""
    return 12 * n_slots + 4


def demux_blocks(mux_planar: jnp.ndarray, n_slots: int) -> jnp.ndarray:
    """(2, n_in + 2*halo) planar multiplex (n_in a multiple of 286*B,
    with halo context on each side) -> (B, 2, n_in*513/(286*B)) planar
    per-slot baseband at fs.

    Same alignment contract as mux_blocks: input sample `halo` is
    multiplex stream sample blocks_consumed*286*B, so the period-2B
    mixdown table stays phase-aligned with no carried state.
    """
    b = n_slots
    p_in = RESAMPLE_UP * b
    halo = _demux_halo(b)
    n_in = mux_planar.shape[-1] - 2 * halo
    n_blk = n_in // p_in
    # mix every slot down to DC: conj of the mux mixer, tiled to cover
    # the window (the halo shifts the table start by -halo mod 2B)
    cos_t, sin_t = _mixer_tables(b)                       # (B, 2B)
    n_win = mux_planar.shape[-1]
    reps = -(-(n_win + 2 * b) // (2 * b))
    shift = (-halo) % (2 * b)
    cos = jnp.tile(jnp.asarray(cos_t), (1, reps + 1))[
        :, shift : shift + n_win]                         # (B, n_win)
    sin = jnp.tile(jnp.asarray(sin_t), (1, reps + 1))[:, shift : shift + n_win]
    xr, xi = mux_planar[0], mux_planar[1]
    dr = xr[None] * cos + xi[None] * sin                  # x * conj(mix)
    di = xi[None] * cos - xr[None] * sin                  # (B, n_win)
    w = jnp.asarray(_demux_matrix(b))
    idx = (np.arange(n_blk)[:, None] * p_in
           + np.arange(p_in + 2 * halo)[None, :]).astype(np.int32)
    wr = jnp.take(dr, jnp.asarray(idx), axis=-1)          # (B, n_blk, p+2H)
    wi = jnp.take(di, jnp.asarray(idx), axis=-1)
    out_r = jnp.einsum("bnk,km->bnm", wr, w)              # (B, n_blk, 513)
    out_i = jnp.einsum("bnk,km->bnm", wi, w)
    out = jnp.stack([out_r, out_i], axis=1)               # (B, 2, n_blk, 513)
    return out.reshape(b, 2, n_blk * RESAMPLE_DOWN)


class FdmDemuxer:
    """Streaming inverse of FdmMuxer: push wideband multiplex samples at
    B*6 MHz, collect per-slot complex basebands at the symbol rate —
    ready for IqReceiver(batch=B, backend="adaptive") (the demux filter
    is a linear channel the training absorbs).
    """

    def __init__(self, n_slots: int):
        self.n_slots = n_slots
        self.rate_hz = n_slots * SLOT_HZ  # the multiplex sample rate
        halo = _demux_halo(n_slots)
        self._carry = np.zeros((2, halo), np.float32)
        self._step = jax.jit(
            functools.partial(demux_blocks, n_slots=n_slots)
        )

    def push(self, mux_planar: np.ndarray) -> np.ndarray:
        """mux_planar: (2, n) planar float32 (or (n,) complex) multiplex
        samples. Returns (B, m) complex64 baseband (possibly m = 0)."""
        mux_planar = np.asarray(mux_planar)
        if mux_planar.ndim == 1:
            mux_planar = np.stack(
                [mux_planar.real.astype(np.float32),
                 mux_planar.imag.astype(np.float32)]
            )
        buf = np.concatenate([self._carry, mux_planar.astype(np.float32)],
                             axis=-1)
        p_in = RESAMPLE_UP * self.n_slots
        halo = _demux_halo(self.n_slots)
        n_blk = (buf.shape[-1] - 2 * halo) // p_in
        if n_blk <= 0:
            self._carry = buf
            return np.zeros((self.n_slots, 0), np.complex64)
        used = n_blk * p_in
        out = np.asarray(self._step(
            np.ascontiguousarray(buf[..., : used + 2 * halo])
        ))
        self._carry = buf[..., used:]
        return (out[:, 0] + 1j * out[:, 1]).astype(np.complex64)

    def get_state(self) -> np.ndarray:
        """The complete resumable state: the carried halo + remainder
        samples (mixdown/resampler are block-aligned and stateless)."""
        return self._carry.copy()

    def set_state(self, carry: np.ndarray) -> None:
        carry = np.asarray(carry, np.float32)
        if carry.ndim != 2 or carry.shape[0] != 2:
            raise ValueError(f"want (2, n) carry, got {carry.shape}")
        self._carry = carry

    def flush(self) -> np.ndarray:
        """End of stream: zero-fill the trailing partial block + halo."""
        p_in = RESAMPLE_UP * self.n_slots
        halo = _demux_halo(self.n_slots)
        s = self._carry.shape[-1] - halo
        if s <= 0:
            self._carry = np.zeros((2, halo), np.float32)
            return np.zeros((self.n_slots, 0), np.complex64)
        pad = (-s) % p_in + halo
        out = self.push(np.zeros((2, pad), np.float32))
        self._carry = np.zeros((2, halo), np.float32)
        return out


def demux_slot(mux: np.ndarray, slot: int, n_slots: int) -> np.ndarray:
    """Extract one channel from a multiplex back to complex baseband at
    the symbol rate (host-side NumPy; the verification/monitoring
    inverse of FdmMuxer — the resulting linear distortion is absorbed
    by the receiver's adaptive equalizer).

    mux: (2, M) planar or (M,) complex multiplex at n_slots*6 MHz.
    Returns (m,) complex64 at fs = 10.762238 MHz.
    """
    if mux.ndim == 2:
        x = mux[0].astype(np.complex128) + 1j * mux[1]
    else:
        x = np.asarray(mux, np.complex128)
    b = n_slots
    m = np.arange(x.size)
    # mix the slot to DC (the mixer's exact rational frequency)
    x = x * np.exp(-2j * np.pi * (2 * slot - b + 1) / (2 * b) * m)
    if b > 1:
        # anti-alias low-pass before decimation: Kaiser sinc at the slot
        # bandwidth (cutoff 3.1 MHz of R/2 = b*3 MHz)
        n_taps = 24 * b + 1
        t = np.arange(n_taps) - n_taps // 2
        cut = 3.1e6 / (b * SLOT_HZ / 2)      # normalized to Nyquist
        h = np.sinc(cut * t) * np.kaiser(n_taps, 10.0) * cut
        x = np.convolve(x, h)[n_taps // 2 : n_taps // 2 + x.size]
    # R -> fs: output sample n sits at input position n * R/fs =
    # n * 286*b/513; reuse the receiver's polyphase interpolator (the
    # low-pass above already limited the band, so sampling is safe)
    from atsc_tpu.models.receiver import resample_stream

    return resample_stream(x[None], (RESAMPLE_UP * b) / RESAMPLE_DOWN)[0]
