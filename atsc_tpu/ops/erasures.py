"""Burst/impulse-noise detection for erasure-assisted RS decoding.

Impulse noise (A/74's canonical 8VSB impairment — gated bursts of strong
wideband noise) corrupts a contiguous run of received symbols. The
convolutional interleaver spreads such a run thinly over many RS
codewords, and when the receiver can point at the affected bytes, each
costs RS half of what an unknown-position error costs (2*errors +
erasures <= 20): flagging a burst doubles the correctable burst length.

Detection is slicer-residual based: within a burst the equalized levels
sit far from the 8VSB constellation, so the windowed mean of
|level - nearest_level| rises well above the stream's clean-air baseline
(strong impulses also drive levels outside [-7, +7], unbounded residual
after clipping). Flags are dilated by one window to cover burst edges.

No counterpart in the reference (TX-only, and its RS decoder is dead
code — src/atsc/reed_solomon.h:41-190).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P


def slicer_residual(levels: np.ndarray) -> np.ndarray:
    """|level - nearest 8VSB constellation point| per symbol."""
    lev = np.atleast_2d(np.asarray(levels, np.float64))
    sym = np.clip(np.rint((lev - P.PILOT_OFFSET + 7.0) / 2.0), 0, 7)
    return np.abs(lev - (sym * 2.0 - 7.0 + P.PILOT_OFFSET))


def burst_erasure_flags(
    levels: np.ndarray,
    window: int = 64,
    factor: float = 2.5,
    floor: float = 0.45,
) -> np.ndarray:
    """Per-symbol erasure flags from a windowed slicer-residual detector.

    levels: (B, n) or (n,) equalized soft levels (pilot offset included).
    A position is flagged when the `window`-symbol mean residual exceeds
    max(factor * median_window_residual, floor) — the median is the
    clean-air baseline (bursts are assumed to cover well under half the
    stream), the absolute floor keeps quiet captures from flagging their
    own noise. Flags are dilated by `window` on each side.

    Returns (B, n) uint8. Intended regime: impulse/gated-noise bursts on
    an otherwise decodable capture; at very low SNR the baseline itself
    approaches the burst residual and detection (correctly) vanishes.
    """
    r = slicer_residual(levels)
    b, n = r.shape
    c = np.cumsum(np.concatenate([np.zeros((b, 1)), r], axis=1), axis=1)
    w = (c[:, window:] - c[:, :-window]) / window  # (b, n - window + 1)
    base = np.median(w, axis=1, keepdims=True)
    hot = w > np.maximum(factor * base, floor)
    # valid-window flags -> per-symbol flags, dilated by one window
    flags = np.zeros((b, n), dtype=np.uint8)
    pad = np.zeros((b, 1), dtype=bool)
    edges = np.diff(np.concatenate([pad, hot, pad], axis=1).astype(np.int8),
                    axis=1)
    for bi in range(b):
        starts = np.nonzero(edges[bi] == 1)[0]
        ends = np.nonzero(edges[bi] == -1)[0]
        for s, e in zip(starts, ends):
            lo = max(s - window, 0)
            hi = min(e - 1 + 2 * window, n)  # window span + dilation
            flags[bi, lo:hi] = 1
    return flags


@functools.partial(jax.jit, static_argnames=("window", "factor", "floor"))
def burst_erasure_flags_dev(
    levels: jnp.ndarray,
    window: int = 64,
    factor: float = 2.5,
    floor: float = 0.45,
) -> jnp.ndarray:
    """Device twin of burst_erasure_flags: the same detector, jitted, so
    per-field flags never leave the accelerator (the host path pulls the
    (B, n) levels to float64 and re-scans them — ~130 MB of D2H plus
    host math per field at B=64). Two re-formulations, both immaterial
    to detection quality:

    - the clean-air baseline is the median of a `window`-strided
      subsample of the windowed means (~4k values) — a full-length
      device sort buys nothing over the subsample for a median whose
      only job is to sit below factor^-1 of burst level;
    - run dilation is a windowed OR over the 0/1 hot mask — computed as
      "windowed SUM > 0" from one cumulative sum (a 3w-wide
      `lax.reduce_window` max was tried and REJECTED: 43.4 ms at B=256
      on chip, the single most expensive op of the whole erasure chain;
      the cumsum difference is O(1) per element and measures ~2 ms; fp32
      cumsum of 0/1 values is exact far beyond the 260k field length).
      The flag set is *identical* to the host path's: symbol i is
      flagged iff some hot window j lies in (i-2w, i+w], exactly the
      per-run [j-w, j+2w) span.

    levels: (B, n) float soft levels (pilot offset included).
    Returns (B, n) uint8 device flags.
    """
    from atsc_tpu.ops.slicer import ideal_levels

    lev = levels.astype(jnp.float32)
    r = jnp.abs(lev - P.PILOT_OFFSET - ideal_levels(lev))
    n = r.shape[-1]
    c = jnp.pad(jnp.cumsum(r, axis=-1), ((0, 0), (1, 0)))
    w = (c[:, window:] - c[:, :-window]) / window   # (B, n - window + 1)
    base = jnp.median(w[:, ::window], axis=-1, keepdims=True)
    hot = (w > jnp.maximum(factor * base, floor)).astype(jnp.float32)
    # flags[i] = OR of hot[i - (2w-1) .. i + w]  ==  windowed sum > 0
    hp = jnp.pad(hot, ((0, 0), (2 * window - 1, 2 * window)))
    ch = jnp.pad(jnp.cumsum(hp, axis=-1), ((0, 0), (1, 0)))
    flags = (ch[:, 3 * window :] - ch[:, : -3 * window]) > 0
    return flags[:, :n].astype(jnp.uint8)
