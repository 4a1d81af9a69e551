"""Shared 8VSB hard-decision helpers for the device receive paths.

One home for the nearest-constellation math (levels are the 8VSB
{-7..+7} lattice plus the +1.25 pilot bias — reference
src/atsc/signal.h:14-18), so the equalizers, slicers, MER reduction,
burst detector, and decision-directed refinement cannot drift apart.
All functions are jnp-traceable (use inside jit/shard_map/vmap).
"""

from __future__ import annotations

import jax.numpy as jnp

from atsc_tpu import params as P


def slice_symbols(lev: jnp.ndarray) -> jnp.ndarray:
    """Soft levels (pilot offset included) -> int8 3-bit symbol values."""
    sym = jnp.round((lev - P.PILOT_OFFSET + 7.0) * 0.5)
    return jnp.clip(sym, 0, 7).astype(jnp.int8)


def ideal_levels(lev: jnp.ndarray) -> jnp.ndarray:
    """Nearest constellation level of each soft level, WITHOUT the pilot
    bias: returns values on the {-7,-5,...,+7} lattice. The slicer
    residual is `(lev - P.PILOT_OFFSET) - ideal_levels(lev)`."""
    x = lev - P.PILOT_OFFSET
    return jnp.clip(jnp.round((x + 7.0) * 0.5) * 2.0 - 7.0, -7.0, 7.0)
