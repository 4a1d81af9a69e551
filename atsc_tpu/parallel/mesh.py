"""Device-mesh construction helpers.

Mesh axes:
  "time" — blocks of consecutive fields of each stream (SP/CP analog);
  "ch"   — independent 8VSB channels (DP analog).

Collectives ride ICI: the per-step exchanges are one ring-permute of the
previous RS field (64,584 B/channel), one ring-permute of 12 boundary
symbols, and one all-gather of 36 bits of trellis parity per channel —
O(1) in stream length, which is why scaling is near-perfect.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

TIME_AXIS = "time"
CH_AXIS = "ch"


def make_mesh(n_time: int, n_ch: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_time * n_ch
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    arr = np.asarray(devices[:n]).reshape(n_time, n_ch)
    return Mesh(arr, (TIME_AXIS, CH_AXIS))
