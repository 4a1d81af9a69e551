"""Checkpoint/resume for encoder streams (SURVEY.md §5.4 — a capability
the reference lacks; its resumable state is tiny and enumerable, which is
exactly what EncoderState captures).

Format: a single .npz with the state leaves + the field counter. Restoring
into a sharded encoder re-places leaves onto the mesh automatically via
jax.device_put in ShardedEncoder/init paths.
"""

from __future__ import annotations

import jax
import numpy as np

from atsc_tpu.models.encoder import EncoderState

_FIELDS = EncoderState._fields


def save_state(path: str, state: EncoderState, fields_encoded: int = 0) -> None:
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    arrays["__fields_encoded__"] = np.asarray(fields_encoded, dtype=np.int64)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> tuple[EncoderState, int]:
    z = np.load(path)
    state = EncoderState(**{name: jax.numpy.asarray(z[name]) for name in _FIELDS})
    return state, int(z["__fields_encoded__"])
