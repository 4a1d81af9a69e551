"""Failure detection + elastic recovery for long-running encode streams
(SURVEY.md §5.3 — the reference has none: errors are printf+exit,
util/atsc_encoder.cpp:55-58,106-108; its RS decoder is dead code).

Production streams run for days; the failure modes that matter are
device-side corruption (a bad HBM read, a preempted chip coming back
wrong) and host-side state desync after resume. Detection is cheap
because 8VSB output is tightly characterized:

  * every IQ sample is a convolution of bounded symbol levels with the
    RRC taps through a |0.9| oscillator — |sample| can never exceed
    LEVEL_MAX * sum|taps| * 0.9 (IQ_BOUND below); NaN/Inf or bound
    violations mean corruption, checked with one O(1)-output device
    reduction per step (no host transfer of the IQ itself);
  * the carried state is tiny and typed (EncoderState) — parity must be
    0/1, trellis carries 0/1, symbols in [0, 8), the phasor on the unit
    circle times float32 drift.

Recovery = restore the last good checkpoint and re-encode from its field
counter: the state is O(1), so checkpoint cadence is cheap (an .npz of a
few hundred bytes per channel, utils/checkpoint.py).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, EncoderState
from atsc_tpu.tables.rrc import rrc_taps
from atsc_tpu.utils.checkpoint import load_state, save_state

# loosest possible valid |IQ| (levels ±8.25 would need every tap aligned)
IQ_BOUND = float(
    8.25 * np.abs(rrc_taps()).sum() * P.OSC_AMPLITUDE
) * 1.0001


@jax.jit
def iq_health(iq: jnp.ndarray) -> jnp.ndarray:
    """O(1)-output health reduction: max |IQ| over everything (NaN
    propagates). Healthy iff finite and <= IQ_BOUND."""
    return jnp.max(jnp.abs(iq))


def state_healthy(state: EncoderState) -> bool:
    """Host-side validation of the carried state's invariants."""
    parity = np.asarray(state.parity)
    saved = np.asarray(state.saved)
    carries = [np.asarray(state.trellis_d), np.asarray(state.trellis_d1),
               np.asarray(state.trellis_d2)]
    phasor = np.asarray(state.phasor)
    mag = np.hypot(phasor[:, 0], phasor[:, 1])
    return bool(
        np.isin(parity, (0, 1)).all()
        and (saved >= 0).all() and (saved < 8).all()
        and all(np.isin(c, (0, 1)).all() for c in carries)
        and np.isfinite(phasor).all()
        and (np.abs(mag - 1.0) < 1e-3).all()
    )


class SupervisedEncoder:
    """Encoder wrapper with health checks, periodic checkpoints, and
    checkpoint-rollback recovery.

    Every encode step gets an O(1) device-side health reduction on the IQ
    and an invariant check on the carried state. On failure the last good
    checkpoint is restored and the TS fields since then (kept in a small
    host-side replay ring — the state is O(1), so the ring bounds recovery
    work to `checkpoint_every` fields) are re-encoded before retrying the
    failing field. A second failure on the same field raises (persistent
    fault — hand off to the operator).
    """

    def __init__(self, batch: int = 1,
                 checkpoint_every: int = 64,
                 checkpoint_path: Optional[str] = None):
        self.enc = Encoder(batch=batch, donate=False)
        self.batch = batch
        self.checkpoint_every = checkpoint_every
        self.path = checkpoint_path or os.path.join(
            tempfile.gettempdir(), f"atsc_tpu_ckpt_{os.getpid()}.npz"
        )
        self.fields_encoded = 0
        self.failures = 0
        self._replay: list[np.ndarray] = []  # TS since last checkpoint
        self._checkpoint()

    def _checkpoint(self) -> None:
        save_state(self.path, self.enc.state, self.fields_encoded)
        self._replay.clear()

    def _healthy(self, iq) -> bool:
        peak = float(iq_health(iq))
        return bool(np.isfinite(peak) and peak <= IQ_BOUND
                    and state_healthy(self.enc.state))

    def _recover(self) -> None:
        """Roll back to the checkpoint and re-encode the replay ring."""
        self.failures += 1
        state, fields = load_state(self.path)
        self.enc.state = state
        self.fields_encoded = fields
        for ts in self._replay:
            iq = self.enc.encode(ts)
            if not self._healthy(iq):
                raise RuntimeError(
                    f"fault persists while replaying field "
                    f"{self.fields_encoded} after rollback"
                )
            self.fields_encoded += 1

    def encode(self, ts: np.ndarray) -> np.ndarray:
        """(B, 58656) -> (B, 2, 260480) IQ with supervision. Raises
        RuntimeError if the same field fails twice (persistent fault)."""
        ts = np.asarray(ts)
        for attempt in range(2):
            iq = self.enc.encode(ts)
            if self._healthy(iq):
                self.fields_encoded += 1
                self._replay.append(ts)
                if len(self._replay) >= self.checkpoint_every:
                    self._checkpoint()
                return np.asarray(iq)
            self._recover()
        raise RuntimeError(
            f"persistent encode fault at field {self.fields_encoded}"
        )
