"""Intra-field sample-block sharding: overlap-save pilot-offset + RRC FIR
with ICI halo exchange (BASELINE config[3]; the SP/CP analog at sample
granularity, for minimum single-channel latency).

One field's 260,416 output samples are split into equal contiguous blocks
over the "sp" mesh axis. Each device modulates its block onto its slice of
the oscillator, then receives the 111-sample lookahead halo from its right
neighbor via `ppermute` (overlap-save). The last device synthesizes its
halo locally from the field-sync padding constants — the same trick the
reference uses to make whole fields independent (reference filter.h
lookahead + field_sync.h padding copy, SURVEY.md §2.9).

Note: this path deliberately does NOT use the fused Pallas back-half
kernel (ops/pallas/offset_fir.py). The kernel's grid assumes whole
261,248-sample fields in 128-sample blocks; a per-device sample block
plus its 111-sample halo is neither 128-aligned nor field-shaped, and
re-gridding the kernel per shard count would trade its main win (the
chunk-resident oscillator) for nothing — at sample-shard scale the FIR
is a small fraction of a field and XLA's fusion of the unfused ops is
already fine. Use field_shard for throughput; this module is for
minimum latency on one channel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as PSpec

from atsc_tpu import params as P
from atsc_tpu.ops.offset import _osc_planar
from atsc_tpu.ops.rrc_filter import banded_fir
from atsc_tpu.tables.sync import sync_templates

SP_AXIS = "sp"
_HALO = P.RRC_LOOKAHEAD  # 111


@functools.lru_cache(maxsize=1)
def _pad_template() -> np.ndarray:
    """(2, 111) float32: the first 111 padding-segment symbol levels per
    parity (constant: the field-sync copy written after the field end)."""
    template, is_const = sync_templates()
    pad = template[:, P.SYMBOLS_PER_FIELD : P.SYMBOLS_PER_FIELD + _HALO]
    assert is_const[P.SYMBOLS_PER_FIELD : P.SYMBOLS_PER_FIELD + _HALO].all()
    return pad.copy()


def _local_offset_fir(field_blk, phasor, parity, n_sp: int):
    """Per-device body. field_blk: (B, nb) real symbols for my block;
    phasor: (B, 2); parity: (B,). Returns (B, nb, 2) IQ."""
    d = jax.lax.axis_index(SP_AXIS)
    nb = field_blk.shape[-1]

    osc_re, osc_im = _osc_planar()
    tre = jax.lax.dynamic_slice_in_dim(jnp.asarray(osc_re), d * nb, nb)
    tim = jax.lax.dynamic_slice_in_dim(jnp.asarray(osc_im), d * nb, nb)
    pr, pi = phasor[:, 0:1], phasor[:, 1:2]
    my_re = field_blk * (tre[None] * pr - tim[None] * pi)
    my_im = field_blk * (tre[None] * pi + tim[None] * pr)
    my = jnp.stack([my_re, my_im], axis=1)  # (B, 2, nb)

    # halo: first 111 offset samples -> left neighbor
    left_perm = [(t, t - 1) for t in range(1, n_sp)]
    halo = jax.lax.ppermute(my[:, :, :_HALO], SP_AXIS, left_perm)

    # last device: synthesize the halo from the padding constants
    pad_sym = jnp.asarray(_pad_template())[parity]          # (B, 111)
    pre = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(osc_re), P.SYMBOLS_PER_FIELD, _HALO
    )
    pim = jax.lax.dynamic_slice_in_dim(
        jnp.asarray(osc_im), P.SYMBOLS_PER_FIELD, _HALO
    )
    pad_re = pad_sym * (pre[None] * pr - pim[None] * pi)
    pad_im = pad_sym * (pre[None] * pi + pim[None] * pr)
    pad_halo = jnp.stack([pad_re, pad_im], axis=1)
    halo = jnp.where(d == n_sp - 1, pad_halo, halo)

    ext = jnp.concatenate([my, halo], axis=-1)              # (B, 2, nb+111)
    out = banded_fir(ext, nb)                                # (B, 2, nb)
    return out.transpose(0, 2, 1)


class SampleShardedFilter:
    """Sharded offset+FIR over a 1-D "sp" mesh: field (B, 260416) real
    symbols (sans padding) -> (B, 260416, 2) IQ, samples sharded."""

    def __init__(self, mesh: Mesh):
        assert SP_AXIS in mesh.axis_names
        self.mesh = mesh
        self.n_sp = mesh.shape[SP_AXIS]
        assert P.SYMBOLS_PER_FIELD % self.n_sp == 0, (
            f"260416 must divide over {self.n_sp} sample shards"
        )
        body = functools.partial(_local_offset_fir, n_sp=self.n_sp)
        self._fn = jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(PSpec(None, SP_AXIS), PSpec(), PSpec()),
                out_specs=PSpec(None, SP_AXIS, None),
                check_vma=False,
            )
        )
        self.field_sharding = NamedSharding(mesh, PSpec(None, SP_AXIS))

    def __call__(self, field, phasor, parity):
        """field: (B, 260416) float32 (data+sync symbols, no padding);
        phasor: (B, 2) float32; parity: (B,) int32 -> (B, 260416, 2)."""
        field = jax.device_put(field, self.field_sharding)
        return self._fn(field, phasor, parity)


def dryrun(n_devices: int) -> None:
    """Compile + run one sample-sharded offset+FIR step on a 1-D "sp"
    mesh of n_devices (the overlap-save halo-exchange path)."""
    mesh = Mesh(np.asarray(jax.devices()[:n_devices]), (SP_AXIS,))
    filt = SampleShardedFilter(mesh)
    field = jnp.zeros((1, P.SYMBOLS_PER_FIELD), jnp.float32)
    phasor = jnp.asarray([[1.0, 0.0]], jnp.float32)
    parity = jnp.zeros((1,), jnp.int32)
    out = filt(field, phasor, parity)
    jax.block_until_ready(out)
    assert out.shape == (1, P.SYMBOLS_PER_FIELD, 2)
