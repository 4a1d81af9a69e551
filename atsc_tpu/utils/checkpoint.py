"""Checkpoint/resume for encoder and receiver streams (SURVEY.md §5.4 —
a capability the reference lacks; its resumable state is tiny and
enumerable, which is exactly what EncoderState captures).

Format: a single .npz with the state leaves + the field counter. Restoring
into a sharded encoder re-places leaves onto the mesh automatically via
jax.device_put in ShardedEncoder/init paths.

The receiver side (save_receiver/load_receiver) persists the complete
resumable state of a streaming IqReceiver: configuration, decode
progress, the bounded un-consumed sample window, the decoder's carried
interleaver/precoder/Viterbi state, erasure-flag carry, RS statistics,
and (adaptive backend) the accumulated RLS normal equations — so a
decode can stop at any push boundary and continue byte-identically.
"""

from __future__ import annotations

import jax
import numpy as np

from atsc_tpu.models.encoder import EncoderState

_FIELDS = EncoderState._fields

#: bump when the on-disk layout changes incompatibly (leaf set, leaf
#: meaning, or metadata keys); loaders refuse any other version loudly
CHECKPOINT_VERSION = 1


def _check_version(z, path: str, kind: str) -> None:
    ver = int(z["__version__"]) if "__version__" in z.files else 0
    if ver != CHECKPOINT_VERSION:
        raise ValueError(
            f"{kind} checkpoint {path!r} has format version {ver}, but "
            f"this build reads version {CHECKPOINT_VERSION} — it was "
            "written by an incompatible build; re-run without --resume "
            "(version 0 = pre-versioning checkpoint)"
        )


def save_state(path: str, state: EncoderState, fields_encoded: int = 0,
               mux_carry: np.ndarray | None = None,
               resample_state: dict | None = None) -> None:
    arrays = {name: np.asarray(getattr(state, name)) for name in _FIELDS}
    arrays["__version__"] = np.asarray(CHECKPOINT_VERSION, dtype=np.int64)
    arrays["__fields_encoded__"] = np.asarray(fields_encoded, dtype=np.int64)
    if mux_carry is not None:  # FdmMuxer.get_state() of an encode --mux run
        arrays["__mux_carry__"] = np.asarray(mux_carry)
    if resample_state is not None:  # StreamResampler.full_state() of an
        #                             encode --rate run (output-clock side)
        for k, v in resample_state.items():
            arrays[f"__rs_{k}__"] = np.asarray(v)
    np.savez_compressed(path, **arrays)


def load_state(path: str) -> tuple[EncoderState, int]:
    """Restore an encoder checkpoint; fails loudly (never misloads) when
    the file was written by an incompatible build: version stamp first,
    then every state leaf checked against the shape/dtype this build's
    init_state would produce (catches a reshaped EncoderState whose file
    happens to still load)."""
    from atsc_tpu.models.encoder import init_state

    z = np.load(path)
    _check_version(z, path, "encoder")
    missing = [n for n in _FIELDS if n not in z.files]
    if missing:
        raise ValueError(
            f"encoder checkpoint {path!r} lacks state leaves {missing} — "
            "written by an incompatible build"
        )
    state = EncoderState(**{name: jax.numpy.asarray(z[name]) for name in _FIELDS})
    batch = int(np.asarray(z[_FIELDS[0]]).shape[0])
    # abstract shapes only — no device allocation on the resume path
    ref = jax.eval_shape(lambda: init_state(batch))
    for name in _FIELDS:
        want, got = getattr(ref, name), getattr(state, name)
        if tuple(want.shape) != tuple(got.shape) or want.dtype != got.dtype:
            raise ValueError(
                f"encoder checkpoint {path!r} leaf {name!r} is "
                f"{tuple(got.shape)}/{got.dtype} but this build expects "
                f"{tuple(want.shape)}/{want.dtype} — the state layout "
                "changed; cannot resume"
            )
    return state, int(z["__fields_encoded__"])


def load_mux_carry(path: str) -> np.ndarray | None:
    """The FdmMuxer carry of an encode --mux checkpoint (None when the
    checkpoint was written by a plain single-stream run)."""
    z = np.load(path)
    return z["__mux_carry__"] if "__mux_carry__" in z else None


def load_resample_state(path: str) -> dict | None:
    """The output-clock StreamResampler state of an encode --rate
    checkpoint (None for a nominal-rate run)."""
    z = np.load(path)
    keys = [k for k in z.files if k.startswith("__rs_")]
    if not keys:
        return None
    return {k[len("__rs_"):-2]: z[k] for k in keys}


# -- sharded (mesh) receiver checkpoints --------------------------------

_SRX_CONFIG = ("batch", "trellis", "wire_format", "t_total", "n_time",
               "n_ch", "equalizer", "eq_profile")


def save_sharded_receiver(path: str, rx, extra: dict | None = None) -> None:
    """Persist a parallel.rx_shard.ShardedReceiver between steps
    (single-process meshes: the state leaves are fetched with
    jax.device_get; multi-host runs checkpoint per-host via their own
    drivers). `extra` carries the CLI's stream-position metadata."""
    import json

    state = jax.device_get(rx._state)
    arrays = {
        "extra_json": np.asarray(json.dumps(extra or {})),
        "__kind__": np.asarray("sharded_receiver"),
        "__version__": np.asarray(CHECKPOINT_VERSION, dtype=np.int64),
        "config": np.asarray(
            [str(getattr(rx, k)) for k in _SRX_CONFIG], dtype=np.str_
        ),
        "next_field": np.asarray(rx._next_field, dtype=np.int64),
        "rs_stats": np.asarray(
            [rx.segments_corrected, rx.segments_uncorrectable],
            dtype=np.int64,
        ),
    }
    for name in type(state)._fields:
        arrays["st_" + name] = np.asarray(getattr(state, name))
    np.savez_compressed(path, **arrays)


def restore_sharded_receiver(path: str, rx) -> dict:
    """Restore a save_sharded_receiver checkpoint INTO an already-built
    ShardedReceiver (the mesh/tier configuration comes from the CLI
    flags and must match the file — validated leaf-by-leaf). Returns
    the saved `extra` metadata."""
    import json

    from atsc_tpu.parallel.distributed import put_global

    z = np.load(path)
    assert str(z["__kind__"]) == "sharded_receiver", (
        "not a sharded-receiver checkpoint")
    _check_version(z, path, "sharded receiver")
    cfg = dict(zip(_SRX_CONFIG, (str(s) for s in z["config"])))
    for k in _SRX_CONFIG:
        if cfg[k] != str(getattr(rx, k)):
            raise ValueError(
                f"sharded-receiver checkpoint {path!r} was written with "
                f"{k}={cfg[k]}, but this decode runs {k}="
                f"{getattr(rx, k)} — re-run with matching flags"
            )
    want = rx._state
    state_cls = type(want)
    leaves = {}
    for name in state_cls._fields:
        key = "st_" + name
        if key not in z.files:
            raise ValueError(
                f"sharded-receiver checkpoint {path!r} lacks state leaf "
                f"{name!r} — written by an incompatible build")
        leaves[name] = z[key]
    for name, arr in leaves.items():
        w = getattr(want, name)
        if tuple(w.shape) != arr.shape or w.dtype != arr.dtype:
            raise ValueError(
                f"sharded-receiver checkpoint {path!r} leaf {name!r} is "
                f"{arr.shape}/{arr.dtype} but this build expects "
                f"{tuple(w.shape)}/{w.dtype} — cannot resume")
    rx._state = put_global(state_cls(**leaves), rx.state_sharding)
    rx._next_field = int(z["next_field"])
    stats = z["rs_stats"]
    rx.segments_corrected = int(stats[0])
    rx.segments_uncorrectable = int(stats[1])
    return json.loads(str(z["extra_json"]))


# -- receiver checkpoints -----------------------------------------------

_RX_CONFIG = ("batch", "first_field", "backend", "trellis", "erasures",
              "wire_format", "eq_profile", "ntsc", "viterbi_chunks",
              "resync", "resync_after", "resync_threshold")


def save_receiver(path: str, rx, extra: dict | None = None,
                  extra_arrays: dict | None = None) -> None:
    """Persist an IqReceiver (models/receiver.py) mid-stream.

    extra: optional JSON-serializable caller metadata (e.g. the CLI's
    conditioning parameters), returned as `rx.checkpoint_extra` on load.
    extra_arrays: optional caller-owned numpy arrays (e.g. the --demux
    FdmDemuxer carry), returned as `rx.checkpoint_arrays` on load.
    """
    import json

    dec = rx.decoder
    arrays = {
        "extra_json": np.asarray(json.dumps(extra or {})),
        "__kind__": np.asarray("iq_receiver"),
        "__version__": np.asarray(CHECKPOINT_VERSION, dtype=np.int64),
        "config": np.asarray(
            [str(getattr(rx, k)) for k in _RX_CONFIG], dtype=np.str_
        ),
        "next_field": np.asarray(rx._next_field, dtype=np.int64),
        "primed": np.asarray(rx._primed),
        "epoch": np.asarray(rx._epoch, dtype=np.int64),
        "resync_state": np.asarray(
            [rx._bad_streak, rx._acquiring, rx._acquire_from, rx.resyncs],
            dtype=np.int64,
        ),
        "resync_log_json": np.asarray(json.dumps(rx.resync_log)),
        "fields_emitted": np.asarray(rx.fields_emitted, dtype=np.int64),
        "stream_base": np.asarray(rx._stream.base, dtype=np.int64),
        "stream_window": rx._stream.window(rx._stream.base, rx._stream.end),
        "dec_prev_il": np.asarray(dec._state.prev_il),
        "dec_z2_prev": np.asarray(dec._state.z2_prev),
        "rs_stats": np.asarray(
            [dec.segments_corrected, dec.segments_uncorrectable,
             dec.segments_erasure_assisted], dtype=np.int64,
        ),
        "ntsc_flags": np.asarray(
            [rx._ntsc_pending, rx.ntsc_active]
        ),
    }
    if hasattr(dec._state, "metrics"):          # soft (Viterbi) decoder
        arrays["dec_metrics"] = np.asarray(dec._state.metrics)
    if dec._flag_il is not None:                # erasure-flag carry
        arrays["dec_flag_il"] = np.asarray(dec._flag_il)
    if rx._adaptive is not None:                # RLS normal equations
        arrays["rls_r"] = np.asarray(rx._adaptive._r)
        arrays["rls_v"] = np.asarray(rx._adaptive._v)
        arrays["rls_lam"] = np.asarray(rx._adaptive._lam)
        arrays["rls_ridge"] = np.asarray(rx._adaptive._ridge)
        # retrain-cadence state: the cached taps + field counter keep a
        # resumed stream's solve schedule (and therefore its output)
        # byte-identical to an uninterrupted run
        arrays["rls_cadence"] = np.asarray(
            [rx._adaptive.train_every, rx._adaptive._fields_seen],
            dtype=np.int64,
        )
        if rx._adaptive._w_dev is not None:
            arrays["rls_w"] = np.asarray(rx._adaptive._w_dev)
    for name, arr in (extra_arrays or {}).items():
        arrays["xarr_" + name] = np.asarray(arr)
    np.savez_compressed(path, **arrays)


def load_receiver(path: str):
    """Reconstruct the checkpointed IqReceiver; decoding continues
    byte-identically from the saved push boundary."""
    import jax.numpy as jnp

    from atsc_tpu.models.receiver import IqReceiver

    import json

    z = np.load(path)
    assert str(z["__kind__"]) == "iq_receiver", "not a receiver checkpoint"
    _check_version(z, path, "receiver")
    cfg = dict(zip(_RX_CONFIG, (str(s) for s in z["config"])))
    extra = json.loads(str(z["extra_json"])) if "extra_json" in z else {}
    rx = IqReceiver(
        batch=int(cfg["batch"]), first_field=int(cfg["first_field"]),
        backend=cfg["backend"], trellis=cfg["trellis"],
        erasures=None if cfg["erasures"] == "None" else cfg["erasures"],
        wire_format=cfg["wire_format"], eq_profile=cfg["eq_profile"],
        ntsc=None if cfg.get("ntsc", "None") == "None" else cfg["ntsc"],
        viterbi_chunks=int(cfg.get("viterbi_chunks", "1")),
        resync=(None if cfg.get("resync", "None") == "None"
                else cfg["resync"]),
        resync_after=int(cfg.get("resync_after", "2")),
        resync_threshold=float(cfg.get("resync_threshold", "0.5")),
    )
    if "epoch" in z:
        rx._epoch = int(z["epoch"])
        st8 = z["resync_state"]
        rx._bad_streak = int(st8[0])
        rx._acquiring = bool(st8[1])
        rx._acquire_from = int(st8[2])
        rx.resyncs = int(st8[3])
        rx.resync_log = json.loads(str(z["resync_log_json"]))
    if "ntsc_flags" in z:
        rx._ntsc_pending = bool(z["ntsc_flags"][0])
        was_active = bool(z["ntsc_flags"][1])
        if was_active and not rx.ntsc_active:  # auto-detected comb mode
            from atsc_tpu.models.decoder import NtscDecoder
            rx._decoder = NtscDecoder(batch=rx.batch,
                                      viterbi_chunks=rx.viterbi_chunks)
        rx.ntsc_active = was_active
    rx._next_field = int(z["next_field"])
    rx._primed = bool(z["primed"])
    rx.fields_emitted = (
        int(z["fields_emitted"]) if "fields_emitted" in z
        else (max(rx._next_field - 1, 0) if rx._primed else 0)
    )
    base = int(z["stream_base"])
    win = z["stream_window"]
    st = rx._stream
    if win.shape[-1]:
        st._chunks = [win.astype(st.dtype, copy=False)]
        st._starts = [base]
    st.base = base
    st.end = base + win.shape[-1]
    dec = rx.decoder
    state_kw = {
        "prev_il": jnp.asarray(z["dec_prev_il"]),
        "z2_prev": jnp.asarray(z["dec_z2_prev"]),
    }
    if "dec_metrics" in z:
        state_kw["metrics"] = jnp.asarray(z["dec_metrics"])
    dec._state = type(dec._state)(**state_kw)
    if "dec_flag_il" in z:
        dec._flag_il = jnp.asarray(z["dec_flag_il"])
    stats = z["rs_stats"]
    dec.segments_corrected = int(stats[0])
    dec.segments_uncorrectable = int(stats[1])
    dec.segments_erasure_assisted = int(stats[2])
    if rx._adaptive is not None:
        rx._adaptive._r = jnp.asarray(z["rls_r"])
        rx._adaptive._v = jnp.asarray(z["rls_v"])
        rx._adaptive._lam = jnp.asarray(z["rls_lam"])
        rx._adaptive._ridge = jnp.asarray(z["rls_ridge"])
        if "rls_cadence" in z:
            cad = z["rls_cadence"]
            rx._adaptive.train_every = int(cad[0])
            rx.train_every = int(cad[0])
            rx._adaptive._fields_seen = int(cad[1])
        if "rls_w" in z:
            rx._adaptive._w_dev = jnp.asarray(z["rls_w"])
    rx.checkpoint_extra = extra
    rx.checkpoint_arrays = {
        k[5:]: z[k] for k in z.files if k.startswith("xarr_")
    }
    return rx
