"""On-hardware end-to-end verification: drive the compiled encoder on the
live backend (TPU when attached; falls back to whatever jax.devices() shows)
and compare against the reference golden vectors.

The pytest suite pins the CPU backend (tests/conftest.py) and exercises the
Pallas kernel only in interpret mode; this script is the real-device check:
it compiles the fused Mosaic kernel, runs the 4 golden fields through the
public Encoder API (state carried across fields), and enforces the 5e-6 IQ
bound. Exit code 0 = pass.

Run: python tools/tpu_check.py
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.models.encoder import Encoder, iq_to_complex  # noqa: E402


def main() -> int:
    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}")
    g = np.load("tests/golden/golden.npz")
    enc = Encoder(batch=1)

    t0 = time.perf_counter()
    iq = np.concatenate(
        [np.asarray(enc.encode(g["input"][k : k + 1])) for k in range(4)]
    )
    # a value fetch is the only reliable execution barrier over remote
    # device tunnels (block_until_ready can return early)
    _ = float(np.sum(iq[..., :64]))
    dt = time.perf_counter() - t0

    err = np.abs(iq_to_complex(iq) - g["iq"]).max()
    print(f"max |IQ - golden| = {err:.3e}  (bound 5e-6; 4 fields in {dt:.1f}s"
          " incl compile)")
    if err >= 5e-6:
        print("FAIL")
        return 1

    # carried state must match the spec oracle's closed forms
    st = enc.state
    assert int(np.asarray(st.parity)[0]) == 0  # 4 fields -> even again
    from atsc_tpu.tables.oscillator import phasor_for_field

    want_ph = phasor_for_field(4)
    got_ph = complex(*np.asarray(st.phasor)[0])
    assert abs(got_ph - want_ph) < 1e-6, (got_ph, want_ph)

    # receive side: device-path equalizer + trellis/RS decode back to TS
    from atsc_tpu.models.receiver import IqReceiver

    rx = IqReceiver(batch=1)
    got = rx.push(iq_to_complex(iq).reshape(1, -1)) + rx.flush()
    assert len(got) == 3, len(got)
    for k, (ts, nerr) in enumerate(got):
        assert (nerr >= 0).all(), f"uncorrectable segments in field {k}"
        np.testing.assert_array_equal(ts[0], g["input"][k])
    print(f"receiver loopback: 3 fields TS-exact "
          f"(corrected={rx.decoder.segments_corrected})")

    # quantized code path: cs8 wire samples uploaded verbatim, in-step
    # dequantization (2-4x less H2D than cf32)
    from atsc_tpu.ops.quantize import QMAX, quantize_scale

    cap = iq_to_complex(iq).reshape(1, -1)
    s = quantize_scale("cs8")
    codes = np.clip(np.round(np.stack([cap.real, cap.imag], -1) * s),
                    -QMAX["cs8"], QMAX["cs8"]).astype(np.int8)
    rx8 = IqReceiver(batch=1, wire_format="cs8")
    got8 = rx8.push_codes(codes) + rx8.flush()
    assert len(got8) == 3, len(got8)
    for k, (ts, nerr) in enumerate(got8):
        assert (nerr >= 0).all(), f"cs8: uncorrectable segments, field {k}"
        np.testing.assert_array_equal(ts[0], g["input"][k])
    print(f"cs8 code-path loopback: 3 fields TS-exact "
          f"(corrected={rx8.decoder.segments_corrected})")

    # adaptive-dd equalizer (RLS + decision-directed second pass) through
    # an unknown complex gain, and the device burst detector feeding
    # errors-and-erasures RS through an impulse hit — the 2026-08-18
    # device paths, exercised on real hardware
    chan = cap * (0.9 * np.exp(0.5j))
    rng = np.random.default_rng(5)
    s0 = P.SYMBOLS_PER_FIELD + 40_000
    chan[:, s0 : s0 + 2500] += (
        rng.normal(size=2500) + 1j * rng.normal(size=2500)
    ) * 5.0
    rxd = IqReceiver(batch=1, backend="adaptive-dd", erasures="burst")
    gotd = rxd.push(chan) + rxd.flush()
    assert len(gotd) == 3, len(gotd)
    for k, (ts, nerr) in enumerate(gotd):
        assert (nerr >= 0).all(), f"dd: uncorrectable segments, field {k}"
        np.testing.assert_array_equal(ts[0], g["input"][k])
    print(f"adaptive-dd + burst-erasure loopback: 3 fields TS-exact "
          f"(erasure-assisted={rxd.decoder.segments_erasure_assisted})")
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
