"""Quick host-side validation of the numpy spec layer against golden vectors.

Run: python tools/validate_tables.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

from atsc_tpu import params as P  # noqa: E402
from atsc_tpu.spec.reference_model import EncoderState, encode_field_np  # noqa: E402
from atsc_tpu.tables.rrc import rrc_taps  # noqa: E402

g = np.load("tests/golden/golden.npz")
nfields = g["input"].shape[0]

# 0) RRC taps vs the shipped contract (reference filter.h:71; the same
# check also runs inside rrc_taps() itself and in test_stages.py)
from atsc_tpu.spec.shipped_rrc import SHIPPED_RRC_TAPS as shipped  # noqa: E402

mine = rrc_taps()
err = np.abs(mine - shipped).max()
rel = err / np.abs(shipped).max()
print(f"RRC taps: max abs err vs shipped = {err:.3e} (rel {rel:.3e})")

state = EncoderState.initial()
for f in range(nfields):
    t0 = time.time()
    stages, state = encode_field_np(g["input"][f], state)
    dt = time.time() - t0
    msgs = []
    for name in ("rand", "rs", "il"):
        ok = np.array_equal(stages[name], g[name][f])
        msgs.append(f"{name}:{'OK' if ok else 'FAIL'}")
        if not ok:
            d = np.nonzero(stages[name] != g[name][f])[0]
            msgs.append(f"(first diff @ {d[0]}, n={d.size})")
    for name in ("trellis", "sync", "offset", "iq"):
        d = np.abs(stages[name] - g[name][f])
        msgs.append(f"{name}:max|Δ|={d.max():.2e}")
    print(f"field {f} ({dt:.1f}s): " + "  ".join(msgs))
