"""Property test: the JAX pipeline must agree with the pure-NumPy
executable specification (spec/reference_model.py — the bit-serial oracle
that was itself validated against the reference's golden dumps) on RANDOM
transport streams, not just the 4 golden fields. Catches anything the
fixed golden inputs cannot reach (rare carry patterns, parity edge cases).
"""

import numpy as np
import jax.numpy as jnp

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_to_complex
from atsc_tpu.spec.reference_model import EncoderState as SpecState
from atsc_tpu.spec.reference_model import encode_field_np


def test_random_streams_match_spec_oracle():
    rng = np.random.default_rng(0xA53)
    n_fields = 3
    ts = rng.integers(
        0, 256, size=(n_fields, P.FIELD_TS_BYTES), dtype=np.uint8
    )
    ts[:, :: P.MPEG2_BYTES] = 0x47  # sync bytes (dropped by the randomizer)

    enc = Encoder(batch=1)
    spec_state = SpecState.initial()
    for f in range(n_fields):
        iq = np.asarray(enc.encode(ts[f][None]))
        got = iq_to_complex(iq)[0]

        stages, spec_state = encode_field_np(ts[f], spec_state)

        # FEC chain byte-exactness is implied by the IQ bound below only
        # weakly; check the carried state byte-for-byte too
        st = enc.state
        np.testing.assert_array_equal(
            np.asarray(st.prev_rs)[0], spec_state.prev_rs
        )
        assert int(np.asarray(st.parity)[0]) == spec_state.parity

        err = np.abs(got - stages["iq"][: P.SYMBOLS_PER_FIELD]).max()
        assert err < 2e-6, (f, err)
