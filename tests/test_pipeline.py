"""End-to-end pipeline tests: the composed encoder vs golden IQ (a test the
reference never had — its composed process_field was untested, SURVEY.md §4),
batching consistency, and the scan driver."""

import jax.numpy as jnp
import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import (
    Encoder,
    encode_field,
    encode_fields,
    init_state,
    iq_to_complex,
)

IQ_TOL = 5e-6  # |IQ| <= ~7.5; covers fp32 ordering differences + phasor drift


def test_end_to_end_four_fields(golden):
    state = init_state(1)
    for f in range(4):
        state, iq = encode_field(state, jnp.asarray(golden["input"][f][None]))
        err = np.abs(iq_to_complex(np.asarray(iq))[0] - golden["iq"][f]).max()
        assert err < IQ_TOL, (f, err)


def test_scan_matches_stepwise(golden):
    ts = jnp.asarray(golden["input"][:, None, :])  # (4, 1, 58656)
    state, iq = encode_fields(init_state(1), ts)
    got = iq_to_complex(np.asarray(iq))
    for f in range(4):
        err = np.abs(got[f, 0] - golden["iq"][f]).max()
        assert err < IQ_TOL, (f, err)


def test_batched_channels_independent(golden):
    """Channels in one batch must produce identical results to solo runs."""
    b = 3
    ts = np.stack([golden["input"][f % 4] for f in range(b)])  # different data
    state, iq = encode_field(init_state(b), jnp.asarray(ts))
    for c in range(b):
        state1, iq1 = encode_field(init_state(1), jnp.asarray(ts[c][None]))
        np.testing.assert_array_equal(np.asarray(iq)[c], np.asarray(iq1)[0])


def test_encoder_wrapper(golden):
    enc = Encoder(batch=1)
    iq = enc.encode_many(golden["input"][:, None, :])
    err = np.abs(iq_to_complex(np.asarray(iq))[:, 0] - golden["iq"]).max()
    assert err < IQ_TOL

def test_field_geometry():
    assert P.SYMBOLS_PER_FIELD == 260_416
    assert P.DATA_PER_FIELD == 64_584
    assert abs(P.FIELD_RATE - 41.327) < 1e-3
    assert abs(P.TS_BITRATE - 19_392_658.8) < 1.0
