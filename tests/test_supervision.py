"""Failure detection + rollback recovery (SURVEY §5.3 — capability the
reference lacks entirely)."""

import numpy as np
import jax.numpy as jnp

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder
from atsc_tpu.utils.supervision import (
    IQ_BOUND, SupervisedEncoder, iq_health, state_healthy,
)


def test_iq_bound_admits_real_output(golden, tmp_path):
    sup = SupervisedEncoder(
        batch=1, checkpoint_every=2,
        checkpoint_path=str(tmp_path / "ck.npz"),
    )
    ref = Encoder(batch=1, donate=False)
    for f in range(4):
        iq = sup.encode(golden["input"][f][None])
        want = np.asarray(ref.encode(golden["input"][f][None]))
        np.testing.assert_array_equal(iq, want)
    assert sup.failures == 0
    assert sup.fields_encoded == 4
    assert float(iq_health(jnp.asarray(want))) <= IQ_BOUND


def test_state_corruption_detected_and_recovered(golden, tmp_path):
    sup = SupervisedEncoder(
        batch=1, checkpoint_every=100,
        checkpoint_path=str(tmp_path / "ck.npz"),
    )
    iq0 = sup.encode(golden["input"][0][None])
    # corrupt the carried state the way a bad HBM readback would
    bad = sup.enc.state._replace(
        phasor=jnp.full_like(sup.enc.state.phasor, jnp.nan)
    )
    sup.enc.state = bad
    assert not state_healthy(bad)
    iq1 = sup.encode(golden["input"][1][None])
    assert sup.failures == 1

    # recovered stream must equal the clean sequential one
    ref = Encoder(batch=1, donate=False)
    want0 = np.asarray(ref.encode(golden["input"][0][None]))
    want1 = np.asarray(ref.encode(golden["input"][1][None]))
    np.testing.assert_array_equal(iq0, want0)
    np.testing.assert_array_equal(iq1, want1)


def test_throughput_meter_step_jitter():
    """The meter reports step-cadence stats once >=2 add_fields calls
    arrive (one gap); a single call reports none."""
    from atsc_tpu.utils.profiling import ThroughputMeter

    m = ThroughputMeter(channels=2)
    m.add_fields(2)
    assert "step_ms_max" not in m.summary()
    for _ in range(9):
        m.add_fields(2)
    s = m.summary()
    assert s["steps"] == 10
    assert 0.0 <= s["step_ms_mean"] <= s["step_ms_max"]
    assert s["step_ms_p99"] <= s["step_ms_max"]
    assert s["fields"] == 20
