"""Multi-device receive path: the time-block x channel sharded decoder
must recover TS bytes exactly equal to the sequential Decoder chain —
including cross-field state (precoder bits, interleaver image) at device
boundaries and RS correction of injected symbol errors."""

import numpy as np
import pytest

from atsc_tpu import params as P
from atsc_tpu.models.decoder import Decoder
from atsc_tpu.parallel.mesh import make_mesh
from atsc_tpu.parallel.rx_shard import ShardedDecoder, dryrun
from tests.test_decoder import _encode_symbol_fields, _random_ts


@pytest.mark.parametrize("n_time,n_ch,f_dev", [(4, 2, 1), (2, 2, 2)])
def test_rx_sharded_equals_sequential(n_time, n_ch, f_dev):
    t_total = n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(61)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts)            # (T, B, >=260416) int8

    mesh = make_mesh(n_time, n_ch)
    dec = ShardedDecoder(mesh, batch=batch, fields_per_device=f_dev)
    got_ts, nerr = dec.decode(fields)

    assert (nerr == 0).all()                      # clean: no RS corrections
    # one-field latency: output k is TS field k-1; output 0 is the
    # encoder's virtual all-zero pre-start field
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])

    # sequential cross-check of every output, including the pre-start one
    seq = Decoder(batch=batch)
    for k in range(t_total):
        seq_ts, seq_nerr = seq.decode(fields[k])
        np.testing.assert_array_equal(got_ts[k], seq_ts)
        np.testing.assert_array_equal(nerr[k], seq_nerr)

    # carried state equals the sequential decoder's exactly
    np.testing.assert_array_equal(
        np.asarray(dec.state.prev_il), np.asarray(seq.state.prev_il)
    )
    np.testing.assert_array_equal(
        np.asarray(dec.state.z2_prev), np.asarray(seq.state.z2_prev)
    )


def test_rx_sharded_multi_step_with_errors():
    """Two consecutive sharded steps stay exact across the step boundary,
    and injected symbol errors are RS-corrected identically."""
    n_time, n_ch, f_dev = 2, 2, 1
    t_total = 2 * n_time * f_dev
    batch = n_ch
    rng = np.random.default_rng(67)
    ts = _random_ts(rng, t_total, batch)
    fields = _encode_symbol_fields(ts).copy()
    # corrupt a few data symbols in field 1 (within RS's 10-byte budget)
    fields[1, 0, 5000:5012] ^= 3

    mesh = make_mesh(n_time, n_ch)
    dec = ShardedDecoder(mesh, batch=batch, fields_per_device=f_dev)
    half = n_time * f_dev
    ts_a, nerr_a = dec.decode(fields[:half])
    ts_b, nerr_b = dec.decode(fields[half:])
    got_ts = np.concatenate([ts_a, ts_b], axis=0)
    nerr = np.concatenate([nerr_a, nerr_b], axis=0)

    assert (nerr >= 0).all()                      # everything correctable
    assert dec.segments_corrected > 0             # the injection hit data
    for k in range(1, t_total):
        np.testing.assert_array_equal(got_ts[k], ts[k - 1])


def test_rx_dryrun():
    dryrun(8)
