"""Streaming driver: chunked TS input -> field-granular encode -> IQ sink.

The TPU analog of the reference's accumulate-and-fire input path
(reference src/atsc/atsc.cpp:59-77: memcpy-accumulate arbitrary packet
chunks, run process_field whenever one full field is buffered, invoke the
output callback). Differences by design:

  * B channels advance in lockstep (one batched device step encodes one
    field for every channel) — the single-channel case is B=1;
  * multiple buffered fields are encoded in one `lax.scan` device call to
    amortize dispatch;
  * the callback receives interleaved CF32 bytes per field per channel,
    bit-layout-identical to the reference's complex<float> output.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np

from atsc_tpu import params as P
from atsc_tpu.models.encoder import Encoder, iq_interleave

SinkFn = Callable[[int, np.ndarray], None]  # (channel, iq (260416, 2) f32)


class StreamingEncoder:
    """Push arbitrary-size TS byte chunks per channel; fields are encoded
    whenever every channel has at least one field buffered."""

    def __init__(self, channels: int = 1, sink: Optional[SinkFn] = None,
                 max_fields_per_step: int = 8, out_format: str = "cf32"):
        self.channels = channels
        self.sink = sink
        self.max_fields_per_step = max_fields_per_step
        self._enc = Encoder(batch=channels, out_format=out_format)
        self._buf: list[bytearray] = [bytearray() for _ in range(channels)]
        self.fields_encoded = 0

    @property
    def encoder(self) -> Encoder:
        return self._enc

    def push(self, data: bytes | np.ndarray, channel: int = 0) -> int:
        """Buffer TS bytes for one channel; encodes any complete fields
        available on ALL channels. Returns the number of fields encoded."""
        self._buf[channel].extend(bytes(data))
        return self._drain()

    def _drain(self) -> int:
        fb = P.FIELD_TS_BYTES
        ready = min(len(b) // fb for b in self._buf)
        total = 0
        while ready > 0:
            t = min(ready, self.max_fields_per_step)
            ts = np.empty((t, self.channels, fb), dtype=np.uint8)
            for c, b in enumerate(self._buf):
                chunk = bytes(b[: t * fb])
                del b[: t * fb]
                ts[:, c] = np.frombuffer(chunk, dtype=np.uint8).reshape(t, fb)
            # per-field dispatch: a lax.scan over fields costs an extra
            # stacked-output device copy of the (t, B, 2, 260480) IQ
            # (~+25% step time measured on v5e, PERF.md); the host loop's
            # dispatch latency hides behind the async device queue
            for f in range(t):
                iq = np.asarray(self._enc.encode(ts[f]))  # (B, 2, 260480)
                if self.sink is not None:
                    # interleaved (B, 260416, 2) in the wire dtype (f32
                    # CF32 by default, int16/int8 for cs16/cs8)
                    wire = iq_interleave(iq)
                    for c in range(self.channels):
                        self.sink(c, wire[c])
            self.fields_encoded += t
            total += t
            ready -= t
        return total

    def flush_partial(self) -> int:
        """Zero-pad buffered partial fields and encode them (end of stream).
        Every channel is padded to the same field count so the batch stays
        in lockstep. Returns fields encoded."""
        fb = P.FIELD_TS_BYTES
        if all(len(b) == 0 for b in self._buf):
            return 0
        target = max(-(-len(b) // fb) for b in self._buf)
        for b in self._buf:
            b.extend(bytes(target * fb - len(b)))
        return self._drain()
