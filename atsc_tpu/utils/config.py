"""Typed runtime configuration (SURVEY.md §5.6).

The reference hardcodes everything except driver/frequency/gain CLI flags
(reference util/atsc_encoder.cpp:22-29, util/defaults.h). The DSP
numerology stays compile-time constant here too (atsc_tpu/params.py);
this config covers the deployment shape: channels, sharding, sinks,
pacing, and the SDR-facing metadata carried through to sinks.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class EncoderConfig:
    channels: int = 1              # independent 8VSB streams (batch axis)
    fields_per_step: int = 8       # fields encoded per device dispatch
    # sharding (multi-device): mesh axes; 1 = axis unused
    n_time: int = 1                # field time-block shards (SP analog)
    n_ch: int = 1                  # channel shards (DP analog)
    # IO
    mux: bool = False              # FDM-combine all channels into one
    #                                wideband multiplex at channels*6 MHz
    sink: str = "null"             # "null" | "-" | file path
    realtime: bool = False         # pace the sink to the 8VSB sample clock
    out_format: str = "cf32"       # "cf32" | "cs16" | "cs8" wire format
    rate: object = None            # output sample rate (samples/s, exact
    #                                Fraction preferred; None = nominal):
    #                                resample the baseband to an arbitrary
    #                                SDR master clock before the sink
    ppm: float = 0.0               # emulated transmit clock error (parts
    #                                per million; the TX mirror of the
    #                                receiver's --sro — scales the output
    #                                rate by 1 + ppm/1e6)
    # SDR-facing metadata (not used on the compute path; carried for
    # parity with the reference's -d/-f/-g flags, util/defaults.h:3-5)
    frequency_hz: float = 473_000_000.0
    gain_db: float = 54.0
    driver: str = "file"

    def validate(self) -> "EncoderConfig":
        assert self.channels >= 1
        assert self.channels % max(self.n_ch, 1) == 0, (
            "channels must divide evenly over channel shards"
        )
        assert self.fields_per_step >= 1
        assert self.out_format in ("cf32", "cs16", "cs8")
        return self
