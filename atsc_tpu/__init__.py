"""atsc_tpu — a TPU-native ATSC 8VSB modulation framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the
reference C++ encoder (philburr/atsc): MPEG-TS in, baseband complex IQ out,
bit-exact through the FEC/trellis stages, scalable over device meshes by
channel and time-block sharding.
"""

__version__ = "0.1.0"
