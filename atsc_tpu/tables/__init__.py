"""Host-side (numpy) table builders — the 'precompute everything' substrate.

Every table here is built once on the host and frozen into jitted device
constants; runtime stages are pure vectorized ops over them.
"""
