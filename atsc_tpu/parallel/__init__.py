"""Multi-device parallelism: channel sharding (the DP analog), field
time-block sharding with O(1)-state exchange (the SP/CP analog), and
overlap-save halo exchange for intra-field sample sharding.

The reference is single-threaded (SURVEY.md §2: no parallelism of any
kind); everything here is new TPU-first design.
"""
