"""JAX/XLA stage ops — the TPU compute path.

Every op is shaped (batch, ...) over independent 8VSB channels, statically
shaped by the A/53 numerology, and safe to jit/vmap/shard. Tables built by
atsc_tpu.tables are closed over as device constants.
"""

from atsc_tpu.ops.randomize import randomize_field
from atsc_tpu.ops.rs_encode import rs_encode_field
from atsc_tpu.ops.interleave import interleave_field, interleave_field_enc_major
from atsc_tpu.ops.trellis import trellis_encode_field
from atsc_tpu.ops.assemble import assemble_field, assemble_field_structured, field_levels
from atsc_tpu.ops.offset import apply_pilot_offset
from atsc_tpu.ops.rrc_filter import rrc_filter_field

__all__ = [
    "randomize_field",
    "rs_encode_field",
    "interleave_field",
    "interleave_field_enc_major",
    "trellis_encode_field",
    "assemble_field",
    "assemble_field_structured",
    "field_levels",
    "apply_pilot_offset",
    "rrc_filter_field",
]
