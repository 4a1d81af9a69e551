from atsc_tpu.models.encoder import Encoder, EncoderState, init_state

__all__ = ["Encoder", "EncoderState", "init_state"]
