from atsc_tpu.models.encoder import Encoder, EncoderState, init_state


def __getattr__(name: str):
    # receive-side classes import jit machinery lazily (keeps the TX-only
    # import path light); resolved on first attribute access
    if name in ("Decoder", "SoftDecoder"):
        from atsc_tpu.models import decoder
        return getattr(decoder, name)
    if name in ("IqReceiver", "CfoCorrector"):
        from atsc_tpu.models import receiver
        return getattr(receiver, name)
    if name == "StreamingEncoder":
        from atsc_tpu.models import streaming
        return getattr(streaming, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")


__all__ = ["Encoder", "EncoderState", "init_state", "Decoder",
           "SoftDecoder", "IqReceiver", "CfoCorrector", "StreamingEncoder"]
