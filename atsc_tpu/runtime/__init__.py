"""Native runtime: threaded TS ingestion and IQ sinks (C++ + ctypes)."""

from atsc_tpu.runtime.io import IqSink, TsReader, native_available

__all__ = ["IqSink", "TsReader", "native_available"]
