"""Pack raw golden-vector dumps from tools/golden_gen.cpp into one compressed npz.

Shapes follow the reference buffer types (reference src/common/atsc_parameters.h:20-26):
  input:   (312*188,)  uint8      raw TS field
  rand:    (64584,)    uint8      randomizer output (parity slots zeroed)
  rs:      (64584,)    uint8      RS(207,187) encoded field
  il:      (64584,)    uint8      interleaved current field
  trellis: (261248,)   complex64  padded symbol field, non-data slots zero
  sync:    (261248,)   complex64  after segment/field sync insertion
  offset:  (261248,)   complex64  after pilot/frequency offset
  iq:      (260416,)   complex64  final RRC-filtered baseband IQ
"""
import sys
import numpy as np

STAGES = {
    "input": (312 * 188, np.uint8),
    "rand": (64584, np.uint8),
    "rs": (64584, np.uint8),
    "il": (64584, np.uint8),
    "trellis": (261248, np.complex64),
    "sync": (261248, np.complex64),
    "offset": (261248, np.complex64),
    "iq": (260416, np.complex64),
}


def main(raw_dir: str, out_path: str, nfields: int) -> None:
    arrays = {}
    for stage, (n, dtype) in STAGES.items():
        fields = []
        for f in range(nfields):
            raw_dtype = np.float32 if dtype == np.complex64 else dtype
            a = np.fromfile(f"{raw_dir}/{stage}_f{f}.bin", dtype=raw_dtype)
            if dtype == np.complex64:
                a = a[0::2].astype(np.complex64) + 1j * a[1::2].astype(np.complex64)
            assert a.shape == (n,), (stage, f, a.shape)
            fields.append(a)
        arrays[stage] = np.stack(fields)
    np.savez_compressed(out_path, **arrays)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]))
