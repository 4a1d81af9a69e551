// Golden-vector generator for the TPU-native ATSC framework.
//
// This harness links against the READ-ONLY reference implementation's headers
// (philburr/atsc, mounted at /root/reference) and runs its encoder stages on
// deterministic inputs, dumping every stage boundary for several consecutive
// fields.  The dumps are the ground truth the JAX/TPU implementation is
// validated against (bit-exact through the FEC stages, |delta| < 1e-6 for the
// complex stages) — mirroring the reference's own golden-vector test strategy
// (reference src/atsc/test/*.cpp, vector_data.h).
//
// Build (see tools/build_golden.sh):
//   g++ -O2 -std=c++17 -mavx2 -mfma -mbmi2 -DHAVE_AVX=1 -DHAVE_FMA=1 \
//       -DHAVE_BMI2=1 -I/root/reference/src golden_gen.cpp -o golden_gen
//
// Usage: golden_gen <output_dir> <num_fields>
//
// Stage sequence replicated from the reference driver (atsc.cpp:79-90):
//   randomize -> RS(207,187) -> interleave -> trellis -> field sync ->
//   pilot offset -> RRC filter, with the interleaver double-buffer swap.

#include <cstdio>
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <functional>
#include <memory>
#include <string>
#include <array>

#include "common/atsc_parameters.h"
#include "atsc/randomize.h"
#include "atsc/reed_solomon.h"
#include "atsc/interleaver.h"
#include "atsc/trellis.h"
#include "atsc/field_sync.h"
#include "atsc/offset.h"
#include "atsc/signal.h"
#include "atsc/filter.h"

static std::string out_dir;

template <typename T>
static void dump(const std::string& name, int field, const T* data, size_t count) {
    char path[1024];
    snprintf(path, sizeof(path), "%s/%s_f%d.bin", out_dir.c_str(), name.c_str(), field);
    FILE* fp = fopen(path, "wb");
    if (!fp) { perror(path); exit(1); }
    fwrite(data, sizeof(T), count, fp);
    fclose(fp);
}

// splitmix64: deterministic input stream, re-implemented identically in
// tests (tests/util.py) so inputs need not be stored redundantly — but we
// dump them anyway for robustness.
static uint64_t splitmix64(uint64_t& s) {
    uint64_t z = (s += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

int main(int argc, char** argv) {
    if (argc < 3) { fprintf(stderr, "usage: %s <outdir> <nfields>\n", argv[0]); return 1; }
    out_dir = argv[1];
    int nfields = atoi(argv[2]);

    // Stage objects, states persist across fields exactly like the
    // reference's atsc_encoder_impl.
    auto randomizer = std::make_unique<atsc_randomize<void>>();
    auto fec        = std::make_unique<atsc_reed_solomon>();
    auto interleaver= std::make_unique<atsc_interleaver<true>>();
    auto trellis    = std::make_unique<atsc_trellis_encoder>();
    auto field_sync = std::make_unique<atsc_field_sync<void>>();
    auto offset     = std::make_unique<atsc_offset>();
    auto filter     = std::make_unique<atsc_rrc_filter>();

    auto input    = std::make_unique<atsc_field_mpeg2>();
    auto encoded  = std::make_unique<atsc_field_data>();
    auto field1   = std::make_unique<atsc_field_data>();
    auto field2   = std::make_unique<atsc_field_data>();
    auto out      = std::make_unique<aligned<atsc_field_symbol_padded>>();
    auto filtered = std::make_unique<aligned<atsc_field_symbol>>();

    atsc_field_data* cur = field1.get();
    atsc_field_data* nxt = field2.get();
    memset(field1->data(), 0, field1->size());

    atsc_reserved_symbols saved_symbols;
    for (unsigned i = 0; i < ATSC_RESERVED_SYMBOLS; i++)
        saved_symbols[i] = atsc_symbol_to_signal<atsc_symbol_type>::xform(0);

    uint64_t seed = 0x41545343ULL;  // "ATSC"

    for (int f = 0; f < nfields; f++) {
        // Deterministic TS input: 188-byte packets, 0x47 sync byte first.
        for (unsigned p = 0; p < ATSC_DATA_SEGMENTS; p++) {
            (*input)[p * ATSC_MPEG2_BYTES] = 0x47;
            for (unsigned i = 1; i < ATSC_MPEG2_BYTES; i += 8) {
                uint64_t r = splitmix64(seed);
                for (unsigned j = 0; j < 8 && i + j < ATSC_MPEG2_BYTES; j++)
                    (*input)[p * ATSC_MPEG2_BYTES + i + j] = (uint8_t)(r >> (8 * j));
            }
        }
        dump("input", f, input->data(), input->size());

        randomizer->randomize_pkts(*encoded, *input);
        dump("rand", f, encoded->data(), encoded->size());

        fec->process_field(*encoded);
        dump("rs", f, encoded->data(), encoded->size());

        interleaver->process(*cur, *nxt, *encoded);
        dump("il", f, cur->data(), cur->size());

        memset(out->data(), 0, out->size() * sizeof(atsc_symbol_type));
        trellis->process(*out, *cur);
        dump("trellis", f, (const float*)out->data(), out->size() * 2);

        field_sync->process_field(*out, saved_symbols);
        dump("sync", f, (const float*)out->data(), out->size() * 2);

        offset->process_field(*out);
        dump("offset", f, (const float*)out->data(), out->size() * 2);

        filter->process_field(*filtered, *out);
        dump("iq", f, (const float*)filtered->data(), filtered->size() * 2);

        std::swap(cur, nxt);
    }
    printf("wrote %d fields of golden vectors to %s\n", nfields, out_dir.c_str());
    return 0;
}
