# Build/test driver for the atsc_tpu framework.
#
# The Python package needs no build step (pure JAX); `native` prebuilds the
# C++ IO runtime shared library (atsc_tpu/runtime/tsio.cpp — otherwise it is
# compiled on first use), `golden` regenerates the reference golden vectors
# (requires the read-only reference checkout), `test`/`bench` run the suite
# and the one-line TPU throughput benchmark.

PY ?= python
REFERENCE ?= /root/reference

.PHONY: all native golden test bench sanitize sanitize-asan sanitize-tsan clean

all: native

native: atsc_tpu/runtime/libtsio.so

atsc_tpu/runtime/libtsio.so: atsc_tpu/runtime/tsio.cpp
	g++ -O2 -std=c++17 -ffp-contract=off -shared -fPIC -pthread $< -o $@

# Sanitized builds of the threaded native IO runtime (threaded SPSC rings,
# UDP/RTP parsing — exactly the code class sanitizers exist for; the
# reference wires ASAN on by default, src/CMakeLists.txt:7-10). `make
# sanitize` runs the jax-free stress driver tools/tsio_stress.py (every
# exported entry point, concurrent producers/consumers, teardown churn)
# once under ASan+UBSan and once under TSan. It is jax-free because XLA
# itself aborts with the ASan interceptors preloaded; the instrumented
# library is what's under test, loaded via its explicit path.
atsc_tpu/runtime/libtsio_asan.so: atsc_tpu/runtime/tsio.cpp
	g++ -O1 -g -std=c++17 -ffp-contract=off -shared -fPIC -pthread \
	    -fsanitize=address,undefined -fno-omit-frame-pointer $< -o $@

atsc_tpu/runtime/libtsio_tsan.so: atsc_tpu/runtime/tsio.cpp
	g++ -O1 -g -std=c++17 -ffp-contract=off -shared -fPIC -pthread \
	    -fsanitize=thread -fno-omit-frame-pointer $< -o $@

sanitize: sanitize-asan sanitize-tsan

sanitize-asan: atsc_tpu/runtime/libtsio_asan.so
	LD_PRELOAD=$$(g++ -print-file-name=libasan.so) \
	ASAN_OPTIONS=detect_leaks=0:abort_on_error=1 \
	UBSAN_OPTIONS=halt_on_error=1:print_stacktrace=1 \
	$(PY) tools/tsio_stress.py $(CURDIR)/atsc_tpu/runtime/libtsio_asan.so

sanitize-tsan: atsc_tpu/runtime/libtsio_tsan.so
	LD_PRELOAD=$$(g++ -print-file-name=libtsan.so) \
	TSAN_OPTIONS=halt_on_error=1 \
	$(PY) tools/tsio_stress.py $(CURDIR)/atsc_tpu/runtime/libtsio_tsan.so

golden:
	REFERENCE=$(REFERENCE) bash tools/build_golden.sh

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f atsc_tpu/runtime/libtsio.so
