# Build/test driver for the atsc_tpu framework.
#
# The Python package needs no build step (pure JAX); `native` prebuilds the
# C++ IO runtime shared library (atsc_tpu/runtime/tsio.cpp — otherwise it is
# compiled on first use), `golden` regenerates the reference golden vectors
# (requires the read-only reference checkout), `test`/`bench` run the suite
# and the one-line TPU throughput benchmark.

PY ?= python
REFERENCE ?= /root/reference

.PHONY: all native golden test bench clean

all: native

native: atsc_tpu/runtime/libtsio.so

atsc_tpu/runtime/libtsio.so: atsc_tpu/runtime/tsio.cpp
	g++ -O2 -std=c++17 -shared -fPIC -pthread $< -o $@

golden:
	REFERENCE=$(REFERENCE) bash tools/build_golden.sh

test:
	$(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

clean:
	rm -f atsc_tpu/runtime/libtsio.so
