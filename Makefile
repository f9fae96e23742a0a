# Developer conveniences.

.PHONY: test test-fast test-slow bench bench-ab bench-stage0 check-cache \
	native dryrun recover clean

test:
	python -m pytest tests/ -x -q

# golden/unit tests only (~minutes); the 17 e2e trainer/workflow tests are
# marked slow and run with `make test-slow`
test-fast:
	python -m pytest tests/ -m "not slow" -x -q

test-slow:
	python -m pytest tests/ -m slow -x -q

bench:
	python bench.py

# A/B of the opt-in kernels (s2d encoder, streamed PCA expand) at 160^3
bench-ab:
	python tools/bench_ab.py

# stage-0 conv variants (layouts/dtypes/s2d pair) + optional HLO dump
bench-stage0:
	python tools/bench_stage0.py

# fail if a commit changed the driver-facing traces since the cache warm
# (would silently turn the driver's bench back into a cold 160^3 compile)
check-cache:
	python tools/check_cache_trace.py --check

# run the whole post-outage runbook (bench, stage0, A/B, refine timing,
# refine TRE, artifact timing) the moment the device tunnel answers
recover:
	bash tools/post_recovery.sh

native:
	g++ -O3 -shared -fPIC liftreg_tpu/native/codec.cpp \
	    -o liftreg_tpu/native/libliftregcodec.so -lz

dryrun:
	JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
	    python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
	rm -f liftreg_tpu/native/libliftregcodec.so
