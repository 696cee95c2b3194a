# Top-level build/test entry points.

.PHONY: all native test test-fast test-native release-check bench serve clean

all: native

native:
	$(MAKE) -C zero_latency_yolo_tpu/native

test: native
	python -m pytest tests/ -q

test-fast: native
	python -m pytest tests/test_protocol.py tests/test_config.py \
	  tests/test_tracker.py tests/test_native_codec.py -q

test-native:
	$(MAKE) -C zero_latency_yolo_tpu/native test-native

# One-command acceptance: native ASan/UBSan + fuzz, full suite (virtual
# 8-device CPU mesh), bench mechanics. ~25 min on a 1-core host.
release-check: test-native test bench-smoke
	@echo "release-check: all green"

bench:
	python bench.py

bench-smoke:
	ZLT_BENCH_SMOKE=1 python bench.py

serve: native
	python -m zero_latency_yolo_tpu.runtime.server --config configs/server.json

clean:
	$(MAKE) -C zero_latency_yolo_tpu/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
