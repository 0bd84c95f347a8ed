# hairfast-tpu — common targets

.PHONY: test test-slow bench dryrun native clean

test:
	python -m pytest tests/ -x -q

test-slow:
	HAIRFAST_SLOW_TESTS=1 python -m pytest tests/ -x -q

bench:
	python bench.py

dryrun:
	XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
	python __graft_entry__.py

native: native/libhf_loader.so

native/libhf_loader.so: native/hf_loader.cpp
	g++ -O3 -shared -fPIC $< -o $@ -ljpeg -lpng -lpthread

clean:
	rm -f native/libhf_loader.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
