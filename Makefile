# hairfast-tpu — common targets

.PHONY: test test-slow bench dryrun native clean

# appends one wall-time line per run to SUITE_TIME.log (committed — the
# suite-cost artifact VERDICT r3 #8 asked for; keep it under 15 min warm)
test:
	@start=$$(date +%s); python -m pytest tests/ -q; rc=$$?; \
	end=$$(date +%s); \
	cache=$$(ls .jax_test_cache 2>/dev/null | wc -l); \
	echo "$$(date -u +%Y-%m-%dT%H:%MZ) tier=default rc=$$rc wall_s=$$((end-start)) cache_entries=$$cache" >> SUITE_TIME.log; \
	tail -1 SUITE_TIME.log; exit $$rc

# full suite incl. @pytest.mark.slow (heavy equality/stream/CLI tests that
# have cheaper default-tier stand-ins); logs its own SUITE_TIME line
test-slow:
	@start=$$(date +%s); HAIRFAST_SLOW_TESTS=1 python -m pytest tests/ -q; rc=$$?; \
	end=$$(date +%s); \
	cache=$$(ls .jax_test_cache 2>/dev/null | wc -l); \
	echo "$$(date -u +%Y-%m-%dT%H:%MZ) tier=slow rc=$$rc wall_s=$$((end-start)) cache_entries=$$cache" >> SUITE_TIME.log; \
	tail -1 SUITE_TIME.log; exit $$rc

bench:
	python bench.py

# exactly the driver's shape: direct call, hard 600 s budget (the round-2
# failure mode was a dryrun that passed open-ended but not under timeout)
dryrun:
	timeout 600 python -c "import __graft_entry__ as g; g.dryrun_multichip(8)"

dryrun-regen-golden:
	python __graft_entry__.py --regen-golden

native: native/libhf_loader.so

native/libhf_loader.so: native/hf_loader.cpp
	g++ -O3 -shared -fPIC $< -o $@ -ljpeg -lpng -lpthread

clean:
	rm -f native/libhf_loader.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
