# Development entry points. `make test` is the CI surface: the full
# suite on the virtual 8-device CPU mesh (hermetic, no TPU needed).

PYTEST ?= python -m pytest

.PHONY: test test-fast bench dryrun lint

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTEST) tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTEST) tests/ -q -x -m "not slow"

bench:
	timeout 600 python bench.py

dryrun:
	python __graft_entry__.py

lint:
	python -m compileall -q wild_visual_navigation_tpu tools benchmarks tests
