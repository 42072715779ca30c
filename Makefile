# Development entry points. `make test` is the CI surface: the full
# suite on the virtual 8-device CPU mesh (hermetic, no TPU needed).

PYTEST ?= python -m pytest

.PHONY: test test-fast bench bench-all soak dryrun lint

test:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTEST) tests/ -q

test-fast:
	PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu $(PYTEST) tests/ -q -x -m "not slow"

bench:
	timeout 600 python bench.py

# Every README performance claim, one regenerable artifact (results/bench_r05.json).
bench-all:
	timeout 4800 python benchmarks/bench_all.py

# Long-horizon soak at production shape (results/soak_r05.json).
soak:
	timeout 3600 python tools/soak.py

# Config-5 endurance soak: 4-cam ViT-B @644 product runtime, pixelwise,
# >= 1 h wall (results/soak_config5.json).
soak-config5:
	timeout 7200 python tools/soak.py --product --cameras 4 --size 644 \
		--backbone vit_base --pixelwise --frames 240000 --window 2000 \
		--out results/soak_config5.json

dryrun:
	python __graft_entry__.py

lint:
	python -m compileall -q wild_visual_navigation_tpu tools benchmarks tests
