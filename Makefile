# Developer entry points (the reference's per-language build commands —
# cargo test / go test / ./caf.py — unified).

.PHONY: test test-tpu selftest bench configs scaling native fixtures figures clean

test:
	python -m pytest tests/ -q

# User-facing golden lane on the active device (exit 0 iff all 10 exact).
selftest:
	python -m caf_cookoff_tpu selftest --data data

# Compiled on-chip golden lane (all 10 fixtures x {matmul, pallas-refine,
# stein} + pallas surface comparison on the real TPU; skips w/o one).
test-tpu:
	python -m pytest tests_tpu/ -q

bench:
	python bench.py

configs:
	python bench_configs.py 1 2 3 4 5

# Scaling efficiency over an N-device mesh (BASELINE's 1->N deliverable).
# On this rig: N=1 on the real chip; --virtual 8 validates the harness,
# shardings and collectives on virtual CPU devices.
scaling:
	python bench_scaling.py --out docs/scaling_tpu_r2.json
	python bench_scaling.py --virtual 8 --out docs/scaling_virtual8.json

# Contention-free strong-scaling measurement: N pinned-core processes
# (Gloo collectives, one XLA CPU device each) with measured
# compute-vs-collective attribution — the defensible N>=2 evidence
# (see ARCHITECTURE.md "Scaling evidence").
scaling-pinned:
	python bench_multiproc.py --out docs/scaling_pinned.json

native:
	$(MAKE) -C native

fixtures:
	python -m caf_cookoff_tpu generate --out data

figures:
	python docs/make_figures.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache caf_cookoff_tpu/__pycache__
