# Entry points for the standard workflows.
.PHONY: test quality bench scaling stress

test:
	python -m pytest tests/ -x -q

# Regenerates PARITY.md's headline quality table (trains 12 tiny epochs,
# scores full / dead-sensor / per-solver MOTA); fails below 0.90 MOTA.
quality:
	python scripts/quality_run.py

# One-chip KITTI-scale throughput at the reference-faithful operating
# point (crop 224 / 512 points per det); prints one JSON line.
bench:
	python bench.py

# Multi-device scaling harness (virtual CPU mesh on single-chip hosts;
# MMMOT_SCALING_REAL=1 on real pods); asserts partition bit-exactness.
scaling:
	python scripts/bench_scaling.py

# Exact-solver stress proof at KITTI scale (1024 instances, N=64,
# vs the native C++ Hungarian oracle).
stress:
	python tests/assoc_stress_runner.py
