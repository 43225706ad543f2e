.PHONY: install test test-fast test-budget bench check ci format clean

install:
	pip install -e .

test:
	python -m pytest tests/ -x -q

# inner-loop gate: skips the slow marker set (e2e CLI training,
# multi-process SPMD, torch-oracle parity) - see tests/conftest.py
test-fast:
	python -m pytest tests/ -q -m "not slow"

# Wall-time budget gate for the FULL suite (fast + slow): per-module
# timing table + fail above JOEYS2T_TEST_BUDGET_S (default 1500s = 25min)
test-budget:
	python scripts/test_budget.py

bench:
	python bench.py

bench-detail:
	python scripts/bench_detail.py

# Lint gate: fails on any finding (mirrors the reference's lint CI,
# /root/reference/.github/workflows/main.yml:44-51 — yapf/pylint/flake8 there;
# neither pyflakes nor flake8 ships in this image, so the gate is first-party).
check:
	python scripts/lint.py

# Full CI gate: lint + the complete pytest suite on the virtual 8-device CPU
# mesh (tests/conftest.py sets XLA_FLAGS/JAX_PLATFORMS). Fails on any lint
# finding or test regression.
ci: check
	python -m pytest tests/ -q

clean:
	rm -rf __pycache__ .pytest_cache build dist *.egg-info
	find . -name "*.pyc" -delete
