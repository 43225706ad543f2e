.PHONY: install test bench check format clean

install:
	pip install -e .

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-detail:
	python scripts/bench_detail.py

check:
	python -m pyflakes joeys2t_tpu scripts tests 2>/dev/null || true

clean:
	rm -rf __pycache__ .pytest_cache build dist *.egg-info
	find . -name "*.pyc" -delete
