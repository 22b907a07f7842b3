# Test tiers. Bare `pytest` (or `make test`) runs the FULL suite including
# the slow torch-equivalence / e2e / multiproc tests; `make fast` is the
# ~3-minute development tier.
.PHONY: test fast bench

test:
	python -m pytest tests/ -q

fast:
	python -m pytest tests/ -q -m 'not slow'

bench:
	python bench.py
