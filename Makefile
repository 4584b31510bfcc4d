# Developer entry points (reference Makefile parity).
.PHONY: test test-unit test-integration native bench clean

test:
	python -m pytest tests/ -q

test-unit:
	python -m pytest tests/ -q -m "not slow and not integration"

test-integration:
	python -m pytest tests/ -q -m "integration or slow"

native:
	$(MAKE) -C native

bench:
	python bench.py

clean:
	$(MAKE) -C native clean
	rm -rf .pytest_cache
