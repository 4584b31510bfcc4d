# Developer entry points (reference Makefile parity).
.PHONY: help install install-dev lint format format-check typecheck \
        test test-unit test-integration native bench docs clean

help: ## Show this help
	@grep -E '^[a-z-]+:.*##' $(MAKEFILE_LIST) | \
	  awk -F':.*## ' '{printf "  %-18s %s\n", $$1, $$2}'

install: ## Install the package
	pip install -e .

install-dev: ## Install with test + dev tooling extras
	pip install -e ".[test,interop,dev]"

lint: ## Run ruff linter
	python -m ruff check birdnet_stm32_tpu tests

format: ## Run ruff formatter
	python -m ruff format birdnet_stm32_tpu tests

format-check: ## Check formatting without changing files
	python -m ruff format --check birdnet_stm32_tpu tests

typecheck: ## Run mypy type checking
	python -m mypy birdnet_stm32_tpu

test: ## Run all tests
	python -m pytest tests/ -q

test-unit: ## Run unit tests only
	python -m pytest tests/ -q -m "not slow and not integration"

test-integration: ## Run integration + slow tests
	python -m pytest tests/ -q -m "integration or slow"

native: ## Build the C++ audio library
	$(MAKE) -C native

bench: ## Run the headline benchmark
	python bench.py

docs: ## Build the documentation site
	mkdocs build --strict

clean: ## Remove build and cache artifacts
	$(MAKE) -C native clean
	rm -rf .pytest_cache .mypy_cache .ruff_cache build/ dist/ *.egg-info site/
