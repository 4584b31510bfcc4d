# Developer entry points (reference Makefile parity).
.PHONY: help install install-dev install-docs lint format format-check \
        typecheck test test-unit test-integration test-cov native bench \
        train convert evaluate deploy docs docs-serve clean

help: ## Show this help
	@grep -E '^[a-z-]+:.*##' $(MAKEFILE_LIST) | \
	  awk -F':.*## ' '{printf "  %-18s %s\n", $$1, $$2}'

install: ## Install the package
	pip install -e .

install-dev: ## Install with test + dev tooling extras
	pip install -e ".[test,interop,dev]"

install-docs: ## Install docs extras only
	pip install -e ".[docs]"

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

test-cov: ## Run tests with coverage report
	python -m pytest tests/ -v --cov=birdnet_stm32_tpu --cov-report=term-missing

native: ## Build the C++ audio library
	$(MAKE) -C native

bench: ## Run the headline benchmark
	python bench.py

train: ## Train a model (pass ARGS="..." for extra arguments)
	python train.py $(ARGS)

convert: ## Convert model to TFLite (pass ARGS="..." for extra arguments)
	python convert.py $(ARGS)

evaluate: ## Evaluate a model (pass ARGS="..." for extra arguments)
	python test.py $(ARGS)

deploy: ## Build a deployment bundle (pass ARGS="..." for extra arguments)
	python -m birdnet_stm32_tpu deploy $(ARGS)

docs: ## Build the documentation site
	mkdocs build --strict

docs-serve: ## Serve documentation locally
	mkdocs serve

clean: ## Remove build and cache artifacts
	$(MAKE) -C native clean
	rm -rf .pytest_cache .mypy_cache .ruff_cache build/ dist/ *.egg-info site/
