"""Deployment/serving configuration and export surface.

The reference's deploy layer drives an external toolchain (stedgeai +
board flashing). The TPU analog is the serving stack: resolved
configuration for the batch-inference driver (cli/benchmark.py) and the
TFLite export path (conversion/), with the same configuration-resolution
semantics (CLI > env > config file, JSON/TOML dual format,
deploy/config.py:80-135).
"""
