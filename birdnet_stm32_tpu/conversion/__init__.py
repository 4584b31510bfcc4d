"""Conversion: Flax -> TFLite INT8 export, validation gates, reports.

TPU-native inversion of the reference's conversion layer
(conversion/quantize.py, conversion/validate.py, cli/convert.py): training
and inference live in JAX; this package exports the trained parameters to
the same deployable TFLite artifact the reference ships, with the same
quality gates (mean cosine similarity >= threshold, float32 I/O).
"""
