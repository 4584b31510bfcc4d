"""Evaluation: chunk->file pooling, metrics, threshold optimization, reports."""
