"""Pallas TPU kernels (fused frontend, quantized matmul)."""
