"""On-chip proof that the int16 dequant is bit-exact (run on a real TPU).

TPU f32 division is reciprocal-based and ~1 ulp off on most operands
(measured: 201 of 204 random peaks produced mismatches vs numpy), so
`serving._div_exact_int` selects the correctly-rounded quotient by exact
residuals instead. This script verifies, ON THE REAL CHIP:

1. `_div_exact_int` == numpy IEEE division for all 65,536 int16 codes
   against a broad spread of peak values (including every peak near full
   scale, where the worst relative errors live), bitwise.
2. `_dequantize_int16` reproduces the host decode's peak-normalized
   floats bitwise, including the -32768 encoding of peak 32768.

CPU equivalents run in-suite (tests/test_int16_exact.py); this is the
hardware leg. Last verified: 2026-08-21, 0 mismatches (371 peaks).

Usage: python scripts/verify_int16_exact_tpu.py
"""
import sys
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from birdnet_stm32_tpu.models.serving import _dequantize_int16, _div_exact_int

codes = np.arange(-32768, 32768, dtype=np.int32).astype(np.float32)
rng = np.random.default_rng(0)
peaks = np.unique(np.concatenate([rng.integers(1, 32769, 300),
                                  np.arange(32700, 32769), [1, 2, 3, 5, 7]]))

f = jax.jit(lambda c, p: _div_exact_int(c[None, :], p[:, None]))
got = np.asarray(f(jnp.asarray(codes), jnp.asarray(peaks.astype(np.float32))))
want = codes[None, :] / peaks.astype(np.float32)[:, None]
bad = got.view(np.int32) != want.view(np.int32)
print(f"TPU _div_exact_int: peaks {len(peaks)} mismatches {int(bad.sum())}")
assert not bad.any()

w = np.zeros((4, 129), np.int16)
w[0, :-1] = np.linspace(-32768, 32767, 128).astype(np.int16)
w[0, -1] = -32768  # encodes peak 32768 (doesn't fit int16)
w[1, :-1] = rng.integers(-5000, 5000, 128)
w[1, -1] = 5000
w[2, :-1] = rng.integers(-300, 300, 128)
w[2, -1] = 32767
dev = np.asarray(jax.jit(_dequantize_int16)(jnp.asarray(w)))
for i, pk in enumerate([32768, 5000, 32767, 1]):
    host = w[i, :-1].astype(np.float32) / np.float32(32768.0)
    if pk > 0:
        host = host / (np.float32(pk) / np.float32(32768.0))
    assert np.array_equal(dev[i].view(np.int32), host.view(np.int32)), i
print("TPU _dequantize_int16: bit-exact vs host normalize (incl. peak 32768)")
