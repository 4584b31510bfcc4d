"""Real-chip validation + benchmark of the fused Pallas hybrid frontend.

Compares the VMEM-resident Mosaic kernel (ops/pallas/frontend_kernel.py)
against the XLA matmul-STFT composition (ops/stft.py + ops/spectrogram.py)
on the flagship geometry, three ways:

1. numerics  — max |diff| of the [B, F, W, 1] features at B=32;
2. frontend  — sustained chunks/s, XLA vs Pallas over a batch_tile sweep;
3. end-to-end — INT8 executor fed by each frontend: throughput + score
   agreement (the bit-exact headline must not regress through f32
   summation-order changes flipping int8 rounding).

Usage: python scripts/bench_pallas_frontend.py [B]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(__import__("pathlib").Path(__file__).resolve().parents[1]))

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")

from birdnet_stm32_tpu.config import ModelConfig  # noqa: E402
from birdnet_stm32_tpu.ops.frontend import inputs_for_config  # noqa: E402
from birdnet_stm32_tpu.ops.pallas.frontend_kernel import fused_hybrid_frontend  # noqa: E402
from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec  # noqa: E402

CKPT = "/root/reference/checkpoints/birdnet_stm32n6_100"


def main() -> None:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = ModelConfig.load(f"{CKPT}_model_config.json")
    T = cfg.chunk_samples
    hop = max(1, T // cfg.spec_width)
    n_frames = min(cfg.spec_width, 1 + T // hop)
    print(f"[cfg] T={T} n_fft={cfg.fft_length} hop={hop} W={n_frames} B={B}",
          flush=True)

    rng = np.random.default_rng(0)
    small = jnp.asarray(rng.normal(size=(32, T)).astype(np.float32))

    # --- 1. numerics ----------------------------------------------------
    # Measured 2026-08-17 on the tunneled axon backend: Mosaic compile
    # fails (remote_compile HTTP 500 — the helper loses TPU topology, see
    # docs/performance.md "Known backend caveats"). On such backends this
    # script still reports the XLA-path numbers so the comparison baseline
    # is fresh when Mosaic becomes available.
    ref = np.asarray(inputs_for_config(small, cfg))
    pallas_ok = True
    try:
        t0 = time.time()
        out = np.asarray(fused_hybrid_frontend(
            small, cfg.fft_length, hop, n_frames, batch_tile=8))[..., None]
        print(f"[pallas] compiled+ran in {time.time() - t0:.1f}s", flush=True)
        d = np.abs(out - ref)
        print(f"[numerics] max|diff|={d.max():.3e} mean={d.mean():.3e} "
              f"frac>1e-6={(d > 1e-6).mean():.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        pallas_ok = False
        print(f"[pallas] COMPILE FAILED: {type(e).__name__}: {str(e)[:300]}")
        print("[pallas] continuing with XLA-path numbers only", flush=True)

    # --- 2. frontend throughput -----------------------------------------
    wave = jnp.asarray(rng.normal(size=(B, T)).astype(np.float32))

    xla_fn = jax.jit(lambda w: inputs_for_config(w, cfg).sum())
    r = sustained_chunks_per_sec(xla_fn, wave)
    print(f"[frontend] XLA HIGHEST: {r:,.0f} chunks/s ({1e6 / r:.1f} us/chunk)",
          flush=True)
    if pallas_ok:
        fn = jax.jit(lambda w: fused_hybrid_frontend(
            w, cfg.fft_length, hop, n_frames).sum())
        try:
            r = sustained_chunks_per_sec(fn, wave)
            print(f"[frontend] pallas per-sample: {r:,.0f} chunks/s "
                  f"({1e6 / r:.1f} us/chunk)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[frontend] pallas per-sample: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)
    # Round-5 batched-tile formulation (sublane-stacked samples): validate
    # numerics per tile, then measure.
    for tile in (2, 4, 8, 16) if pallas_ok else ():
        if B % tile:
            continue
        try:
            got = np.asarray(fused_hybrid_frontend(
                small, cfg.fft_length, hop, n_frames, batch_tile=tile,
                grid="tile"))[..., None]
            d = np.abs(got - ref).max()
            fn = jax.jit(lambda w, t=tile: fused_hybrid_frontend(
                w, cfg.fft_length, hop, n_frames, batch_tile=t,
                grid="tile").sum())
            r = sustained_chunks_per_sec(fn, wave)
            print(f"[frontend] pallas tile-grid tile={tile}: {r:,.0f} chunks/s "
                  f"({1e6 / r:.1f} us/chunk) max|diff|={d:.3e}", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"[frontend] pallas tile-grid tile={tile}: FAILED "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # --- 3. end-to-end INT8 ----------------------------------------------
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    graph = TFLiteGraph(f"{CKPT}.tflite")
    fwd = build_executor(graph, batch_size=B)

    def classify_xla(w):
        return fwd(inputs_for_config(w, cfg)).sum()

    def classify_pallas(w, tile=8):
        x = fused_hybrid_frontend(w, cfg.fft_length, hop, n_frames,
                                  batch_tile=tile)[..., None]
        return fwd(x).sum()

    r = sustained_chunks_per_sec(jax.jit(classify_xla), wave)
    print(f"[e2e] INT8 + XLA frontend:    {r:,.0f} chunks/s "
          f"({1e6 / r:.1f} us/chunk)", flush=True)
    if not pallas_ok:
        return
    r = sustained_chunks_per_sec(jax.jit(classify_pallas), wave)
    print(f"[e2e] INT8 + pallas frontend: {r:,.0f} chunks/s "
          f"({1e6 / r:.1f} us/chunk)", flush=True)

    # Score agreement on the small batch (executor is bit-exact given
    # identical inputs; this measures int8 rounding flips from the
    # frontends' different f32 summation orders).
    fwd32 = build_executor(graph, batch_size=32)
    a = np.asarray(jax.jit(lambda w: fwd32(inputs_for_config(w, cfg)))(small))
    b = np.asarray(jax.jit(lambda w: fwd32(fused_hybrid_frontend(
        w, cfg.fft_length, hop, n_frames, batch_tile=8)[..., None]))(small))
    cos = np.array([np.dot(x, y) / (np.linalg.norm(x) * np.linalg.norm(y) + 1e-12)
                    for x, y in zip(a, b)])
    print(f"[e2e] score agreement: identical={np.array_equal(a, b)} "
          f"min_cosine={cos.min():.6f} max|dscore|={np.abs(a - b).max():.3e}",
          flush=True)


if __name__ == "__main__":
    main()
