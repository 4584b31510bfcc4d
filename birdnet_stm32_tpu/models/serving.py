"""Fused waveform -> scores classification for serving and evaluation.

One XLA dispatch per batch when the runner is device-side: the frontend
(STFT/mel matmuls) and the model (Flax forward or INT8 integer graph)
compile into a single program. On tunneled backends every blocking host
transfer costs ~28 ms, so collapsing the two stages roughly halves serving
latency; on any backend it removes an HBM round-trip of the feature tensor.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.ops.frontend import inputs_for_config


def make_fused_classifier(runner, cfg):
    """waveform batch [B, T] -> scores [B, C], fused when possible.

    Falls back to frontend-then-predict for non-jittable runners (the
    TFLite interpreter).
    """
    if hasattr(runner, "graph"):  # TFLiteSimRunner: fuse executor + frontend
        from birdnet_stm32_tpu.quant.tflite_import import build_executor

        fns = {}

        def classify(wave: np.ndarray) -> np.ndarray:
            b = wave.shape[0]
            if b not in fns:
                fwd = build_executor(runner.graph, batch_size=b,
                                     requant=getattr(runner, "_requant", "exact"))
                fns[b] = jax.jit(lambda w: fwd(inputs_for_config(w, cfg)))
            return np.asarray(fns[b](jnp.asarray(wave)))

        return classify

    if hasattr(runner, "model"):  # FlaxRunner
        fused = jax.jit(lambda v, w: runner.model.apply(
            v, inputs_for_config(w, cfg), train=False))

        def classify(wave: np.ndarray) -> np.ndarray:
            return np.asarray(fused(runner.variables, jnp.asarray(wave)))

        return classify

    frontend = jax.jit(lambda w: inputs_for_config(w, cfg))

    def classify(wave: np.ndarray) -> np.ndarray:
        return np.asarray(runner.predict(np.asarray(frontend(jnp.asarray(wave)))))

    return classify
