"""StableHLO export of the full serving function via jax.export.

The portable-artifact counterpart to the TFLite path (SURVEY.md §7 item 8):
one serialized StableHLO module containing frontend + model (optionally the
bit-exact INT8 integer graph), loadable by any StableHLO consumer — newer
JAX versions, IREE, or XLA runtimes — without this framework installed.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
from jax import export as jexport

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.ops.frontend import inputs_for_config


def export_serving_fn(model, variables: dict, cfg: ModelConfig,
                      batch_size: int = 64,
                      include_frontend: bool = True,
                      platform: str | None = None) -> bytes:
    """Serialize waveform->scores (or features->scores) to StableHLO bytes.

    Args:
        model, variables: Trained Flax model (any class_activation).
        cfg: Model config (input geometry).
        batch_size: Static batch size baked into the module.
        include_frontend: True = input is [B, T] waveforms; False = input is
            the model-input feature tensor.
        platform: Lowering platform (default: current backend).

    Returns:
        Serialized StableHLO module bytes (jax.export format).
    """
    if include_frontend:
        def fn(wave):
            return model.apply(variables, inputs_for_config(wave, cfg), train=False)

        spec = jax.ShapeDtypeStruct((batch_size, cfg.chunk_samples), jnp.float32)
    else:
        def fn(x):
            return model.apply(variables, x, train=False)

        spec = jax.ShapeDtypeStruct((batch_size, *cfg.input_shape()), jnp.float32)

    platforms = [platform] if platform else None
    exported = jexport.export(jax.jit(fn), platforms=platforms)(spec)
    return exported.serialize()


def export_int8_serving_fn(tflite_path: str | Path, cfg: ModelConfig,
                           batch_size: int = 64,
                           platform: str | None = None) -> bytes:
    """Serialize waveform -> INT8-executor scores to StableHLO bytes."""
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

    graph = TFLiteGraph(str(tflite_path))
    fwd = build_executor(graph, batch_size=batch_size)

    def fn(wave):
        return fwd(inputs_for_config(wave, cfg))

    spec = jax.ShapeDtypeStruct((batch_size, cfg.chunk_samples), jnp.float32)
    platforms = [platform] if platform else None
    exported = jexport.export(jax.jit(fn), platforms=platforms)(spec)
    return exported.serialize()


def load_serving_fn(data: bytes):
    """Deserialize an exported module; returns a callable jax function."""
    exported = jexport.deserialize(data)
    return lambda *args: exported.call(*args)
