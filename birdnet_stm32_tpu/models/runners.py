"""Uniform model runners: one predict() API over float and INT8-sim models.

Parity with reference models/runners.py:98-114 (KerasRunner/TFLiteRunner/
load_model_runner): a runner exposes `predict(x_batch) -> np.ndarray` so
evaluation code never cares which backend produced the scores.

- FlaxRunner: float forward of a transplanted / trained DSCNN.
- TFLiteSimRunner: the INT8 integer-graph executor (quant/tflite_import),
  running the exact TFLite arithmetic on TPU.

Runners jit per batch shape and cache; callers should batch uniformly
(pad the tail) for best performance.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp


class FlaxRunner:
    """Float32 forward over {params, batch_stats} variables.

    With a mesh, parameters are replicated and the batch sharded
    (parallel/steps.py::make_infer_fn).
    """

    def __init__(self, model, variables, cfg=None, mesh=None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.mesh = mesh
        if mesh is not None:
            from birdnet_stm32_tpu.parallel.steps import make_infer_fn

            self._infer = make_infer_fn(model, variables, mesh=mesh)
        else:
            fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
            self._infer = lambda x: fn(self.variables, x)

    def predict(self, x_batch: np.ndarray) -> np.ndarray:
        return np.asarray(self._infer(jnp.asarray(x_batch)))


class TFLiteSimRunner:
    """INT8 integer-graph executor built from a .tflite flatbuffer.

    With a mesh, the batch is sharded across devices (weights are jaxpr
    constants, replicated by GSPMD) — the v5e-8 serving configuration from
    BASELINE.json. Batches must then be divisible by the mesh size (pad via
    parallel.mesh.pad_to_multiple).
    """

    def __init__(self, tflite_path: str | Path, mesh=None, requant: str = "exact"):
        from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph, build_executor

        self.graph = TFLiteGraph(str(tflite_path))
        self.mesh = mesh
        self._requant = requant
        self._build_executor = build_executor
        self._fns: dict[int, callable] = {}

    def _fn_for(self, batch: int):
        if batch not in self._fns:
            fn = self._build_executor(self.graph, batch, requant=self._requant)
            if self.mesh is not None:
                from birdnet_stm32_tpu.parallel.mesh import batch_sharding

                data = batch_sharding(self.mesh)
                self._fns[batch] = jax.jit(fn, in_shardings=(data,), out_shardings=data)
            else:
                self._fns[batch] = jax.jit(fn)
        return self._fns[batch]

    def predict(self, x_batch: np.ndarray) -> np.ndarray:
        x = jnp.asarray(x_batch, jnp.float32)
        return np.asarray(self._fn_for(x.shape[0])(x))


def load_model_runner(model_path: str | Path, config_path: str | Path | None = None):
    """Dispatch on extension: .keras -> transplant + FlaxRunner, .tflite ->
    TFLiteSimRunner, directory -> orbax checkpoint (this framework's own)."""
    p = Path(model_path)
    if p.suffix == ".tflite":
        return TFLiteSimRunner(p)
    if p.suffix == ".keras":
        from birdnet_stm32_tpu.models.transplant import load_reference_model

        if config_path is None:
            config_path = p.with_name(p.stem + "_model_config.json")
        model, variables, cfg = load_reference_model(p, config_path)
        return FlaxRunner(model, variables, cfg)
    if p.is_dir():
        from birdnet_stm32_tpu.training.checkpoint import load_checkpoint

        model, variables, cfg = load_checkpoint(p)
        return FlaxRunner(model, variables, cfg)
    raise ValueError(f"Cannot infer runner type from {model_path}")
