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
    """Float forward over {params, batch_stats} variables.

    With a mesh, parameters are replicated and the batch sharded
    (parallel/steps.py::make_infer_fn). With dtype=jnp.bfloat16, parameters
    and activations run in bf16 on the MXU (outputs return float32) —
    ~70% more serving throughput than the INT8 simulation on TPU at
    cosine ~0.9997 vs float32 (scripts/bench_float_vs_int8.py).
    """

    def __init__(self, model, variables, cfg=None, mesh=None, dtype=None):
        if dtype is not None:
            variables = jax.tree_util.tree_map(
                lambda a: a.astype(dtype)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a, variables)
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.mesh = mesh
        self.dtype = dtype
        if mesh is not None:
            from birdnet_stm32_tpu.parallel.steps import make_infer_fn

            self._infer = make_infer_fn(model, variables, mesh=mesh, dtype=dtype)
        elif dtype is None:
            fn = jax.jit(lambda v, x: model.apply(v, x, train=False))
            self._infer = lambda x: fn(self.variables, x)
        else:  # bf16 serving: cast features in, float32 scores out
            fn16 = jax.jit(lambda v, x: model.apply(
                v, x.astype(dtype), train=False).astype(jnp.float32))
            self._infer = lambda x: fn16(self.variables, x)

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


class TFLiteInterpreterRunner:
    """TFLite interpreter fallback for graphs the integer executor cannot
    run on-device (dynamic-range / float exports). Reference runners.py:48-95
    semantics: builtin ops, no delegates, dynamic batch resize."""

    def __init__(self, tflite_path: str | Path):
        import tensorflow as tf

        self._path = str(tflite_path)
        self._tf = tf
        self._interp = self._make_interp()
        self._interp.allocate_tensors()

    def _make_interp(self):
        # No delegates (reference runners.py:48-95): XNNPack refuses to
        # prepare some quantized graphs (REDUCE_MAX/DIV chains) entirely.
        return self._tf.lite.Interpreter(
            model_path=self._path,
            experimental_op_resolver_type=self._tf.lite.experimental.OpResolverType
            .BUILTIN_WITHOUT_DEFAULT_DELEGATES)

    def _invoke(self, x: np.ndarray) -> np.ndarray:
        inp = self._interp.get_input_details()[0]
        if inp["shape"][0] != x.shape[0]:
            self._interp.resize_tensor_input(inp["index"], (x.shape[0], *inp["shape"][1:]))
            self._interp.allocate_tensors()
            inp = self._interp.get_input_details()[0]
        self._interp.set_tensor(inp["index"], x)
        self._interp.invoke()
        return np.asarray(self._interp.get_tensor(self._interp.get_output_details()[0]["index"]))

    def predict(self, x_batch: np.ndarray) -> np.ndarray:
        x = np.asarray(x_batch, np.float32)
        try:
            return self._invoke(x)
        except RuntimeError:
            # Some graphs refuse dynamic batch resize under the XNNPack
            # delegate, and a failed AllocateTensors leaves the interpreter
            # unusable — rebuild it, then invoke per sample.
            self._interp = self._make_interp()
            self._interp.allocate_tensors()
            return np.concatenate([self._invoke(x[i : i + 1]) for i in range(x.shape[0])])


def _is_full_int8(graph) -> bool:
    """True when every conv/FC in the graph carries int8 quantization."""
    for op in graph.ops:
        if op.name in ("CONV_2D", "DEPTHWISE_CONV_2D", "FULLY_CONNECTED"):
            for idx in op.inputs[:2]:
                t = graph.tensors[idx]
                if t.dtype != "int8" or t.scale is None:
                    return False
    return True


def load_model_runner(model_path: str | Path, config_path: str | Path | None = None,
                      dtype=None):
    """Dispatch on extension: .keras -> transplant + FlaxRunner, .tflite ->
    TFLiteSimRunner (full-int8) or interpreter fallback, directory -> this
    framework's own checkpoint.

    dtype applies to float (Flax) runners only: jnp.bfloat16 serves the
    model in bf16 (fastest path on TPU, cosine ~0.9997 vs float32).
    """
    p = Path(model_path)
    if p.suffix == ".tflite":
        sim = TFLiteSimRunner(p)
        if _is_full_int8(sim.graph):
            return sim
        return TFLiteInterpreterRunner(p)
    if p.suffix == ".keras":
        from birdnet_stm32_tpu.training.checkpoint import keras_run_dir

        run_equiv = keras_run_dir(p)
        if run_equiv is not None:
            # Train's --checkpoint_path .keras name maps to a run directory
            # (cli/train.py); accept the same spelling here so the
            # documented train->evaluate flow works verbatim.
            from birdnet_stm32_tpu.training.checkpoint import load_checkpoint

            model, variables, cfg = load_checkpoint(run_equiv)
            return FlaxRunner(model, variables, cfg, dtype=dtype)
        from birdnet_stm32_tpu.models.transplant import load_reference_model

        if config_path is None:
            config_path = p.with_name(p.stem + "_model_config.json")
        model, variables, cfg = load_reference_model(p, config_path)
        return FlaxRunner(model, variables, cfg, dtype=dtype)
    if p.is_dir():
        from birdnet_stm32_tpu.training.checkpoint import load_checkpoint

        model, variables, cfg = load_checkpoint(p)
        return FlaxRunner(model, variables, cfg, dtype=dtype)
    raise ValueError(f"Cannot infer runner type from {model_path}")
