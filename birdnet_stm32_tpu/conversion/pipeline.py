"""End-to-end conversion pipeline: checkpoint -> TFLite + gates + report.

Parity with reference cli/convert.py:74-233: stratified calibration
sampling, INT8 PTQ (or dynamic-range), multi-seed validation with
worst-case aggregation, a hard mean-cosine gate, validation-sample NPZ,
and a JSON report with the compression ratio. Validation runs the exported
flatbuffer through this framework's own bit-exact INT8 executor
(quant/tflite_import) on the accelerator — no TFLite interpreter needed in
the serving path.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
from birdnet_stm32_tpu.models.runners import FlaxRunner, TFLiteSimRunner
from birdnet_stm32_tpu.quant.calibrate import (
    random_representative_inputs,
    representative_inputs,
    stratified_sample_paths,
)
from birdnet_stm32_tpu.quant.validate import validate_runners
from birdnet_stm32_tpu.utils.logging import info, ok, warn


def convert_model(
    model,
    variables: dict,
    cfg: ModelConfig,
    out_path: str | Path,
    calibration_paths: list[str] | None = None,
    calibration_labels: list[str] | None = None,
    calibration_per_class: int = 10,
    num_calibration_samples: int = 100,
    calibration_inputs: np.ndarray | None = None,
    validation_inputs: np.ndarray | None = None,
    quantize: str = "int8",
    per_channel: bool = True,
    min_cosine_sim: float = 0.95,
    num_validation_seeds: int = 1,  # clamped to >= 1
    num_validation_samples: int = 64,
    save_npz: bool = True,
    class_activation: str | None = None,
    seed: int = 0,
) -> dict:
    """Convert a trained model to TFLite with the reference's quality gates.

    Args:
        model, variables, cfg: The trained Flax model.
        out_path: Destination .tflite path.
        calibration_paths / calibration_labels: Audio files (+ class labels
            for stratified sampling) used to build calibration inputs.
        calibration_inputs: Pre-built [N, ...] calibration tensors
            (bypasses the audio path; used by tests).
        validation_inputs: [N, ...] tensors for the cosine gate; defaults
            to the calibration inputs.
        quantize: 'int8' | 'dynamic' | 'float'.
        min_cosine_sim: Hard gate on mean cosine (reference convert.py:187-195).
        num_validation_seeds: Repeat validation with shuffled subsets and
            keep the worst-case aggregate (reference convert.py:154-180).

    Returns:
        Report dict (also written next to the artifact as *_report.json).

    Raises:
        RuntimeError: When the mean cosine gate fails.
    """
    out_path = Path(out_path)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    t0 = time.perf_counter()

    if class_activation is None:
        # Default from the model itself (cli/convert.py does the same):
        # exporting softmax onto a sigmoid (multilabel) model would gate
        # mismatched output spaces AND ship wrong serving probabilities.
        class_activation = getattr(model, "class_activation", "softmax")

    if calibration_inputs is None and quantize == "int8":
        # Calibration is only consumed by full-INT8 PTQ; 'dynamic'/'float'
        # modes skip the decode + device-frontend cost entirely.
        if not calibration_paths:
            # Reference cli/convert.py:124-144: no data directory falls
            # back to a random representative dataset.
            warn("convert", "no calibration audio provided; generating a "
                            "random representative dataset")
            calibration_inputs = random_representative_inputs(
                cfg, num_samples=num_calibration_samples, seed=seed)
        else:
            if calibration_labels is not None:
                calibration_paths = stratified_sample_paths(
                    calibration_paths, calibration_labels,
                    calibration_per_class, seed)
            calibration_inputs = representative_inputs(
                calibration_paths, cfg, num_samples=num_calibration_samples,
                seed=seed)
    if calibration_inputs is not None:
        info("convert", f"{len(calibration_inputs)} calibration samples, mode={quantize}")

    tflite_bytes = convert_to_tflite(
        variables, cfg, representative=calibration_inputs, quantize=quantize,
        class_activation=class_activation, per_channel=per_channel)
    out_path.write_bytes(tflite_bytes)
    ok("convert", f"wrote {out_path} ({len(tflite_bytes):,} B)")

    if validation_inputs is None:
        validation_inputs = calibration_inputs  # None in dynamic/float modes (no gate)
    float_runner = FlaxRunner(model, variables, cfg)
    quant_runner = TFLiteSimRunner(out_path) if quantize == "int8" else None

    report: dict = {
        "model_path": str(out_path),
        "quantize": quantize,
        "class_activation": class_activation,
        "tflite_bytes": len(tflite_bytes),
        "float32_bytes": 4 * sum(int(np.prod(np.shape(p)))
                                 for p in _tree_leaves(variables["params"])),
    }
    report["compression_ratio"] = report["float32_bytes"] / max(1, report["tflite_bytes"])

    if quant_runner is not None:
        rng = np.random.default_rng(seed)
        worst: dict | None = None
        for s in range(max(1, num_validation_seeds)):
            idx = rng.permutation(len(validation_inputs))[:num_validation_samples]
            stats = validate_runners(float_runner, quant_runner, validation_inputs[idx])
            info("convert", f"validation seed {s}: cosine_mean={stats['cosine_mean']:.4f} "
                            f"min={stats['cosine_min']:.4f}")
            if worst is None or stats["cosine_mean"] < worst["cosine_mean"]:
                worst = stats
        report["validation"] = worst

        if save_npz:
            # Pad 25 -> a batch shape validation already compiled (it chunks
            # at 32): a fresh batch-25 INT8 executor costs a full XLA
            # compile (minutes cold, 7-130 s executable load via a tunnel).
            keep = validation_inputs[:25]
            b = min(32, num_validation_samples, len(validation_inputs))
            padded = np.concatenate(
                [keep, np.zeros((max(0, b - len(keep)), *keep.shape[1:]),
                                keep.dtype)]) if len(keep) < b else keep
            npz_path = out_path.with_name(out_path.stem + "_validation_data.npz")
            np.savez_compressed(
                npz_path, inputs=keep,
                float_outputs=float_runner.predict(padded)[: len(keep)],
                quant_outputs=quant_runner.predict(padded)[: len(keep)])
            report["validation_npz"] = str(npz_path)

        if not np.isfinite(worst["cosine_mean"]) or worst["cosine_mean"] < min_cosine_sim:
            # NaN (empty validation set) must FAIL the gate — 'NaN < x' is
            # False and would ship an ungated artifact.
            raise RuntimeError(
                f"quantization quality gate failed: mean cosine "
                f"{worst['cosine_mean']:.4f} < {min_cosine_sim}")
        ok("convert", f"cosine gate passed: {worst['cosine_mean']:.4f} >= {min_cosine_sim}")
    else:
        warn("convert", "no INT8 validation (mode != int8)")

    report["seconds"] = time.perf_counter() - t0
    report_path = out_path.with_name(out_path.stem + "_report.json")
    report_path.write_text(json.dumps(report, indent=2))
    report["report_path"] = str(report_path)
    return report


def _tree_leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)
