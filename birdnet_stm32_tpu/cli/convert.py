"""Convert CLI: checkpoint -> INT8 TFLite with quality gates.

Parity with reference cli/convert.py:74-233 (stratified calibration
sampling, PTQ/dynamic conversion, validation with worst-case aggregation,
cosine gate, validation NPZ, JSON report with compression ratio).
"""

from __future__ import annotations

import argparse
from pathlib import Path


def get_args(argv=None):
    p = argparse.ArgumentParser("birdnet_stm32_tpu convert")
    p.add_argument("--model_path", "--checkpoint_path", required=True,
                   help="checkpoint directory (or reference .keras file)")
    p.add_argument("--data_path", "--data_path_train", default=None,
                   help="calibration audio directory (omitted: random "
                        "representative dataset, reference "
                        "cli/convert.py:124-144)")
    p.add_argument("--model_config", default=None,
                   help="config JSON override for .keras inputs (reference "
                        "cli/convert.py:29; checkpoint dirs carry their own)")
    p.add_argument("--output_path", default=None)
    p.add_argument("--quantize", "--quantization", default="int8",
                   choices=["int8", "ptq", "dynamic", "float"],
                   help="'ptq' is the reference spelling for full INT8")
    p.add_argument("--per_tensor", action="store_true")
    p.add_argument("--num_calibration_samples", "--num_samples", type=int, default=100)
    p.add_argument("--calibration_per_class", type=int, default=10)
    p.add_argument("--validate_samples", type=int, default=64,
                   help="validation sample count for the cosine gate "
                        "(reference cli/convert.py:33)")
    p.add_argument("--min_cosine_sim", type=float, default=0.95)
    p.add_argument("--num_validation_seeds", "--batch_validate", type=int, default=1)
    p.add_argument("--report_json", default=None,
                   help="also write the structured conversion report here "
                        "(reference cli/convert.py:223-233)")
    p.add_argument("--no_npz", action="store_true")
    p.add_argument("--stablehlo", action="store_true",
                   help="also export the float serving fn (frontend+model) "
                        "as a portable StableHLO module (the reference's "
                        "optional ONNX-export analog)")
    p.add_argument("--onnx", "--export_onnx", action="store_true",
                   help="also export ONNX via tf2onnx when installed "
                        "(reference cli/convert.py:209-221); prints a warning "
                        "and continues when tf2onnx is unavailable")
    p.add_argument("--seed", type=int, default=42)
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = get_args(argv)

    from birdnet_stm32_tpu.conversion.pipeline import convert_model
    from birdnet_stm32_tpu.data.dataset import load_file_paths_from_directory
    from birdnet_stm32_tpu.utils.logging import ok

    if args.quantize == "ptq":
        args.quantize = "int8"
    from birdnet_stm32_tpu.training.checkpoint import keras_run_dir

    model_path = Path(args.model_path)
    run_equiv = keras_run_dir(model_path)
    if run_equiv is not None:
        # The documented flow passes train's --checkpoint_path verbatim
        # (reference docs/getting-started.md); our train maps that .keras
        # name to a run DIRECTORY, so resolve the same way here.
        from birdnet_stm32_tpu.training.checkpoint import load_checkpoint

        model, variables, cfg = load_checkpoint(run_equiv)
        stem = model_path.stem
        out_default = model_path.parent
    elif model_path.suffix == ".keras":
        from birdnet_stm32_tpu.models.transplant import load_reference_model

        config_path = Path(args.model_config) if args.model_config else (
            model_path.with_name(model_path.stem + "_model_config.json"))
        model, variables, cfg = load_reference_model(model_path, config_path)
        stem = model_path.stem
        out_default = model_path.parent
    else:
        from birdnet_stm32_tpu.training.checkpoint import load_checkpoint

        model, variables, cfg = load_checkpoint(model_path)
        stem = model_path.name
        out_default = model_path

    out_path = Path(args.output_path) if args.output_path else (
        out_default / f"{stem}_quantized.tflite")

    if args.data_path:
        paths, labels, _ = load_file_paths_from_directory(
            args.data_path, classes=cfg.class_names)
        if not paths:
            # An explicitly-passed calibration dir with zero usable files
            # must NOT silently fall back to random calibration data — the
            # INT8 ranges would be garbage while the gate still "passes"
            # (random inputs also validate against random inputs).
            raise SystemExit(
                f"no calibration audio under {args.data_path} "
                "(omit --data_path to calibrate on a random "
                "representative dataset)")
    else:
        paths, labels = None, None
    # Export with the activation the checkpoint was trained for (multilabel
    # checkpoints serve sigmoid; the float validation runner matches).
    # convert_model derives the export activation from the model when
    # passed None — single source of truth for the defaulting rule.
    class_activation = None
    report = convert_model(
        model, variables, cfg, out_path,
        calibration_paths=paths, calibration_labels=labels,
        calibration_per_class=args.calibration_per_class,
        num_calibration_samples=args.num_calibration_samples,
        quantize=args.quantize, per_channel=not args.per_tensor,
        min_cosine_sim=args.min_cosine_sim,
        num_validation_seeds=args.num_validation_seeds,
        num_validation_samples=args.validate_samples,
        class_activation=class_activation,
        save_npz=not args.no_npz, seed=args.seed)
    ok("convert", f"{out_path} ({report['tflite_bytes']:,} B, "
                  f"{report['compression_ratio']:.1f}x compression)")
    if args.report_json:
        import json

        Path(args.report_json).write_text(json.dumps(report, indent=2, default=float))
        ok("convert", f"conversion report -> {args.report_json}")
    if args.stablehlo:
        from birdnet_stm32_tpu.conversion.export_stablehlo import export_serving_fn

        shlo_path = out_path.with_suffix(".stablehlo")
        shlo_path.write_bytes(export_serving_fn(model, variables, cfg))
        ok("convert", f"StableHLO serving module -> {shlo_path}")
    if args.onnx:
        # Optional, like the reference's (cli/convert.py:209-221 there):
        # failure to export ONNX never fails the conversion.
        try:
            import tf2onnx  # noqa: F401

            from birdnet_stm32_tpu.conversion.export_tflite import build_tf_forward

            import tensorflow as tf

            forward = build_tf_forward(
                variables, cfg,
                class_activation=report["class_activation"])
            spec = (tf.TensorSpec((None, *cfg.input_shape()), tf.float32),)
            onnx_path = out_path.with_suffix(".onnx")
            tf2onnx.convert.from_function(
                tf.function(forward), input_signature=spec,
                output_path=str(onnx_path))
            ok("convert", f"ONNX -> {onnx_path}")
        except ImportError:
            print("[WARN] --onnx requested but tf2onnx is not installed; "
                  "skipping (use --stablehlo for a portable module)")
        except Exception as e:  # parity: ONNX export failure is non-fatal
            print(f"[WARN] ONNX export failed ({type(e).__name__}: {e}); "
                  "continuing")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
