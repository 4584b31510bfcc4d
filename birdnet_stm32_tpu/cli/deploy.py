"""Deploy CLI: package a trained checkpoint into a deployment bundle.

The TPU analog of the reference's deploy verb (cli/deploy.py:10-33 ->
deploy/stedgeai.py:137-183). Where the reference shells out to ST's
stedgeai compiler and n6_loader flasher, this framework's "deploy target"
is either (a) a TPU serving process — for which the bundle carries the
INT8 .tflite + ModelConfig JSON + labels + optional StableHLO serving
module — or (b) the reference STM32N6 firmware itself, for which the
bundle carries generated `app_config.h` / `app_labels.h` drop-in headers
(firmware/gen_app_config.py parity via deploy/headers.py).

Stage mapping (deploy/stedgeai.py):
  generate  -> collect + copy artifacts, generate headers, write manifest
  load      -> (no flashing on TPU) bundle is self-contained on disk
  validate  -> load the bundle back through load_model_runner and run one
               batch on the local device, checking the output geometry
               (the `stedgeai validate --mode target` analog)

Same operational conveniences: pre-flight file checks, `--dry_run` prints
the plan without executing, `--skip_validate`.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import shutil
import time
from pathlib import Path


def get_args(argv=None):
    p = argparse.ArgumentParser("birdnet_stm32_tpu deploy")
    p.add_argument("--model_path", "--model", dest="model_path", default="",
                   help="quantized .tflite (or checkpoint dir / .keras)")
    p.add_argument("--model_config", default="",
                   help="model_config.json (default: derived from model path)")
    p.add_argument("--labels", default="",
                   help="labels.txt (default: derived from model path)")
    p.add_argument("--output_dir", default="",
                   help="bundle output directory (default: <model>_deploy/)")
    p.add_argument("--config", default="",
                   help="deploy config file (JSON or TOML); CLI > env > file")
    p.add_argument("--thresholds", default="",
                   help="per-class thresholds JSON to ship in the bundle "
                        "(evaluate --optimize_thresholds output). Default: "
                        "auto-pick thresholds.json next to the model or "
                        "config if present — NOTE evaluate only writes it "
                        "there when run without --output_dir")
    p.add_argument("--stablehlo", action="store_true",
                   help="also export a portable StableHLO serving module")
    p.add_argument("--dry_run", action="store_true",
                   help="print the deployment plan without executing it")
    # Reference vendor-toolchain paths (cli/deploy.py there): accepted so
    # reference invocations parse; TPU deployment builds a self-contained
    # bundle and shells out to no vendor tools.
    for flag in ("--stedgeai_path", "--x_cube_ai_path", "--cubeide_path",
                 "--arm_toolchain_path", "--workspace_dir",
                 "--n6_loader_config"):
        p.add_argument(flag, default="", help=argparse.SUPPRESS)
    p.add_argument("--skip_validate", action="store_true",
                   help="skip the on-device validation step")
    return p.parse_args(argv)


def derive_sidecar_paths(model_path: str) -> tuple[str, str]:
    """Derive config/labels paths from a model path.

    Parity with the reference's auto-derivation (cli/board_test.py:72-90):
    strip the extension and a `_quantized` suffix, then append
    `_model_config.json` / `_labels.txt`. For this framework's directory
    checkpoints the sidecars live inside the run directory.
    """
    p = Path(model_path)
    if p.is_dir():
        return str(p / "model_config.json"), str(p / "labels.txt")
    root = str(p.with_suffix("")).replace("_quantized", "")
    cfg = root + "_model_config.json"
    if not Path(cfg).exists():
        if (p.parent / "model_config.json").exists():
            # A .tflite living inside a run directory (convert's default
            # output layout: run/model_quantized.tflite next to
            # run/model_config.json) — use the run-dir sidecars.
            return str(p.parent / "model_config.json"), str(p.parent / "labels.txt")
        if (Path(root) / "model_config.json").exists():
            # `<run>_quantized.tflite` exported NEXT TO the run directory
            # (the getting-started flow: convert --model_path /tmp/run1
            # --output_path /tmp/run1_quantized.tflite) — the stripped stem
            # IS the run dir.
            return str(Path(root) / "model_config.json"), str(Path(root) / "labels.txt")
    return cfg, root + "_labels.txt"


def resolve_config_path(model_path, config_path=None):
    """An explicit --config_path wins; otherwise the derived sidecar
    (stem rule or run-dir fallback) when it exists on disk, else None.
    Shared by the evaluate/benchmark/serve/board-test verbs so a
    convert-produced `run/model_quantized.tflite` works verbatim."""
    if config_path:
        return str(config_path)
    cfg, _ = derive_sidecar_paths(str(model_path))
    return cfg if Path(cfg).exists() else None


def _sha256(path: Path) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for block in iter(lambda: f.read(1 << 20), b""):
            h.update(block)
    return h.hexdigest()


def build_bundle(model_path: Path, config_path: Path, labels_path: Path | None,
                 out_dir: Path, stablehlo: bool = False,
                 dry_run: bool = False, batch_size: int = 64,
                 thresholds_path: Path | None = None) -> dict:
    """Assemble the deployment bundle; returns the manifest dict."""
    from birdnet_stm32_tpu.config import ModelConfig

    cfg = ModelConfig.load(config_path)
    labels = None
    if labels_path is not None and labels_path.exists():
        # Raw line order, NO dedupe/sort (open_species_list would): label i
        # must stay aligned with model output i, and the header pair below
        # must agree on the class count.
        from birdnet_stm32_tpu.data.species import load_species_list

        labels = load_species_list(labels_path)
    elif cfg.class_names:
        labels = list(cfg.class_names)
    if labels is not None and cfg.num_classes and len(labels) != cfg.num_classes:
        # APP_NUM_CLASSES (config) and the APP_LABELS table (file) disagreeing
        # would make the firmware index past the label array on device.
        raise SystemExit(
            f"labels file has {len(labels)} entries but the model outputs "
            f"{cfg.num_classes} classes — refusing to generate mismatched "
            "firmware headers")

    plan = [
        ("copy", model_path, out_dir / model_path.name),
        ("copy", config_path, out_dir / "model_config.json"),
    ]
    if labels_path is not None and labels_path.exists():
        plan.append(("copy", labels_path, out_dir / "labels.txt"))
    # Optimized per-class thresholds: ship them so `serve --thresholds`
    # runs at the evaluated operating point out of the bundle. Explicit
    # path wins; otherwise look next to the model and next to the config
    # (where `evaluate --optimize_thresholds` WITHOUT --output_dir writes
    # them — an --output_dir eval needs the explicit --thresholds flag).
    candidates = ([thresholds_path] if thresholds_path else
                  [model_path.parent / "thresholds.json",
                   config_path.parent / "thresholds.json"])
    for thresholds in candidates:
        if thresholds and thresholds.exists():
            plan.append(("copy", thresholds, out_dir / "thresholds.json"))
            break
    else:
        if thresholds_path:
            raise SystemExit(f"--thresholds not found: {thresholds_path}")
    if labels is not None:
        plan.append(("generate", "app_config.h + app_labels.h",
                     out_dir / "firmware"))
    if stablehlo:
        plan.append(("export", "StableHLO serving module",
                     out_dir / "serving_module.bin"))

    if dry_run:
        print("[deploy] dry run — planned actions:")
        for action, src, dst in plan:
            print(f"  {action:<9} {src} -> {dst}")
        return {"dry_run": True, "actions": len(plan)}

    out_dir.mkdir(parents=True, exist_ok=True)
    files: dict[str, dict] = {}
    for action, src, dst in plan:
        if action == "copy":
            if Path(src).resolve() != Path(dst).resolve():
                if Path(src).is_dir():
                    shutil.copytree(src, dst, dirs_exist_ok=True)
                else:
                    shutil.copy2(src, dst)
            if dst.is_dir():
                files[dst.name] = {
                    "bytes": sum(f.stat().st_size for f in dst.rglob("*") if f.is_file())
                }
            else:
                files[dst.name] = {"sha256": _sha256(dst), "bytes": dst.stat().st_size}
            print(f"[deploy] {src} -> {dst}")

    if labels is not None:
        from birdnet_stm32_tpu.deploy.headers import write_headers

        hdr_cfg, hdr_labels = write_headers(cfg, labels, out_dir / "firmware")
        for p in (hdr_cfg, hdr_labels):
            files[f"firmware/{p.name}"] = {"sha256": _sha256(p),
                                           "bytes": p.stat().st_size}
        print(f"[deploy] firmware headers -> {hdr_cfg.parent}")

    if stablehlo:
        if model_path.suffix == ".tflite":
            from birdnet_stm32_tpu.conversion.export_stablehlo import (
                export_int8_serving_fn,
            )

            blob = export_int8_serving_fn(model_path, cfg,
                                          batch_size=batch_size)
        else:
            from birdnet_stm32_tpu.conversion.export_stablehlo import export_serving_fn
            from birdnet_stm32_tpu.models.runners import load_model_runner

            runner = load_model_runner(model_path, config_path)
            blob = export_serving_fn(runner.model, runner.variables, cfg,
                                      batch_size=batch_size)
        dst = out_dir / "serving_module.bin"
        dst.write_bytes(blob)
        files[dst.name] = {"sha256": _sha256(dst), "bytes": dst.stat().st_size}
        print(f"[deploy] StableHLO serving module -> {dst} ({len(blob)} bytes)")

    manifest = {
        "model": model_path.name,
        "num_classes": cfg.num_classes,
        "audio_frontend": cfg.audio_frontend,
        "sample_rate": cfg.sample_rate,
        "chunk_duration": cfg.chunk_duration,
        "files": files,
    }
    (out_dir / "manifest.json").write_text(json.dumps(manifest, indent=2))
    print(f"[deploy] manifest -> {out_dir / 'manifest.json'}")
    return manifest


def validate_bundle(out_dir: Path, model_name: str, batch_size: int = 8) -> dict:
    """Load the bundle back and run one batch on the local device.

    The `stedgeai validate --mode target` analog (deploy/stedgeai.py:108-134):
    proves the deployed artifact actually executes end-to-end where it will
    serve, and reports the output geometry + latency.
    """
    import numpy as np

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.runners import load_model_runner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    cfg = ModelConfig.load(out_dir / "model_config.json")
    runner = load_model_runner(out_dir / model_name, out_dir / "model_config.json")
    classify = make_fused_classifier(runner, cfg)
    wave = np.zeros((batch_size, cfg.chunk_samples), np.float32)
    t0 = time.perf_counter()
    scores = np.asarray(classify(wave))
    dt = time.perf_counter() - t0
    if scores.shape != (batch_size, cfg.num_classes):
        raise RuntimeError(
            f"validation failed: output shape {scores.shape}, "
            f"expected {(batch_size, cfg.num_classes)}"
        )
    print(f"[deploy] validate OK: {scores.shape} scores in {dt * 1000:.1f} ms "
          f"(includes compile)")
    return {"output_shape": list(scores.shape), "first_batch_ms": dt * 1000}


def main(argv=None) -> int:
    args = get_args(argv)

    from birdnet_stm32_tpu.deploy.config import resolve_deploy_config

    cli_values = {"model_path": args.model_path or None,
                  "config_path": args.model_config or None,
                  "labels_path": args.labels or None}
    try:
        dcfg = resolve_deploy_config(cli_values=cli_values,
                                     config_file=args.config or None)
    except FileNotFoundError as e:
        print(f"[ERROR] {e}")
        return 1

    if not dcfg.model_path:
        print("[ERROR] no model: pass --model_path or set it in the deploy config")
        return 1
    model_path = Path(dcfg.model_path)

    cfg_guess, labels_guess = derive_sidecar_paths(str(model_path))
    config_path = Path(dcfg.config_path or cfg_guess)
    labels_path = Path(dcfg.labels_path or labels_guess)

    # Pre-flight checks (deploy/stedgeai.py:160-173).
    missing = [str(p) for p in (model_path, config_path) if not p.exists()]
    if missing:
        print(f"[ERROR] missing required files: {', '.join(missing)}")
        return 1
    if not labels_path.exists():
        print(f"[WARN] labels file not found ({labels_path}); "
              "falling back to config class_names")
        labels_path = None

    out_dir = Path(args.output_dir) if args.output_dir else (
        model_path.parent / (model_path.stem + "_deploy"))
    print(f"[deploy] model:  {model_path}")
    print(f"[deploy] config: {config_path}")
    print(f"[deploy] bundle: {out_dir}")

    # The serving module bakes a STATIC batch: use the deploy config's
    # (a bundle exported at 64 would shape-error a consumer driving it
    # at its own configured batch).
    build_bundle(model_path, config_path, labels_path, out_dir,
                 stablehlo=args.stablehlo, dry_run=args.dry_run,
                 batch_size=dcfg.batch_size,
                 thresholds_path=Path(args.thresholds) if args.thresholds else None)
    if args.dry_run:
        return 0

    if not args.skip_validate:
        validate_bundle(out_dir, model_path.name)
    print("[deploy] done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
