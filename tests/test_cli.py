"""CLI integration tests: dispatch + train -> convert -> evaluate -> benchmark
on a tiny synthetic dataset (reference tests/test_train_to_eval.py:32-136).
"""

import json
from pathlib import Path

import numpy as np
import pytest

from birdnet_stm32_tpu.__main__ import main as dispatch


def test_dispatch_help(capsys):
    assert dispatch([]) == 2  # no command: usage + error exit
    assert dispatch(["--help"]) == 0
    out = capsys.readouterr().out
    for cmd in ("train", "convert", "evaluate", "benchmark", "profile",
                "deploy", "board-test", "serve"):
        assert cmd in out


def test_dispatch_unknown():
    assert dispatch(["frobnicate"]) == 2


def test_reference_flag_spellings_parse():
    """The reference's original flag names are accepted as aliases, so its
    documented command lines work unchanged (reference cli/train.py:132-269,
    cli/convert.py:28-71, cli/evaluate.py:32-72).
    """
    from birdnet_stm32_tpu.cli.convert import get_args as conv_args
    from birdnet_stm32_tpu.cli.evaluate import get_args as eval_args
    from birdnet_stm32_tpu.cli.train import get_args as train_args

    t = train_args(["--data_path_train", "d", "--max_classes", "50",
                    "--max_samples", "100", "--dropout", "0.3",
                    "--grad_clip", "2.0", "--frontend_trainable",
                    "--tune", "--n_trials", "7"])
    assert (t.top_n_classes, t.max_samples_per_class) == (50, 100)
    assert (t.dropout_rate, t.gradient_clip_norm, t.tune) == (0.3, 2.0, 7)
    assert train_args(["--data_path_train", "d", "--tune", "3"]).tune == 3

    c = conv_args(["--checkpoint_path", "m.keras", "--data_path_train", "d",
                   "--num_samples", "64", "--quantization", "ptq",
                   "--batch_validate", "3", "--export_onnx",
                   "--model_config", "cfg.json", "--validate_samples", "32"])
    assert (c.model_path, c.data_path, c.num_calibration_samples) == ("m.keras", "d", 64)
    assert (c.quantize, c.num_validation_seeds, c.onnx) == ("ptq", 3, True)

    e = eval_args(["--model_path", "m", "--data_path_test", "d",
                   "--model_config", "cfg.json", "--overlap", "1.5",
                   "--benchmark", "out.json", "--save_cm_plot", "cm.png",
                   "--save_det_plot", "det.png", "--confusion_matrix",
                   "--save_csv", "p.csv", "--max_files", "-1"])
    assert (e.config_path, e.chunk_overlap) == ("cfg.json", 1.5)
    assert (e.save_benchmark_json, e.save_csv) == ("out.json", "p.csv")
    # Bare boolean forms still work and default off.
    e2 = eval_args(["--model_path", "m", "--data_path_test", "d",
                    "--save_csv", "--save_benchmark_json"])
    assert e2.save_csv is True and e2.save_benchmark_json is True
    e3 = eval_args(["--model_path", "m", "--data_path_test", "d"])
    assert e3.save_csv is False and e3.save_benchmark_json is False


def test_deploy_sidecar_derivation(tmp_path):
    from birdnet_stm32_tpu.cli.deploy import derive_sidecar_paths

    # `_quantized` strip parity (reference cli/board_test.py:72-90).
    cfg, labels = derive_sidecar_paths("/ckpt/bird_quantized.tflite")
    assert cfg == "/ckpt/bird_model_config.json"
    assert labels == "/ckpt/bird_labels.txt"

    # Directory checkpoints keep sidecars inside the run dir.
    d = tmp_path / "run"
    d.mkdir()
    cfg, labels = derive_sidecar_paths(str(d))
    assert cfg == str(d / "model_config.json")
    assert labels == str(d / "labels.txt")

    # A .tflite inside a run directory (convert's default layout:
    # run/model_quantized.tflite next to run/model_config.json) falls back
    # to the run-dir sidecars when the stem-derived config doesn't exist.
    (d / "model_config.json").write_text("{}")
    cfg, labels = derive_sidecar_paths(str(d / "model_quantized.tflite"))
    assert cfg == str(d / "model_config.json")
    assert labels == str(d / "labels.txt")

    # `<run>_quantized.tflite` exported NEXT TO the run dir (the
    # getting-started flow): the stripped stem IS the run directory.
    cfg, labels = derive_sidecar_paths(str(tmp_path / "run_quantized.tflite"))
    assert cfg == str(d / "model_config.json")
    assert labels == str(d / "labels.txt")


def test_deploy_dry_run_and_preflight(tmp_path, capsys):
    from birdnet_stm32_tpu.config import ModelConfig

    # Missing model: pre-flight error, no bundle written.
    assert dispatch(["deploy", "--model_path", str(tmp_path / "nope.tflite")]) == 1

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, class_names=["a", "b"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    model = tmp_path / "bird_quantized.tflite"
    model.write_bytes(b"\x00" * 16)
    cfg.save(tmp_path / "bird_model_config.json")
    capsys.readouterr()
    out_dir = tmp_path / "bundle"
    assert dispatch(["deploy", "--model_path", str(model),
                     "--output_dir", str(out_dir), "--dry_run"]) == 0
    out = capsys.readouterr().out
    assert "dry run" in out and "app_config.h" in out
    assert not out_dir.exists()  # dry run writes nothing


def test_profile_cli(tmp_path, capsys):
    from birdnet_stm32_tpu.config import ModelConfig

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid",
                      mag_scale="pwl", alpha=0.25)
    cfg.save(tmp_path / "model_config.json")
    assert dispatch(["profile", "--config_path", str(tmp_path / "model_config.json")]) == 0
    out = capsys.readouterr().out
    assert "Total params" in out and "stem_conv" in out


@pytest.mark.slow
@pytest.mark.integration
def test_train_convert_evaluate_benchmark(wav_dataset, tmp_path, capsys):
    root, sr = wav_dataset
    run_dir = tmp_path / "run"

    common = [
        "--data_path_train", str(root), "--run_dir", str(run_dir),
        "--sample_rate", "4000", "--chunk_duration", "1.0",
        "--fft_length", "128", "--num_mels", "16", "--spec_width", "32",
        "--alpha", "0.25", "--embeddings_size", "32",
        "--epochs", "2", "--steps_per_epoch", "4", "--batch_size", "8",
        "--num_workers", "0", "--patience", "5", "--no_mesh",
        "--max_chunks_per_file", "1", "--seed", "0",
        # Flag-parity surface: bf16 step, loss override, SpecAugment widths,
        # bounded decode (reference --mixed_precision/--loss/--*_mask_max/
        # --max_duration).
        "--mixed_precision", "--loss", "bce",
        "--freq_mask_max", "4", "--time_mask_max", "10",
        "--max_duration", "10",
    ]
    assert dispatch(["train", *common]) == 0
    assert (run_dir / "model_config.json").exists()
    assert (run_dir / "labels.txt").exists()
    assert (run_dir / "best").exists()
    assert (run_dir / "history.csv").exists()
    # Sidecar contract: the persisted hop_length must equal the hop the
    # model trained with (chunk_samples // spec_width), at ANY sample rate
    # — a reference firmware build consumes this field verbatim.
    sidecar = json.loads((run_dir / "model_config.json").read_text())
    assert sidecar["hop_length"] == 4000 // 32 == 125
    # Reference head rule: mixup is on by default, so the run records a
    # multilabel (sigmoid) head like the reference's default trains.
    state = json.loads((run_dir / "train_state.json").read_text())
    assert state["multilabel"] is True

    # Convert (dynamic mode: fast, no INT8 calibration loop on CPU).
    out_tfl = tmp_path / "model.tflite"
    assert dispatch([
        "convert", "--model_path", str(run_dir), "--data_path", str(root),
        "--output_path", str(out_tfl), "--quantize", "dynamic",
        "--num_calibration_samples", "4", "--onnx",
    ]) == 0
    assert out_tfl.exists()
    report = json.loads((tmp_path / "model_report.json").read_text())
    assert report["quantize"] == "dynamic"
    # --onnx is optional parity: warns-and-continues when tf2onnx is absent.
    out = capsys.readouterr().out
    assert ("ONNX" in out) or ("tf2onnx" in out)

    # An explicit calibration dir with zero usable audio must fail loudly,
    # never silently calibrate on random data.
    empty = tmp_path / "no_audio_here"
    empty.mkdir()
    with pytest.raises(SystemExit, match="no calibration audio"):
        dispatch(["convert", "--model_path", str(run_dir),
                  "--data_path", str(empty),
                  "--output_path", str(tmp_path / "never.tflite")])
    assert not (tmp_path / "never.tflite").exists()

    # Evaluate the float checkpoint.
    out_dir = tmp_path / "eval"
    assert dispatch([
        "evaluate", "--model_path", str(run_dir), "--data_path_test", str(root),
        "--output_dir", str(out_dir), "--save_csv", "--save_benchmark_json",
        "--optimize_thresholds", "--max_files", "8", "--n_bootstrap", "20",
        "--bootstrap_ci", "--save_embeddings", str(tmp_path / "emb.npz"),
        "--pooling", "lme",  # BASELINE config #5: LME-pooled eval
        # Reference evaluate.py path-taking spellings (--species_report /
        # --report_html) alongside our --save_csv/--save_html toggles.
        "--species_report", str(tmp_path / "species.csv"),
        "--report_html", str(tmp_path / "report.html"),
    ]) == 0
    out = capsys.readouterr().out
    assert "roc-auc" in out and "cmAP" in out
    emb = np.load(tmp_path / "emb.npz", allow_pickle=False)
    assert emb["embeddings"].shape == (len(emb["files"]), 32)  # embeddings_size
    assert len(emb["labels"]) == len(emb["files"])

    # A test dir whose class folders don't match the model must say so
    # (not the generic "no test audio" of a truly empty dir).
    mismatch = tmp_path / "wrong_classes" / "not_a_model_class"
    mismatch.mkdir(parents=True)
    import shutil

    shutil.copy(next(Path(root).rglob("*.wav")), mismatch / "x.wav")
    with pytest.raises(SystemExit, match="matches the model's classes"):
        dispatch(["evaluate", "--model_path", str(run_dir),
                  "--data_path_test", str(tmp_path / "wrong_classes")])
    assert (out_dir / "predictions.csv").exists()
    assert (out_dir / "species_report.csv").exists()
    assert (out_dir / "benchmark.json").exists()
    assert (out_dir / "thresholds.json").exists()
    assert (tmp_path / "species.csv").exists()
    html = (tmp_path / "report.html").read_text()
    assert "<html" in html.lower()

    # Benchmark driver ([BENCH] protocol).
    csv_path = tmp_path / "bench.csv"
    assert dispatch([
        "benchmark", "--model_path", str(run_dir), "--audio_dir", str(root),
        "--csv", str(csv_path), "--top_k", "2",
    ]) == 0
    out = capsys.readouterr().out
    assert "[BENCH]" in out
    assert "=== DONE ===" in out
    assert "real-time factor" in out
    assert csv_path.exists()
    header = csv_path.read_text().splitlines()[0]
    assert header.startswith("file,chunks,top1")

    # mu-law ingress through the same driver (quarter-bandwidth transfer).
    assert dispatch([
        "benchmark", "--model_path", str(run_dir), "--audio_dir", str(root),
        "--top_k", "2", "--ulaw_io",
    ]) == 0
    assert "=== DONE ===" in capsys.readouterr().out
    # The two compressed transfers are mutually exclusive, loudly.
    with pytest.raises(SystemExit, match="mutually exclusive"):
        dispatch(["benchmark", "--model_path", str(run_dir),
                  "--audio_dir", str(root), "--int16_io", "--ulaw_io"])

    # Deploy: package the run dir into a bundle (headers + manifest) and
    # validate it on the local device.
    bundle = tmp_path / "bundle"
    assert dispatch([
        "deploy", "--model_path", str(run_dir), "--output_dir", str(bundle),
        "--stablehlo",
    ]) == 0
    out = capsys.readouterr().out
    assert "validate OK" in out
    manifest = json.loads((bundle / "manifest.json").read_text())
    assert manifest["num_classes"] == 2
    assert (bundle / "firmware" / "app_config.h").exists()
    assert (bundle / "firmware" / "app_labels.h").exists()
    assert (bundle / "model_config.json").exists()
    # Portable serving module round-trips through jax.export.
    from birdnet_stm32_tpu.conversion.export_stablehlo import load_serving_fn

    blob = (bundle / "serving_module.bin").read_bytes()
    serve = load_serving_fn(blob)
    wave = np.zeros((64, 4000), np.float32)  # batch baked into the module
    scores = np.asarray(serve(wave))
    assert scores.shape == (64, 2)

    # Board test: the standalone WAV-dir inference test over the bundle.
    results_csv = tmp_path / "board_results.csv"
    assert dispatch([
        "board-test", "--model_path", str(bundle / run_dir.name),
        "--model_config", str(bundle / "model_config.json"),
        "--labels", str(bundle / "labels.txt"),
        "--audio_dir", str(root), "--save_results", str(results_csv),
    ]) == 0
    out = capsys.readouterr().out
    assert "[BENCH]" in out and "=== DONE ===" in out
    rows = results_csv.read_text().splitlines()
    assert rows[0] == "file,top_label,top_score"
    assert len(rows) > 1


@pytest.mark.integration
def test_documented_keras_checkpoint_flow(wav_dataset, tmp_path, capsys):
    """The reference's documented 3-step flow works verbatim with a .keras
    --checkpoint_path spelling (reference docs/getting-started.md:62-87):
    train maps the file to a run dir + writes <stem>_model_config.json /
    <stem>_labels.txt sidecars, and convert/evaluate resolve the same
    .keras name back to that run dir."""
    root, sr = wav_dataset
    keras_path = tmp_path / "ckpt" / "my_model.keras"

    assert dispatch([
        "train", "--data_path_train", str(root),
        "--checkpoint_path", str(keras_path),
        "--sample_rate", "4000", "--chunk_duration", "1.0",
        "--fft_length", "128", "--num_mels", "16", "--spec_width", "32",
        "--alpha", "0.25", "--embeddings_size", "32",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--num_workers", "0", "--no_mesh", "--max_chunks_per_file", "1",
        "--seed", "0",
    ]) == 0
    run_dir = keras_path.parent
    assert (run_dir / "my_model_model_config.json").exists()
    assert (run_dir / "my_model_labels.txt").exists()

    assert dispatch([
        "convert", "--checkpoint_path", str(keras_path),
        "--model_config", str(run_dir / "my_model_model_config.json"),
        "--data_path_train", str(root),
        "--quantize", "dynamic", "--num_calibration_samples", "4",
    ]) == 0
    assert (run_dir / "my_model_quantized.tflite").exists()

    assert dispatch([
        "evaluate", "--model_path", str(keras_path),
        "--data_path_test", str(root), "--max_files", "4",
    ]) == 0
    assert "cmAP" in capsys.readouterr().out

    # Documented QAT flow (reference docs/training.md:157-169): fine-tune
    # via the same .keras spelling, then convert <stem>_qat.keras — which
    # must resolve to the QAT run dir, not the base checkpoint.
    assert dispatch([
        "train", "--data_path_train", str(root), "--qat",
        "--checkpoint_path", str(keras_path),
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--learning_rate", "0.0001",
        "--num_workers", "0", "--no_mesh", "--seed", "0",
    ]) == 0
    assert (run_dir / "my_model_qat" / "best").exists()
    assert dispatch([
        "convert", "--checkpoint_path", str(run_dir / "my_model_qat.keras"),
        "--data_path_train", str(root),
        "--quantize", "dynamic", "--num_calibration_samples", "4",
    ]) == 0
    assert (run_dir / "my_model_qat_quantized.tflite").exists()


@pytest.mark.slow
@pytest.mark.integration
def test_evaluate_tflite_runners(wav_dataset, tmp_path, capsys):
    """Evaluate both a dynamic-range tflite (interpreter fallback) and a
    full-int8 tflite (on-device executor) through the CLI."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import (
        TFLiteInterpreterRunner,
        TFLiteSimRunner,
        load_model_runner,
    )

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=["bird_a", "bird_b"], audio_frontend="hybrid",
                      mag_scale="pwl", alpha=0.25)
    model = build_dscnn(cfg)
    v = init_model(model, cfg, jax.random.key(0))
    calib = np.random.default_rng(0).uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32)

    dyn = tmp_path / "dyn.tflite"
    dyn.write_bytes(convert_to_tflite(v, cfg, calib, quantize="dynamic"))
    assert isinstance(load_model_runner(dyn), TFLiteInterpreterRunner)

    q = tmp_path / "int8.tflite"
    q.write_bytes(convert_to_tflite(v, cfg, calib, quantize="int8"))
    assert isinstance(load_model_runner(q), TFLiteSimRunner)

    cfg_path = tmp_path / "model_config.json"
    cfg.save(cfg_path)
    for m in (dyn, q):
        assert dispatch(["evaluate", "--model_path", str(m),
                         "--data_path_test", str(root),
                         "--config_path", str(cfg_path),
                         "--output_dir", str(tmp_path / f"eval_{m.stem}")]) == 0
        assert "roc-auc" in capsys.readouterr().out


@pytest.mark.slow
@pytest.mark.integration
def test_cli_mode_dispatch_paths(wav_dataset, tmp_path, capsys):
    """find_lr / resume / linear_probe / tune dispatch end-to-end."""
    root, sr = wav_dataset
    run_dir = tmp_path / "base"
    common = [
        "--data_path_train", str(root), "--run_dir", str(run_dir),
        "--sample_rate", "4000", "--chunk_duration", "1.0",
        "--fft_length", "128", "--num_mels", "16", "--spec_width", "32",
        "--alpha", "0.25", "--embeddings_size", "32",
        "--epochs", "1", "--steps_per_epoch", "3", "--batch_size", "8",
        "--num_workers", "0", "--no_mesh", "--max_chunks_per_file", "1",
        "--seed", "0",
    ]
    assert dispatch(["train", *common]) == 0
    capsys.readouterr()

    # Resume: second epoch continues from the saved state.
    assert dispatch(["train", *common, "--epochs", "2", "--resume"]) == 0
    out = capsys.readouterr().out
    assert "resuming from epoch 1" in out

    # LR finder prints a suggestion and exits without touching the run dir.
    assert dispatch(["train", *common, "--find_lr"]) == 0
    out = capsys.readouterr().out
    assert "suggested learning rate" in out

    # Linear probe on the same classes (fresh head).
    assert dispatch(["train", *common, "--linear_probe"]) == 0
    probe_dir = tmp_path / "base_probe"
    assert (probe_dir / "best").exists()
    probe_labels = (probe_dir / "labels.txt").read_text().split()
    assert probe_labels == ["bird_a", "bird_b"]

    # Tiny random search writes best_params.json.
    tune_dir = tmp_path / "tune"
    assert dispatch(["train", *common, "--run_dir", str(tune_dir),
                     "--tune", "2"]) == 0
    assert (tune_dir / "best_params.json").exists()


def test_serve_once_and_resume(wav_dataset, tmp_path, capsys):
    """serve --once classifies every WAV, writes the firmware TSV schema,
    and skips already-recorded files on the next run (SD-card resume
    semantics, sd_handler.c:90-108)."""
    import jax

    from birdnet_stm32_tpu.audio.io import save_wav
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    results = tmp_path / "results.txt"
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--batch_size", "4", "--once"]) == 0
    out = capsys.readouterr().out
    assert "=== DONE ===" in out
    lines = [l for l in results.read_text().splitlines() if l]
    n_wavs = len(list(Path(root).rglob("*.wav")))
    assert len(lines) == n_wavs
    cols = lines[0].split("\t")
    assert len(cols) == 1 + cfg.num_classes  # filename + every class score
    float(cols[1])  # 4-decimal scores parse

    # Second run: everything already recorded -> nothing new served.
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--batch_size", "4", "--once"]) == 0
    out = capsys.readouterr().out
    assert "files served: 0" in out
    assert len([l for l in results.read_text().splitlines() if l]) == n_wavs

    # A new file appears -> only it is served.
    t = np.arange(4000) / 4000.0
    save_wav((0.5 * np.sin(2 * np.pi * 900 * t)).astype(np.float32),
             Path(root) / "bird_a" / "late_arrival.wav", 4000)
    # Same bare filename in ANOTHER class folder must not collide
    # (results are keyed by path relative to the watched dir).
    save_wav((0.5 * np.sin(2 * np.pi * 700 * t)).astype(np.float32),
             Path(root) / "bird_b" / "late_arrival.wav", 4000)
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--batch_size", "4", "--once"]) == 0
    out = capsys.readouterr().out
    assert "files served: 2" in out and "late_arrival.wav" in out
    keys = [l.split("\t", 1)[0] for l in results.read_text().splitlines() if l]
    assert len(keys) == len(set(keys)) == n_wavs + 2


def test_serve_decode_threads_matches_serial(wav_dataset, tmp_path, capsys):
    """--decode_threads overlaps host decode with device compute but must
    produce the exact same TSV (same order, same scores) as serial."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    serial, threaded = tmp_path / "serial.txt", tmp_path / "threaded.txt"
    for results, extra in [(serial, []),
                           (threaded, ["--decode_threads", "4"])]:
        assert dispatch(["serve", "--model_path", str(run_dir),
                         "--audio_dir", str(root), "--results_file",
                         str(results), "--batch_size", "4", "--once",
                         *extra]) == 0
    capsys.readouterr()
    assert serial.read_text() == threaded.read_text()
    assert len(serial.read_text().splitlines()) == len(
        list(Path(root).rglob("*.wav")))


def test_serve_waits_for_stable_file_size(wav_dataset, tmp_path, capsys):
    """In polling mode a file is classified only once its size is stable
    across two polls (copy-in-progress guard); --once skips the guard."""
    import jax

    from birdnet_stm32_tpu.cli.serve import serve_loop
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import load_model_runner
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)
    runner = load_model_runner(run_dir)

    results = tmp_path / "results.txt"
    n_wavs = len(list(Path(root).rglob("*.wav")))
    # Poll 1 records sizes; nothing is classified yet. Poll 2 sees stable
    # sizes and classifies everything.
    served = serve_loop(runner, cfg, cfg.class_names, Path(root), results,
                        poll_interval=0.01, batch_size=4, max_polls=2)
    assert served == n_wavs
    assert len([l for l in results.read_text().splitlines() if l]) == n_wavs
    # One poll only -> sizes recorded, nothing classified.
    results2 = tmp_path / "results2.txt"
    served = serve_loop(runner, cfg, cfg.class_names, Path(root), results2,
                        poll_interval=0.01, batch_size=4, max_polls=1)
    assert served == 0


@pytest.mark.slow
def test_train_cli_on_device_mesh(wav_dataset, tmp_path):
    """Default (mesh) CLI path: training runs data-parallel over the 8
    virtual devices, including the sharded eval of a partial val tail."""
    root, sr = wav_dataset
    run_dir = tmp_path / "run_mesh"
    assert dispatch([
        "train", "--data_path_train", str(root), "--run_dir", str(run_dir),
        "--sample_rate", "4000", "--chunk_duration", "1.0",
        "--fft_length", "128", "--num_mels", "16", "--spec_width", "32",
        "--alpha", "0.25", "--embeddings_size", "32",
        "--epochs", "1", "--steps_per_epoch", "2", "--batch_size", "8",
        "--num_workers", "0", "--max_chunks_per_file", "1", "--seed", "0",
        # no --no_mesh: exercise make_mesh() + pjit train/eval steps
    ]) == 0
    assert (run_dir / "best").exists()
    assert (run_dir / "history.csv").exists()


def test_flag_parity_audit():
    """Every reference CLI flag exists here or has a documented reason not
    to (scripts/audit_cli_parity.py; reference cli/*.py argparse surface,
    AST-parsed — the reference tree is never imported)."""
    import sys

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "scripts"))
    try:
        from audit_cli_parity import audit
    finally:
        sys.path.pop(0)
    if not Path("/root/reference/birdnet_stm32/cli").is_dir():
        pytest.skip("reference tree not available")
    assert audit(verbose=False) == []


def test_serve_int16_io_matches_float(wav_dataset, tmp_path, capsys):
    """--int16_io ships PCM16 codes and dequantizes in-dispatch; scores must
    match the float path within the one-LSB waveform error (the bulk-serving
    transfer-halving mode, docs/performance.md)."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    def scores_of(results):
        rows = {}
        for line in results.read_text().splitlines():
            if line:
                k, *vals = line.split("\t")
                rows[k] = np.array([float(v) for v in vals])
        return rows

    res_f = tmp_path / "res_float.txt"
    res_q = tmp_path / "res_int16.txt"
    base = ["serve", "--model_path", str(run_dir), "--audio_dir", str(root),
            "--batch_size", "4", "--once"]
    assert dispatch(base + ["--results_file", str(res_f)]) == 0
    assert dispatch(base + ["--results_file", str(res_q), "--int16_io"]) == 0
    capsys.readouterr()
    a, b = scores_of(res_f), scores_of(res_q)
    assert a.keys() == b.keys() and len(a) > 0
    for k in a:
        # TSV records 4 decimals; 1-LSB waveform error stays well inside.
        np.testing.assert_allclose(b[k], a[k], atol=2e-3, err_msg=k)

    # Decode-thread path quantizes on the workers — same results.
    res_t = tmp_path / "res_threads.txt"
    assert dispatch(base + ["--results_file", str(res_t), "--int16_io",
                            "--decode_threads", "2"]) == 0
    capsys.readouterr()
    c = scores_of(res_t)
    for k in a:
        np.testing.assert_array_equal(c[k], b[k], err_msg=k)

    # mu-law ingress (quarter-bandwidth, companded): scores track the
    # float path within the ~2.2% relative waveform error's score effect.
    res_u = tmp_path / "res_ulaw.txt"
    assert dispatch(base + ["--results_file", str(res_u), "--ulaw_io"]) == 0
    capsys.readouterr()
    u = scores_of(res_u)
    assert u.keys() == a.keys()
    for k in a:
        np.testing.assert_allclose(u[k], a[k], atol=0.05, err_msg=k)
    with pytest.raises(SystemExit, match="mutually exclusive"):
        dispatch(base + ["--results_file", str(tmp_path / "x.txt"),
                         "--int16_io", "--ulaw_io"])


def test_serve_skips_undecodable_file(wav_dataset, tmp_path, capsys):
    """A garbage .wav in the watched dir is skipped (message printed, not
    recorded in the results TSV) and every valid file still gets served —
    the service never wedges on one bad recording."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    (Path(root) / "bird_a" / "garbage.wav").write_bytes(b"RIFFnope" * 5)
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    results = tmp_path / "results.txt"
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--batch_size", "4", "--once"]) == 0
    out = capsys.readouterr().out
    assert "garbage.wav" in out and "skipped" in out
    keys = [l.split("\t", 1)[0] for l in results.read_text().splitlines() if l]
    n_valid = len(list(Path(root).rglob("*.wav"))) - 1
    assert len(keys) == n_valid
    assert not any("garbage" in k for k in keys)


def test_benchmark_pipelined_matches_serial(wav_dataset, tmp_path, capsys):
    """--pipeline packs chunks across files into async device batches; its
    per-file top-1 results must match the serial driver's (and --int16_io
    must stay within one PCM16 LSB of the float path)."""
    import csv
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    def rows_of(csv_path):
        with open(csv_path) as f:
            return {r["file"]: r for r in csv.DictReader(f)}

    def run(tag, *extra):
        out_csv = tmp_path / f"bench_{tag}.csv"
        assert dispatch(["benchmark", "--model_path", str(run_dir),
                         "--audio_dir", str(root), "--csv", str(out_csv),
                         "--batch_size", "4", *extra]) == 0
        assert "=== DONE ===" in capsys.readouterr().out
        return rows_of(out_csv)

    serial = run("serial")
    piped = run("piped", "--pipeline", "2")
    assert serial.keys() == piped.keys() and len(serial) > 0
    for k in serial:
        # Per-sample compute is row-independent, so cross-file batch
        # packing must not change any result.
        assert piped[k]["top1"] == serial[k]["top1"], k
        assert abs(float(piped[k]["score"]) - float(serial[k]["score"])) < 1e-6, k
        assert piped[k]["chunks"] == serial[k]["chunks"], k

    piped16 = run("piped16", "--pipeline", "2", "--int16_io")
    for k in serial:
        assert abs(float(piped16[k]["score"]) - float(serial[k]["score"])) < 2e-3, k


def test_serve_per_class_thresholds(wav_dataset, tmp_path, capsys):
    """serve --thresholds applies the evaluate-optimized per-class
    operating point (vector rule in top_predictions); unknown classes in
    the file fail loudly."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    th = tmp_path / "thresholds.json"
    th.write_text(json.dumps({"bird_a": 0.999, "bird_b": 0.0}))
    results = tmp_path / "results.txt"
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--batch_size", "4", "--once",
                     "--thresholds", str(th)]) == 0
    out = capsys.readouterr().out
    assert "=== DONE ===" in out
    assert results.exists()

    th_bad = tmp_path / "bad.json"
    th_bad.write_text(json.dumps({"not_a_class": 0.5}))
    with pytest.raises(SystemExit, match="classes the model doesn't serve"):
        dispatch(["serve", "--model_path", str(run_dir),
                  "--audio_dir", str(root), "--once",
                  "--thresholds", str(th_bad)])


def test_top_predictions_vector_threshold():
    from birdnet_stm32_tpu.models.serving import top_predictions

    pooled = np.array([0.9, 0.6, 0.3], np.float32)
    # Flat rule: all three clear 0.2.
    assert top_predictions(pooled, 3, 0.2) == [0, 1, 2]
    # Per-class rule: class 1's threshold excludes it; top-1 always shown.
    thr = np.array([0.95, 0.7, 0.2], np.float32)
    assert top_predictions(pooled, 3, thr) == [0, 2]


def test_serve_thresholds_with_longer_labels(wav_dataset, tmp_path, capsys):
    """_resolve_classes permits a labels file LONGER than the model's
    output; the per-class threshold vector must match the SCORE width
    (review finding: it crashed broadcast_to in top_predictions)."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.checkpoint import save_checkpoint

    root, sr = wav_dataset
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=3, class_names=["bird_a", "bird_b", "noise"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    run_dir = tmp_path / "ckpt"
    model = build_dscnn(cfg)
    save_checkpoint(run_dir, init_model(model, cfg, jax.random.key(0)), cfg)

    labels = tmp_path / "labels.txt"
    labels.write_text("bird_a\nbird_b\nnoise\nextra_label\n")
    th = tmp_path / "th.json"
    th.write_text(json.dumps({"bird_a": 0.2, "extra_label": 0.9}))
    results = tmp_path / "results.txt"
    assert dispatch(["serve", "--model_path", str(run_dir),
                     "--audio_dir", str(root), "--results_file", str(results),
                     "--labels_path", str(labels), "--batch_size", "4",
                     "--once", "--thresholds", str(th)]) == 0
    assert "=== DONE ===" in capsys.readouterr().out


def test_deploy_explicit_thresholds(tmp_path, capsys):
    from birdnet_stm32_tpu.config import ModelConfig

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=2, class_names=["a", "b"],
                      audio_frontend="hybrid", mag_scale="pwl", alpha=0.25)
    model = tmp_path / "bird_quantized.tflite"
    model.write_bytes(b"\x00" * 16)
    cfg.save(tmp_path / "bird_model_config.json")
    th = tmp_path / "elsewhere" / "thresholds.json"
    th.parent.mkdir()
    th.write_text(json.dumps({"a": 0.4}))
    out_dir = tmp_path / "bundle"
    assert dispatch(["deploy", "--model_path", str(model),
                     "--output_dir", str(out_dir), "--skip_validate",
                     "--thresholds", str(th)]) == 0
    assert json.loads((out_dir / "thresholds.json").read_text()) == {"a": 0.4}
    # A named-but-missing file fails loudly instead of silently omitting.
    with pytest.raises(SystemExit, match="thresholds not found"):
        dispatch(["deploy", "--model_path", str(model),
                  "--output_dir", str(tmp_path / "b2"), "--skip_validate",
                  "--thresholds", str(tmp_path / "nope.json")])
