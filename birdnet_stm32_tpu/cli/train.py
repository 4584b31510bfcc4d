"""Train CLI: dataset discovery -> loaders -> pjit training loop.

Arg-surface parity with reference cli/train.py:132-269 (the flags that have
TPU-side meaning), with the same defaults and the same quality-features-on-
by-default --no_* off-switches. Dispatches to QAT / linear-probe / LR-finder
/ tuning like reference cli/train.py:303-321.
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def get_args(argv=None):
    p = argparse.ArgumentParser("birdnet_stm32_tpu train")
    # Data
    p.add_argument("--data_path_train", required=True)
    p.add_argument("--data_path_val", default=None)
    p.add_argument("--val_split", type=float, default=0.2)
    p.add_argument("--top_n_classes", "--max_classes", type=int, default=None,
                   help="use top N classes by sample count (reference --max_classes)")
    p.add_argument("--max_samples_per_class", "--max_samples", type=int, default=None)
    p.add_argument("--upsample_ratio", type=float, default=0.5)
    p.add_argument("--no_upsample", action="store_true")
    p.add_argument("--max_chunks_per_file", type=int, default=2)
    p.add_argument("--snr_threshold", type=float, default=0.1,
                   help="activity-ratio threshold on WAVEFORM chunks (the "
                        "reference's 0.25 applies to spectrogram features, "
                        "where ratios run systematically higher)")
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--prefetch_batches", type=int, default=None,
                   help="accepted for reference compatibility (host-side "
                        "prefetch depth is managed adaptively by "
                        "AdaptiveLoaderTuner / loader_control)")
    # Audio / frontend
    p.add_argument("--sample_rate", type=int, default=24000)
    p.add_argument("--chunk_duration", type=float, default=3.0)
    p.add_argument("--fft_length", type=int, default=512)
    p.add_argument("--num_mels", type=int, default=64)
    p.add_argument("--spec_width", type=int, default=256)
    p.add_argument("--audio_frontend", default="hybrid")
    p.add_argument("--mag_scale", default="pwl")
    p.add_argument("--no_frontend_trainable", action="store_true")
    p.add_argument("--frontend_trainable", action="store_true",
                   help="accepted for reference compatibility (cli/train.py:178 "
                        "there; trainable is already the default here — use "
                        "--no_frontend_trainable to freeze)")
    # Architecture
    p.add_argument("--alpha", type=float, default=1.0)
    p.add_argument("--depth_multiplier", type=int, default=1)
    p.add_argument("--embeddings_size", type=int, default=256)
    p.add_argument("--dropout_rate", "--dropout", type=float, default=0.5)
    p.add_argument("--no_se", action="store_true")
    p.add_argument("--se_reduction", type=int, default=8)
    p.add_argument("--no_inverted_residual", action="store_true")
    p.add_argument("--expansion_factor", type=int, default=2)
    p.add_argument("--attention_pooling", "--use_attention_pooling",
                   dest="attention_pooling", action="store_true")
    # Optimization
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--steps_per_epoch", type=int, default=0, help="0 = estimate from data")
    p.add_argument("--batch_size", type=int, default=32)
    p.add_argument("--learning_rate", type=float, default=None,
                   help="default 1e-3 (QAT default 1e-5 unless given)")
    p.add_argument("--optimizer", default="adam", choices=["adam", "sgd", "adamw"])
    p.add_argument("--weight_decay", type=float, default=0.0)
    p.add_argument("--gradient_clip_norm", "--grad_clip", type=float, default=1.0)
    p.add_argument("--patience", type=int, default=10)
    p.add_argument("--monitor", default="val_loss",
                   choices=["val_loss", "val_roc_auc"],
                   help="best-checkpoint / early-stop criterion (default "
                        "val_loss, the reference's Keras-callback "
                        "semantics). Mixup's label-union targets can push "
                        "val BCE up while ranking is still improving on "
                        "small corpora — monitor val_roc_auc there")
    p.add_argument("--multilabel", action="store_true")
    p.add_argument("--focal_gamma", type=float, default=None)
    p.add_argument("--label_smoothing", type=float, default=0.0)
    p.add_argument("--no_class_weights", action="store_true")
    # Augmentation
    p.add_argument("--mixup_alpha", type=float, default=0.2)
    p.add_argument("--mixup_probability", type=float, default=0.25)
    p.add_argument("--no_mixup", action="store_true")
    p.add_argument("--no_spec_augment", action="store_true")
    p.add_argument("--freq_mask_max", type=int, default=8,
                   help="SpecAugment max frequency-mask width (bins)")
    p.add_argument("--time_mask_max", type=int, default=25,
                   help="SpecAugment max time-mask width (frames)")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 forward/backward on the MXU; master params, "
                        "loss, and optimizer stay float32")
    p.add_argument("--loss", default="auto",
                   choices=["auto", "bce", "cce", "focal"],
                   help="override the auto-selected loss (reference --loss)")
    p.add_argument("--max_duration", type=float, default=30.0,
                   help="max seconds decoded per file during loading")
    p.add_argument("--train_feed", default="int16",
                   choices=["int16", "ulaw", "float32"],
                   help="host->device training-waveform encoding. int16 "
                        "(default): half the float32 bytes; PCM16 WAVs at "
                        "the model rate ship raw codes and dequantize "
                        "BIT-EXACTLY on device, other sources requantize at "
                        "~1 LSB. ulaw: 8-bit mu-law, QUARTER of the float32 "
                        "bytes at ~2.2%% relative waveform error (training "
                        "quality cost measured by the accuracy ladder, "
                        "ACCURACY.json). float32: raw waveforms")
    p.add_argument("--no_int16_feed", action="store_true",
                   help="deprecated alias for --train_feed float32")
    p.add_argument("--cache_dir", default=None,
                   help="decoded-waveform cache directory: files decode + "
                        "resample once (epoch 1); later epochs memmap-slice "
                        "their random-offset windows (~5 MB/min of audio on "
                        "disk). Off by default (reference re-decodes every "
                        "epoch)")
    p.add_argument("--n_mfcc", type=int, default=20,
                   help="MFCC coefficient count (mfcc frontend)")
    # Run control
    p.add_argument("--run_dir", "--checkpoint_path", dest="run_dir",
                   default="runs/birdnet_tpu",
                   help="Run directory (reference --checkpoint_path: a .keras "
                        "file path is accepted and mapped to its directory)")
    p.add_argument("--resume", action="store_true")
    p.add_argument("--resume_weights_only", action="store_true",
                   help="with --resume: restore best weights + epoch only "
                        "and restart the optimizer (the reference's resume "
                        "semantics). Default resume also restores optimizer "
                        "state from the per-epoch last/ checkpoint, so a "
                        "preempted run continues mid-schedule")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--no_mesh", action="store_true", help="single-device (skip data-parallel mesh)")
    # Mode dispatch (reference cli/train.py:303-321)
    p.add_argument("--qat", action="store_true", help="QAT fine-tune an existing run_dir checkpoint")
    p.add_argument("--qat_act", action="store_true",
                   help="with --qat: fake-quantize activations/input/logits "
                        "too (per-tensor STE) — simulates what PTQ actually "
                        "quantizes, unlike the reference's weights-only "
                        "recipe (measured uplift: ACCURACY.json "
                        "int8_qat_act row)")
    p.add_argument("--qat_learning_rate", type=float, default=None,
                   help="QAT fine-tune LR (default: --learning_rate when "
                        "given, else 1e-5)")
    p.add_argument("--linear_probe", action="store_true", help="retrain only the head on the new data")
    p.add_argument("--find_lr", action="store_true", help="run the LR finder and exit")
    p.add_argument("--tune", type=int, nargs="?", const=-1, default=0, metavar="N",
                   help="search N trials (bare --tune takes the count from "
                        "--n_trials, the reference spelling)")
    p.add_argument("--n_trials", type=int, default=20,
                   help="trial count for bare --tune (reference cli/train.py:244)")
    args = p.parse_args(argv)
    if args.tune and args.tune < 0:
        args.tune = args.n_trials
    # Track explicit --learning_rate: the QAT branch defaults to 1e-5 only
    # when the user did NOT ask for a rate (a sentinel equal to the default
    # silently overrode explicit 1e-3 requests).
    args.lr_given = args.learning_rate is not None
    if args.learning_rate is None:
        args.learning_rate = 1e-3
    if args.no_int16_feed:
        args.train_feed = "float32"
    return args


def build_loaders(args, for_qat: bool = False, ship: str = "float32"):
    """Discover files, split, upsample, and build train/val iterators.

    ship: training-feed waveform encoding — 'float32' | 'int16' | 'ulaw'
    (LoaderConfig.ship_int16/ship_ulaw; validation always ships float32).
    """
    from birdnet_stm32_tpu.data.dataset import (
        get_classes_with_most_samples,
        load_file_paths_from_directory,
        one_hot_labels,
        upsample_minority_classes,
    )
    from birdnet_stm32_tpu.data.pipeline import AudioLoader, LoaderConfig

    rng = np.random.default_rng(args.seed)
    classes = None
    if args.top_n_classes:
        classes = get_classes_with_most_samples(args.data_path_train, args.top_n_classes)
    paths, labels, class_names = load_file_paths_from_directory(
        args.data_path_train, classes=classes,
        max_samples_per_class=args.max_samples_per_class, rng=rng)
    if not paths:
        raise SystemExit(f"no audio files under {args.data_path_train}")

    if args.data_path_val:
        val_paths, val_labels, _ = load_file_paths_from_directory(
            args.data_path_val, classes=class_names, rng=rng)
    else:
        idx = rng.permutation(len(paths))
        n_val = max(1, int(len(paths) * args.val_split))
        val_paths = [paths[i] for i in idx[:n_val]]
        val_labels = [labels[i] for i in idx[:n_val]]
        paths = [paths[i] for i in idx[n_val:]]
        labels = [labels[i] for i in idx[n_val:]]

    if (not args.no_upsample and not for_qat
            and args.upsample_ratio and 0 < args.upsample_ratio < 1.0):
        # Reference guard (cli/train.py:342): ratios >= 1 would DUPLICATE
        # every class past the former max instead of lifting minorities.
        paths, labels = upsample_minority_classes(paths, labels, args.upsample_ratio, rng)

    lcfg = LoaderConfig(
        sample_rate=args.sample_rate, chunk_duration=args.chunk_duration,
        num_classes=len(class_names), max_chunks_per_file=args.max_chunks_per_file,
        snr_threshold=args.snr_threshold, seed=args.seed,
        load_duration=getattr(args, "max_duration", 30.0),
        cache_dir=getattr(args, "cache_dir", None),
        ship_int16=ship == "int16",
        ship_ulaw=ship == "ulaw",
    )
    from birdnet_stm32_tpu.parallel.distributed import host_shard

    shard, num_shards = host_shard()
    train_loader = AudioLoader(
        paths, one_hot_labels(labels, class_names), lcfg,
        batch_size=args.batch_size, num_workers=args.num_workers,
        shard_index=shard, num_shards=num_shards)
    import dataclasses

    # Validation dataset parity (reference cli/train.py:388-409):
    # deterministic reads, ONE chunk per file, and the reference's 5x
    # activity-threshold jump (train 0.1 -> val 0.5, both hardcoded
    # there; scale the user's train threshold by the same ratio).
    # Validation always ships float32: the trainer's val loop feeds
    # inputs_for_config directly (no batcher to dequantize), and the val
    # pass is a small fraction of the epoch's bytes.
    val_lcfg = dataclasses.replace(
        lcfg, random_offset=False, max_chunks_per_file=1,
        snr_threshold=args.snr_threshold * 5.0, ship_int16=False,
        ship_ulaw=False)
    val_loader = AudioLoader(
        val_paths, one_hot_labels(val_labels, class_names), val_lcfg,
        batch_size=args.batch_size, num_workers=args.num_workers,
        shuffle=False, infinite=False)
    return train_loader, val_loader, class_names, labels


def balanced_class_weights(labels: list[str], class_names: list[str]) -> np.ndarray:
    """n_samples / (n_classes * count_c) (reference cli/train.py:483-497).
    One Counter pass: the naive per-class scan is O(N*C) and stalls startup
    for minutes at 500k labels x 500 classes."""
    from collections import Counter

    by_class = Counter(labels)
    counts = np.array([max(1, by_class.get(c, 0)) for c in class_names], np.float64)
    total = sum(by_class.get(c, 0) for c in class_names)
    return (total / (len(class_names) * counts)).astype(np.float32)


def main(argv=None) -> int:
    args = get_args(argv)

    # Multi-host: must run before any other JAX API so host_shard() and the
    # global mesh see every process (no-op without JAX_COORDINATOR_ADDRESS
    # / JAX_NUM_PROCESSES / JAX_PROCESS_ID).
    from birdnet_stm32_tpu.parallel.distributed import initialize_distributed

    initialize_distributed()

    import jax

    from birdnet_stm32_tpu.config import ModelConfig, normalize_frontend_name
    from birdnet_stm32_tpu.data.pipeline import make_train_batcher
    from birdnet_stm32_tpu.data.species import save_species_list
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.parallel.mesh import make_mesh
    from birdnet_stm32_tpu.training.trainer import AdaptiveLoaderTuner, train_model
    from birdnet_stm32_tpu.utils.logging import info, ok
    from birdnet_stm32_tpu.utils.prng import set_global_seed

    set_global_seed(args.seed)
    args.audio_frontend = normalize_frontend_name(args.audio_frontend)
    # Reference head rule (cli/train.py:432,471 there): the head is sigmoid /
    # the loss BCE whenever mixup is active — mixup's label-union targets are
    # multilabel by construction, and softmax-vs-union training produces the
    # under-confident operating points the reference never ships. --multilabel
    # stays as an explicit opt-in for --no_mixup runs. QAT / linear-probe
    # branches below override this from the BASE checkpoint's recorded head.
    explicit_multilabel = args.multilabel
    if not args.no_mixup and args.mixup_probability > 0:
        args.multilabel = True
    run_dir = Path(args.run_dir)
    keras_stem = None
    if run_dir.suffix == ".keras":
        # Reference --checkpoint_path names a .keras FILE; this framework's
        # runs are directories — use the file's directory, and remember the
        # stem so reference-named sidecars (<stem>_model_config.json,
        # <stem>_labels.txt — reference cli/train.py:466,526) are written
        # too, keeping the documented train->convert->evaluate flow intact.
        keras_stem = run_dir.stem
        run_dir = run_dir.parent
        args.run_dir = str(run_dir)  # downstream branches (tuning) use args
        info("train", f"--checkpoint_path file mapped to run dir {run_dir}")

    if args.qat_act and not args.qat:
        raise SystemExit("--qat_act requires --qat (it extends the QAT "
                         "fine-tune step; plain training never fake-quantizes)")
    if args.qat:
        from birdnet_stm32_tpu.quant.qat import run_qat
        from birdnet_stm32_tpu.training.checkpoint import _is_multilabel

        # The QAT fine-tune keeps the BASE checkpoint's head: its loss and
        # the recorded head of the QAT'd run must match what the base run
        # trained (mixup is off during QAT, so the mixup rule above does
        # not apply here).
        args.multilabel = explicit_multilabel or _is_multilabel(run_dir)
        cfg = ModelConfig.load(run_dir / "model_config.json")
        for f in ("sample_rate", "chunk_duration", "num_mels", "spec_width",
                  "fft_length", "audio_frontend", "mag_scale"):
            setattr(args, f, getattr(cfg, f))
        # QAT keeps the compressed feed (int16 default, --train_feed ulaw
        # for quarter-bandwidth): at flagship geometry the float32 feed is
        # 2.7 GB/epoch through the link, which dominated QAT wall time.
        # The batcher stays augmentation-free (QAT policy) — it only
        # dequantizes + extracts features.
        train_loader, val_loader, class_names, _ = build_loaders(
            args, for_qat=True, ship=args.train_feed)
        mesh = None if args.no_mesh else make_mesh()
        qat_batcher = None
        if args.train_feed != "float32":
            qat_batcher = make_train_batcher(
                cfg, spec_augment=False, mixup_probability=0.0,
                input_dtype=args.train_feed)
        # Reference QAT takes the plain --learning_rate (qat.py:287-293
        # there); --qat_learning_rate stays as an explicit override.
        qat_lr = args.qat_learning_rate
        if qat_lr is None:
            qat_lr = args.learning_rate if args.lr_given else 1e-5
        run_qat(run_dir, iter(train_loader), lambda: iter(val_loader),
                epochs=args.epochs, steps_per_epoch=args.steps_per_epoch or 100,
                learning_rate=qat_lr,
                multilabel=args.multilabel, mesh=mesh,
                num_classes=len(class_names), seed=args.seed,
                out_dir=(run_dir / f"{keras_stem}_qat") if keras_stem else None,
                batcher=qat_batcher, monitor=args.monitor,
                act_fq=args.qat_act)
        return 0

    cfg_kwargs = dict(
        sample_rate=args.sample_rate, chunk_duration=args.chunk_duration,
        fft_length=args.fft_length, num_mels=args.num_mels, spec_width=args.spec_width,
        audio_frontend=args.audio_frontend, mag_scale=args.mag_scale,
        alpha=args.alpha, depth_multiplier=args.depth_multiplier,
        embeddings_size=args.embeddings_size, dropout_rate=args.dropout_rate,
        use_se=not args.no_se, se_reduction=args.se_reduction,
        use_inverted_residual=not args.no_inverted_residual,
        expansion_factor=args.expansion_factor,
        use_attention_pooling=args.attention_pooling,
        frontend_trainable=not args.no_frontend_trainable,
        n_mfcc=args.n_mfcc,
    )
    if args.linear_probe:
        # The probe's new head trains WITHOUT mixup (plain feature batches
        # below), so the mixup->sigmoid rule does not apply; only an
        # explicit --multilabel opts the probe head into sigmoid.
        args.multilabel = explicit_multilabel
        # The probe trains on the BASE checkpoint's audio geometry: loaders
        # must read at ITS sample rate / chunk length, not the CLI defaults
        # (the QAT branch syncs the same way) — otherwise waveforms are
        # silently pitch-shifted through the wrong frontend.
        from birdnet_stm32_tpu.ops.frontend import inputs_for_config
        from birdnet_stm32_tpu.training.checkpoint import load_checkpoint
        from birdnet_stm32_tpu.training.linear_probe import run_linear_probe

        import jax.numpy as jnp

        _, base_vars, base_cfg = load_checkpoint(run_dir, class_activation="none")
        for f in ("sample_rate", "chunk_duration", "num_mels", "spec_width",
                  "fft_length", "audio_frontend", "mag_scale"):
            setattr(args, f, getattr(base_cfg, f))
        train_loader, val_loader, class_names, _ = build_loaders(args)

        def to_inputs(it):
            for wave, labels in it:
                yield np.asarray(inputs_for_config(jnp.asarray(wave), base_cfg)), labels

        run_linear_probe(
            base_vars, base_cfg, class_names,
            to_inputs(iter(train_loader)), lambda: to_inputs(iter(val_loader)),
            (run_dir / f"{keras_stem}_probe") if keras_stem
            else run_dir.with_name(run_dir.name + "_probe"),
            epochs=args.epochs, steps_per_epoch=args.steps_per_epoch or 50,
            learning_rate=args.learning_rate, multilabel=args.multilabel, seed=args.seed)
        return 0

    # Compressed feed (int16 = half, ulaw = quarter of the float32
    # host->device bytes/step): standard training path only — find_lr/tune/
    # probe feed model inputs without the dequantizing batcher.
    feed = args.train_feed if not (args.find_lr or args.tune) else "float32"
    train_loader, val_loader, class_names, raw_labels = build_loaders(
        args, ship=feed)
    cfg = ModelConfig(num_classes=len(class_names), class_names=class_names, **cfg_kwargs)
    info("train", f"{len(train_loader.paths)} train files, "
                  f"{len(val_loader.paths)} val files, {len(class_names)} classes")

    if args.tune:
        # Tuning rebuilds loaders/models per trial: skip the mesh + model
        # init below (a real param-init trace, minutes through a tunnel).
        return _run_tuning(args, cfg_kwargs, class_names)

    mesh = None if args.no_mesh else make_mesh()
    if mesh is not None:
        info("train", f"data-parallel mesh over {len(jax.devices())} devices")

    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(args.seed))

    if args.find_lr:
        from birdnet_stm32_tpu.ops.frontend import inputs_for_config
        from birdnet_stm32_tpu.training.losses import make_loss_fn
        from birdnet_stm32_tpu.training.lr_finder import run_lr_finder

        import jax.numpy as jnp

        def model_batches():
            for wave, labels in iter(train_loader):
                yield np.asarray(inputs_for_config(jnp.asarray(wave), cfg)), labels

        out = run_lr_finder(model, variables, model_batches(),
                            make_loss_fn(multilabel=args.multilabel))
        ok("lr_finder", f"suggested learning rate: {out['suggested_lr']:.2e}")
        return 0

    steps = args.steps_per_epoch or max(
        20, train_loader.estimate_samples_per_epoch() // args.batch_size)
    # Smoothing is applied in the LOSS (reference cli/train.py:475-479 via
    # the Keras losses); its mixup never smooths (generator.py:410), so
    # passing label_smoothing to the batcher too would smooth twice.
    import jax.numpy as jnp

    batcher = make_train_batcher(
        cfg, spec_augment=not args.no_spec_augment,
        mixup_alpha=args.mixup_alpha,
        mixup_probability=0.0 if args.no_mixup else args.mixup_probability,
        freq_mask_max=args.freq_mask_max, time_mask_max=args.time_mask_max,
        stft_precision="high" if args.mixed_precision else "highest",
        feature_dtype=jnp.bfloat16 if args.mixed_precision else None,
        input_dtype=feed if feed != "float32" else None)
    class_weights = None if args.no_class_weights else balanced_class_weights(
        raw_labels, class_names)

    loss_fn_override = None
    if args.loss != "auto":
        from birdnet_stm32_tpu.training.losses import make_loss_fn

        loss_fn_override = make_loss_fn(
            multilabel=args.loss == "bce",
            focal_gamma=(args.focal_gamma or 2.0) if args.loss == "focal" else None,
            label_smoothing=args.label_smoothing,
            class_weights=class_weights)

    run_dir.mkdir(parents=True, exist_ok=True)
    cfg.save(run_dir / "model_config.json")
    save_species_list(class_names, run_dir / "labels.txt")
    if keras_stem:
        cfg.save(run_dir / f"{keras_stem}_model_config.json")
        save_species_list(class_names, run_dir / f"{keras_stem}_labels.txt")

    train_model(
        model, variables, cfg, iter(train_loader), lambda: iter(val_loader), run_dir,
        epochs=args.epochs, steps_per_epoch=steps,
        learning_rate=args.learning_rate, optimizer=args.optimizer,
        weight_decay=args.weight_decay, gradient_clip_norm=args.gradient_clip_norm,
        patience=args.patience, multilabel=args.multilabel,
        focal_gamma=args.focal_gamma, label_smoothing=args.label_smoothing,
        class_weights=class_weights, batcher=batcher, mesh=mesh,
        resume=args.resume, resume_weights_only=args.resume_weights_only,
        seed=args.seed,
        loader_tuner=AdaptiveLoaderTuner(train_loader.loader_control),
        loss_fn_override=loss_fn_override,
        mixed_precision=args.mixed_precision,
        monitor=args.monitor)
    ok("train", f"artifacts in {run_dir}")
    return 0


def _run_tuning(args, cfg_kwargs: dict, class_names: list[str]) -> int:
    """Random-search over the reference's space (training/tuner.py)."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.data.pipeline import make_train_batcher
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.training.trainer import train_model
    from birdnet_stm32_tpu.training.tuner import run_tuning
    from birdnet_stm32_tpu.utils.logging import info, ok

    def objective(trial):
        p = trial.params
        kw = dict(cfg_kwargs)
        kw.update(
            alpha=p["alpha"], depth_multiplier=p["depth_multiplier"],
            embeddings_size=p["embeddings_size"], dropout_rate=p["dropout_rate"],
            use_se=p["use_se"], se_reduction=p.get("se_reduction", 8),
            use_inverted_residual=p["use_inverted_residual"],
            expansion_factor=p.get("expansion_factor", 2),
            use_attention_pooling=p["use_attention_pooling"],
        )
        cfg = ModelConfig(num_classes=len(class_names), class_names=class_names, **kw)
        args.batch_size = p["batch_size"]
        train_loader, val_loader, _, _ = build_loaders(args)
        model = build_dscnn(cfg, class_activation="none")
        variables = init_model(model, cfg, jax.random.key(args.seed + trial.number))
        batcher = make_train_batcher(cfg, mixup_probability=p["mixup_probability"])
        info("tune", f"trial {trial.number}: {p}")

        def report_epoch(epoch_i, metrics):
            # Median pruning (reference tuner.py MedianPruner parity):
            # hopeless trials stop at the epoch boundary instead of
            # burning their full budget.
            auc = metrics.get("val_roc_auc", float("nan"))
            if not np.isnan(auc):
                # Index by REPORT count, not epoch: a skipped NaN epoch
                # would shift every later value one step left and the
                # median pruner would compare mismatched epochs.
                trial.report(auc, len(trial.intermediate))

        _, history = train_model(
            model, variables, cfg, iter(train_loader), lambda: iter(val_loader),
            Path(args.run_dir) / f"trial_{trial.number}",
            epochs=max(2, args.epochs // 5), steps_per_epoch=args.steps_per_epoch or 50,
            learning_rate=p["learning_rate"], optimizer=p["optimizer"],
            weight_decay=p["weight_decay"], gradient_clip_norm=p["gradient_clip_norm"],
            multilabel=args.multilabel, label_smoothing=p["label_smoothing"],
            batcher=batcher, seed=args.seed, on_epoch_end=report_epoch,
            monitor=args.monitor)
        return max((h["val_roc_auc"] for h in history
                    if not np.isnan(h["val_roc_auc"])), default=0.0)

    best = run_tuning(objective, args.tune, args.run_dir, seed=args.seed)
    ok("tune", f"best trial {best.number}: auc={best.value:.4f} -> "
               f"{Path(args.run_dir) / 'best_params.json'}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
