"""Trainer loop tests: training converges on toy data, checkpoints, resume."""

import numpy as np
import pytest

import jax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.training.checkpoint import load_checkpoint, load_train_state
from birdnet_stm32_tpu.training.optimizer import build_optimizer, cosine_schedule
from birdnet_stm32_tpu.training.trainer import macro_roc_auc, train_model


def tiny_cfg(**kw):
    base = dict(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=2,
                class_names=["a", "b"], audio_frontend="librosa", mag_scale="none",
                alpha=0.25)
    base.update(kw)
    return ModelConfig(**base)


def toy_batches(cfg, batch=8, seed=0):
    """Synthetic separable data: class 0 = low tone, class 1 = high tone."""
    rng = np.random.default_rng(seed)
    T = cfg.chunk_samples
    t = np.arange(T) / cfg.sample_rate

    def make_batch():
        labels = rng.integers(0, 2, batch)
        waves = []
        for l in labels:
            f = 300 if l == 0 else 1500
            w = np.sin(2 * np.pi * f * t) + 0.05 * rng.normal(size=T)
            waves.append((w / np.abs(w).max()).astype(np.float32))
        y = np.eye(2, dtype=np.float32)[labels]
        return np.stack(waves), y

    return make_batch


def test_optimizer_factory():
    for name in ("adam", "sgd", "adamw"):
        tx = build_optimizer(name, 1e-3, weight_decay=1e-4, gradient_clip_norm=1.0)
        assert tx is not None
    with pytest.raises(ValueError):
        build_optimizer("rmsprop", 1e-3)


def test_cosine_schedule_decays():
    s = cosine_schedule(1.0, epochs=2, steps_per_epoch=50)
    assert float(s(0)) == pytest.approx(1.0)
    assert float(s(100)) == pytest.approx(0.0, abs=1e-6)
    assert float(s(50)) == pytest.approx(0.5, abs=1e-2)


def test_macro_roc_auc_degenerate():
    y = np.array([[1, 0], [1, 0]], np.float32)  # class 1 never positive
    s = np.array([[0.9, 0.1], [0.8, 0.2]], np.float32)
    assert np.isnan(macro_roc_auc(y, s))  # no column has both classes


@pytest.mark.integration
def test_train_loop_learns_and_checkpoints(tmp_path, monkeypatch):
    # Keras-default BN momentum (0.99) needs ~100s of steps before running
    # stats make eval mode usable; this tiny test trains for dozens, so speed
    # up the stat EMA instead of the test.
    import birdnet_stm32_tpu.models.blocks as blocks

    monkeypatch.setattr(blocks, "BN_MOMENTUM", 0.7)
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch() for _ in range(2)]
    run_dir = tmp_path / "run"
    best, history = train_model(
        model, variables, cfg,
        train_batches=train_iter(), val_batches=lambda: val_set,
        run_dir=run_dir, epochs=4, steps_per_epoch=8, learning_rate=3e-3,
        patience=10, multilabel=False, seed=0,
    )
    assert len(history) == 4
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["val_roc_auc"] > 0.9  # separable toy data
    assert (run_dir / "best").exists()
    assert (run_dir / "model_config.json").exists()
    assert (run_dir / "labels.txt").read_text().splitlines() == ["a", "b"]
    assert (run_dir / "history.csv").exists()
    assert (run_dir / "curves.png").exists()
    assert load_train_state(run_dir)["epoch"] >= 1

    # reload via checkpoint api
    model2, vars2, cfg2 = load_checkpoint(run_dir, class_activation="none")
    assert cfg2.num_classes == 2
    x, y = val_set[0]
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    import jax.numpy as jnp

    logits = jax.jit(lambda v, x: model2.apply(v, x, train=False))(vars2, inputs_for_config(jnp.asarray(x), cfg2))
    acc = (np.argmax(np.asarray(logits), 1) == np.argmax(y, 1)).mean()
    assert acc > 0.7


@pytest.mark.slow
@pytest.mark.integration
def test_train_raw_frontend_se_ir_attention(tmp_path, monkeypatch):
    """BASELINE.json config #3: raw waveform frontend (learned conv
    filterbank) + SE + inverted residuals + attention pooling trains
    end-to-end and learns the toy separation."""
    import birdnet_stm32_tpu.models.blocks as blocks

    monkeypatch.setattr(blocks, "BN_MOMENTUM", 0.7)
    cfg = tiny_cfg(audio_frontend="raw", mag_scale="none",
                   use_se=True, use_inverted_residual=True,
                   use_attention_pooling=True, frontend_trainable=True)
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch() for _ in range(2)]
    best, history = train_model(
        model, variables, cfg,
        train_batches=train_iter(), val_batches=lambda: val_set,
        run_dir=tmp_path / "run", epochs=6, steps_per_epoch=10,
        learning_rate=3e-3, patience=10, multilabel=False, seed=0,
    )
    assert history[-1]["loss"] < history[0]["loss"]
    assert history[-1]["val_roc_auc"] > 0.9
    # The learned filterbank actually moved from its init.
    model2, vars2, _ = load_checkpoint(tmp_path / "run", class_activation="none")
    fb0 = init_model(model2, cfg)["params"]["audio_frontend"]
    fb1 = vars2["params"]["audio_frontend"]
    leaves0 = jax.tree_util.tree_leaves(fb0)
    leaves1 = jax.tree_util.tree_leaves(fb1)
    assert any(np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-6
               for a, b in zip(leaves0, leaves1))


@pytest.mark.integration
def test_resume_continues_epoch_counter(tmp_path):
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch()]
    run_dir = tmp_path / "run"
    train_model(model, variables, cfg, train_iter(), lambda: val_set, run_dir,
                epochs=2, steps_per_epoch=4, learning_rate=1e-3)
    # resume for 2 more epochs: history grows, epoch counter continues
    _, history = train_model(model, variables, cfg, train_iter(), lambda: val_set, run_dir,
                             epochs=4, steps_per_epoch=4, learning_rate=1e-3, resume=True)
    assert len(history) == 2  # epochs 3..4 only
    assert load_train_state(run_dir)["epoch"] == 4


def test_sharded_eval_handles_partial_val_batch(tmp_path):
    """Mesh training with a val tail batch that doesn't divide the device
    count must not crash the data sharding (trainer falls back to an
    unsharded eval step for the tail) and weights val_loss by batch size."""
    from birdnet_stm32_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()  # 8 virtual CPU devices (conftest)
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    full = make_batch()
    tail = (full[0][:3], full[1][:3])  # 3 rows: not divisible by 8
    run_dir = tmp_path / "run"
    _, history = train_model(
        model, variables, cfg, train_iter(), lambda: [full, tail], run_dir,
        epochs=1, steps_per_epoch=2, learning_rate=1e-3, mesh=mesh)
    assert np.isfinite(history[0]["val_loss"])


def test_resume_preserves_best_val_watermark(tmp_path):
    """A resumed run must not overwrite a better pre-crash checkpoint: the
    best-val watermark is persisted in train_state.json and restored."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch()]
    run_dir = tmp_path / "run"
    train_model(model, variables, cfg, train_iter(), lambda: val_set, run_dir,
                epochs=2, steps_per_epoch=4, learning_rate=1e-3)
    state = load_train_state(run_dir)
    assert state.get("best_val") is not None
    assert np.isfinite(state["best_val"])


@pytest.mark.integration
def test_resume_restores_optimizer_state(tmp_path):
    """Full-state resume: the per-epoch last/ checkpoint carries the
    optimizer (adam moments + schedule step), so a resumed run continues
    mid-schedule instead of cold-restarting (superset of the reference's
    weights-only resume, trainer.py:96-116 there)."""
    from birdnet_stm32_tpu.parallel.steps import TrainState
    from birdnet_stm32_tpu.training.checkpoint import restore_full_state
    from birdnet_stm32_tpu.training.trainer import build_optimizer, cosine_schedule

    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch()]
    run_dir = tmp_path / "run"
    train_model(model, variables, cfg, train_iter(), lambda: val_set, run_dir,
                epochs=2, steps_per_epoch=4, learning_rate=1e-3)

    # last/ holds the full state at step 8 (2 epochs x 4 steps). The train
    # step donates its state, so build the template from fresh arrays.
    tx = build_optimizer("adam", cosine_schedule(1e-3, 4, 4), 0.0, 1.0)
    template = TrainState.create(init_model(model, cfg), tx)
    saved = restore_full_state(run_dir, template)
    assert saved is not None and int(saved.step) == 8
    # Adam moments are non-trivial (a cold restart would zero them).
    mu_leaves = jax.tree_util.tree_leaves(saved.opt_state)
    assert any(np.abs(np.asarray(leaf)).max() > 0 for leaf in mu_leaves
               if hasattr(leaf, "shape") and getattr(leaf, "size", 0) > 1)

    # Resume 2 more epochs: the step counter continues from 8 -> 16.
    train_model(model, init_model(model, cfg), cfg, train_iter(), lambda: val_set,
                run_dir, epochs=4, steps_per_epoch=4, learning_rate=1e-3, resume=True)
    resumed = restore_full_state(run_dir, template)
    assert int(resumed.step) == 16

    # Weights-only mode restarts the optimizer (reference semantics).
    train_model(model, init_model(model, cfg), cfg, train_iter(), lambda: val_set,
                run_dir, epochs=5, steps_per_epoch=4, learning_rate=1e-3,
                resume=True, resume_weights_only=True)
    fresh = restore_full_state(run_dir, template)
    assert int(fresh.step) == 4  # one epoch from a step-0 optimizer


def test_frozen_frontend_bn_stats_do_not_drift(tmp_path):
    """frontend_trainable=False must freeze the raw filterbank's BN
    completely: the reference builds those sublayers trainable=False, which
    runs BN in inference mode with NO stat updates — masking gradients
    alone would still drift the running statistics every step."""
    cfg = tiny_cfg(audio_frontend="raw", mag_scale="none",
                   frontend_trainable=False)
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    # Snapshot BEFORE training: the train step donates its state buffers.
    fe_stats_before = jax.device_get(variables["batch_stats"]["audio_frontend"])
    stem_before = np.asarray(
        jax.device_get(variables["batch_stats"]["stem_bn"]["mean"]))
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    train_model(model, variables, cfg, train_iter(), lambda: [make_batch()],
                tmp_path / "run", epochs=1, steps_per_epoch=4,
                learning_rate=1e-3)
    _, vars2, _ = load_checkpoint(tmp_path / "run", class_activation="none")
    fe_stats_after = vars2["batch_stats"]["audio_frontend"]
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(fe_stats_before)[0],
        jax.tree_util.tree_flatten_with_path(fe_stats_after)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=f"frontend stat {pa} drifted")
    # Backbone BN stats DID update (the freeze is frontend-scoped).
    stem_after = np.asarray(vars2["batch_stats"]["stem_bn"]["mean"])
    assert not np.array_equal(stem_before, stem_after)


def test_clipnorm_is_per_variable():
    """Keras clipnorm semantics: each gradient tensor clipped to
    ||g|| <= N independently — tensors already under the limit are
    untouched even when the GLOBAL norm exceeds it."""
    import jax.numpy as jnp

    from birdnet_stm32_tpu.training.optimizer import clip_by_per_variable_norm

    tx = clip_by_per_variable_norm(1.0)
    grads = {"a": np.full((4,), 0.4, np.float32),   # norm 0.8 < 1
             "b": np.full((16,), 0.5, np.float32)}  # norm 2.0 > 1
    # global norm = sqrt(0.64 + 4.0) > 1: global clipping would scale BOTH.
    out, _ = tx.update({k: jnp.asarray(v) for k, v in grads.items()},
                       tx.init(None))
    np.testing.assert_allclose(np.asarray(out["a"]), grads["a"], rtol=1e-6)
    assert np.linalg.norm(np.asarray(out["b"])) == pytest.approx(1.0, rel=1e-5)
    # Matches Keras clipnorm exactly.
    tf = pytest.importorskip("tensorflow")
    v = tf.Variable(np.zeros(16, np.float32))
    opt = tf.keras.optimizers.SGD(learning_rate=1.0, clipnorm=1.0)
    opt.apply_gradients([(tf.constant(grads["b"]), v)])
    np.testing.assert_allclose(-v.numpy(), np.asarray(out["b"]), rtol=1e-5)


def test_monitor_val_roc_auc_selects_ranking_best(tmp_path):
    """monitor='val_roc_auc' keeps the best-AUC checkpoint even when val
    loss worsens (mixup+BCE's label-union targets push val BCE up while
    ranking still improves — the measured small-corpus failure mode of
    the val_loss rule)."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    val_set = [make_batch()]
    run_dir = tmp_path / "run_auc"
    _, history = train_model(
        model, variables, cfg, train_iter(), lambda: val_set, run_dir,
        epochs=2, steps_per_epoch=2, learning_rate=1e-3, patience=100,
        seed=0, monitor="val_roc_auc")
    import json

    state = json.loads((run_dir / "train_state.json").read_text())
    best = state["best_val"]
    # The watermark is an AUC (in [0,1]) equal to the best recorded epoch
    # AUC — not a loss.
    aucs = [h["val_roc_auc"] for h in history if np.isfinite(h["val_roc_auc"])]
    assert best == pytest.approx(max(aucs))
    assert (run_dir / "best").exists()

    with pytest.raises(ValueError, match="monitor"):
        train_model(model, variables, cfg, train_iter(), lambda: val_set,
                    tmp_path / "bad", epochs=1, steps_per_epoch=1,
                    monitor="accuracy")


def test_monitor_nan_auc_still_saves_best(tmp_path):
    """A val set whose macro AUC is NaN every epoch (degenerate label
    columns) must still leave a usable best/ checkpoint (final-state
    fallback) instead of an empty run dir."""
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    w, _ = make_batch()
    # Every val label is class 0 -> every column degenerate -> AUC NaN.
    y = np.zeros((w.shape[0], cfg.num_classes), np.float32)
    y[:, 0] = 1.0
    run_dir = tmp_path / "run_nan"
    train_model(model, variables, cfg, train_iter(), lambda: [(w, y)],
                run_dir, epochs=2, steps_per_epoch=1, patience=100,
                seed=0, monitor="val_roc_auc")
    assert (run_dir / "best").exists()


def test_train_state_records_monitor(tmp_path):
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    make_batch = toy_batches(cfg)

    def train_iter():
        while True:
            yield make_batch()

    run_dir = tmp_path / "run_m"
    train_model(model, variables, cfg, train_iter(),
                lambda: [make_batch()], run_dir, epochs=1,
                steps_per_epoch=1, patience=100, seed=0,
                monitor="val_roc_auc")
    import json

    state = json.loads((run_dir / "train_state.json").read_text())
    # The watermark records WHICH metric it measures, so a resume under a
    # different --monitor resets instead of misreading an AUC as a loss.
    assert state["monitor"] == "val_roc_auc"


def test_history_csv_survives_empty_file(tmp_path):
    from birdnet_stm32_tpu.training.checkpoint import append_history_csv

    run_dir = tmp_path / "r"
    run_dir.mkdir()
    (run_dir / "history.csv").write_text("")  # truncated by a crash
    append_history_csv(run_dir, 1, {"loss": 0.5, "val_loss": 0.4})
    lines = (run_dir / "history.csv").read_text().splitlines()
    assert lines[0].startswith("epoch,")
    assert "0.5" in lines[1]
