"""Distillation tests: loss semantics and end-to-end student training.

Mirrors the reference's DistillationLoss contract (training/distillation.py:
10-76): targets are [B, 2C] = hard one-hot ++ teacher probabilities.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.training.distillation import (
    make_distillation_loss,
    make_teacher_batcher,
    run_distillation,
)
from birdnet_stm32_tpu.training.losses import categorical_crossentropy


def tiny_cfg(**kw):
    base = dict(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=2,
                class_names=["a", "b"], audio_frontend="librosa",
                mag_scale="none", alpha=0.25)
    base.update(kw)
    return ModelConfig(**base)


def test_alpha_zero_is_hard_loss():
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32))
    hard = jnp.asarray(np.eye(4, dtype=np.float32)[rng.integers(0, 4, 8)])
    soft = jax.nn.softmax(jnp.asarray(rng.normal(size=(8, 4)).astype(np.float32)))
    loss_fn = make_distillation_loss(4, alpha=0.0)
    y_cat = jnp.concatenate([hard, soft], axis=-1)
    np.testing.assert_allclose(float(loss_fn(logits, y_cat)),
                               float(categorical_crossentropy(logits, hard)),
                               rtol=1e-6)


def test_soft_term_pulls_toward_teacher():
    """With alpha=1, loss is minimized when student matches the teacher."""
    loss_fn = make_distillation_loss(2, alpha=1.0, temperature=1.0)
    hard = jnp.asarray([[1.0, 0.0]])
    soft = jnp.asarray([[0.25, 0.75]])
    y = jnp.concatenate([hard, soft], axis=-1)
    match = jnp.log(jnp.asarray([[0.25, 0.75]]))
    mismatch = jnp.log(jnp.asarray([[0.75, 0.25]]))
    assert float(loss_fn(match, y)) < float(loss_fn(mismatch, y))


def test_teacher_batcher_concatenates():
    cfg = tiny_cfg()
    def base(key, wave, labels):
        return wave, labels
    def teacher(x):
        return jnp.full((x.shape[0], 2), 0.5)
    b = make_teacher_batcher(base, teacher)
    x = jnp.zeros((4, 8))
    y = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 0, 1]])
    _, y_cat = b(jax.random.key(0), x, y)
    assert y_cat.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(y_cat[:, :2]), np.asarray(y))
    np.testing.assert_array_equal(np.asarray(y_cat[:, 2:]), 0.5)


@pytest.mark.slow
def test_run_distillation_end_to_end(tmp_path):
    cfg = tiny_cfg()
    teacher_model = build_dscnn(cfg, class_activation="softmax")
    teacher_vars = init_model(teacher_model, cfg, jax.random.key(1))
    teacher_fn = jax.jit(lambda x: teacher_model.apply(teacher_vars, x, train=False))

    student = build_dscnn(tiny_cfg(alpha=0.25), class_activation="none")
    student_vars = init_model(student, cfg, jax.random.key(2))

    rng = np.random.default_rng(0)
    T = cfg.chunk_samples

    def batches():
        while True:
            wave = rng.normal(0, 0.3, (8, T)).astype(np.float32)
            y = np.eye(2, dtype=np.float32)[rng.integers(0, 2, 8)]
            yield wave, y

    val = [next(batches()) for _ in range(2)]
    best, history = run_distillation(
        student, student_vars, cfg, teacher_fn, batches(), lambda: iter(val),
        tmp_path, alpha=0.5, temperature=2.0,
        epochs=1, steps_per_epoch=3, patience=5)
    assert len(history) == 1
    assert np.isfinite(history[0]["loss"])
    assert np.isfinite(history[0]["val_loss"])
