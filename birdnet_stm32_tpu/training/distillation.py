"""Knowledge distillation: teacher-soft-label training.

Parity with reference training/distillation.py:10-76 including its wire
contract: the combined target is [B, 2C] = concat(hard one-hot, teacher
probabilities), so the standard training loop carries it like any label
tensor; the loss splits it and mixes hard CE with T^2-scaled KL to the
temperature-smoothed teacher.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.training.losses import distillation_loss


def make_distillation_loss(num_classes: int, alpha: float = 0.5,
                           temperature: float = 3.0,
                           multilabel: bool = False) -> Callable:
    """Loss over concatenated [B, 2C] targets (reference distillation.py:29-44)."""
    def loss_fn(logits: jax.Array, y_cat: jax.Array) -> jax.Array:
        hard = y_cat[:, :num_classes]
        soft = y_cat[:, num_classes:]
        return distillation_loss(logits, hard, soft, alpha=alpha,
                                 temperature=temperature, multilabel=multilabel)

    return loss_fn


def make_teacher_batcher(base_batcher: Callable, teacher_fn: Callable) -> Callable:
    """Wrap a device batcher so labels become [B, 2C] with teacher scores.

    Args:
        base_batcher: (key, wave, labels) -> (model_inputs, labels [B, C]).
        teacher_fn: jittable model_inputs -> teacher probabilities [B, C]
            (e.g. a jitted apply of the transplanted flagship checkpoint).
    """
    def batcher(key, wave, labels):
        x, y = base_batcher(key, wave, labels)
        soft = jax.lax.stop_gradient(teacher_fn(x))
        return x, jnp.concatenate([y, soft], axis=-1)

    return batcher


def run_distillation(
    student_model,
    student_variables: dict,
    cfg,
    teacher_fn: Callable,
    train_batches,
    val_batches,
    run_dir,
    alpha: float = 0.5,
    temperature: float = 3.0,
    multilabel: bool = False,
    base_batcher: Callable | None = None,
    **train_kwargs,
):
    """Train a (typically smaller) student against a teacher.

    The student trains with the combined distillation loss; validation is
    computed with the same loss over teacher-augmented targets.

    Returns:
        (best variables, history) from train_model.
    """
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config
    from birdnet_stm32_tpu.training.trainer import train_model

    if base_batcher is None:
        def base_batcher(key, wave, labels):  # noqa: ANN001
            return inputs_for_config(jnp.asarray(wave), cfg), jnp.asarray(labels)

    batcher = make_teacher_batcher(base_batcher, teacher_fn)
    loss_fn = make_distillation_loss(cfg.num_classes, alpha, temperature, multilabel)

    def val_with_teacher():
        # Yield the computed features (not the waveform) alongside the
        # [B, 2C] hard ++ teacher targets: the trainer's validation loop
        # accepts pre-featurized batches, so the frontend runs once per
        # batch instead of once for the teacher and again for the student.
        for wave, labels in val_batches():
            x = inputs_for_config(jnp.asarray(wave), cfg)
            soft = jax.lax.stop_gradient(teacher_fn(x))
            yield x, jnp.concatenate([jnp.asarray(labels), soft], axis=-1)

    return train_model(
        student_model, student_variables, cfg,
        _map_batches(train_batches, batcher,
                     seed=int(train_kwargs.get("seed", 0))),
        val_with_teacher, run_dir,
        multilabel=multilabel, batcher=_passthrough, loss_fn_override=loss_fn,
        **train_kwargs,
    )


def _passthrough(key, x, y):
    return x, y


def _map_batches(batches, batcher, seed: int = 0):
    # Keyed by the run's seed: a hardcoded key would hand every
    # distillation run the identical augmentation stream.
    key = jax.random.key(seed)
    for i, (wave, labels) in enumerate(batches):
        yield batcher(jax.random.fold_in(key, i), jnp.asarray(wave), jnp.asarray(labels))
