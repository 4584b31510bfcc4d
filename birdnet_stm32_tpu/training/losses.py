"""Classification losses: (weighted) BCE/CCE, focal, distillation.

Behavioral parity with the reference's loss stack — auto BCE-vs-CCE by
multilabel flag (training/trainer.py:126-127), label smoothing + balanced
class weights (cli/train.py:483-497), BinaryFocalLoss
(training/losses.py:10-54), DistillationLoss (training/distillation.py:10-76)
— but computed on logits (numerically stable, XLA-friendly) instead of on
activation outputs as the Keras versions do.

All functions map ([B, C] logits, [B, C] targets) -> scalar.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import optax


def smooth_labels(labels: jax.Array, smoothing: float,
                  binary: bool = False) -> jax.Array:
    """Keras label smoothing: y*(1-eps) + eps/C for categorical CE,
    y*(1-eps) + eps/2 for binary CE (tf.keras.losses.BinaryCrossentropy) —
    the reference reaches both through the Keras losses (cli/train.py:473).
    Using eps/C for multilabel would smooth ~C/2x weaker than the
    reference."""
    if smoothing <= 0:
        return labels
    if binary:
        return (1.0 - smoothing) * labels + smoothing / 2.0
    C = labels.shape[-1]
    return (1.0 - smoothing) * labels + smoothing / C


def categorical_crossentropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Softmax cross-entropy with optional per-class weights.

    Class weights follow Keras semantics: each example is weighted by the
    weight of its (argmax) true class.
    """
    labels = smooth_labels(labels, label_smoothing)
    per_example = optax.softmax_cross_entropy(logits, labels)
    if class_weights is not None:
        w = class_weights[jnp.argmax(labels, axis=-1)]
        return jnp.sum(per_example * w) / (jnp.sum(w) + 1e-8)
    return jnp.mean(per_example)


def binary_crossentropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean sigmoid BCE over classes, optional per-class weights."""
    labels = smooth_labels(labels, label_smoothing, binary=True)
    per_class = optax.sigmoid_binary_cross_entropy(logits, labels)  # [B, C]
    if class_weights is not None:
        # Weighted mean over [B, C]: uniform weights reduce exactly to
        # jnp.mean(per_class).
        per_class = per_class * class_weights[None, :]
        return jnp.sum(per_class) / (labels.shape[0] * jnp.sum(class_weights) + 1e-8)
    return jnp.mean(per_class)


def binary_focal_loss(
    logits: jax.Array,
    labels: jax.Array,
    gamma: float = 2.0,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Focal loss (Lin et al. 2017); gamma=0 reduces to BCE.

    Matches reference BinaryFocalLoss(from_logits=True): mean over all
    [B, C] entries of (1 - p_t)^gamma * BCE.
    """
    labels = smooth_labels(labels, label_smoothing)
    bce = optax.sigmoid_binary_cross_entropy(logits, labels)
    p = jax.nn.sigmoid(logits)
    p_t = labels * p + (1.0 - labels) * (1.0 - p)
    return jnp.mean((1.0 - p_t) ** gamma * bce)


def distillation_loss(
    logits: jax.Array,
    hard_labels: jax.Array,
    soft_labels: jax.Array,
    alpha: float = 0.5,
    temperature: float = 3.0,
    multilabel: bool = False,
) -> jax.Array:
    """(1-a) * hard loss + a * T^2 * KL(teacher_T || student_T).

    The reference feeds teacher *probabilities*; both are re-smoothed at
    temperature T in log space (distillation.py:58-68).
    """
    if multilabel:
        hard = binary_crossentropy(logits, hard_labels)
    else:
        hard = categorical_crossentropy(logits, hard_labels)
    T = temperature
    student_logp = jax.nn.log_softmax(jax.nn.log_softmax(logits) / T, axis=-1)
    teacher_p = jax.nn.softmax(jnp.log(soft_labels + 1e-7) / T, axis=-1)
    kl = jnp.sum(teacher_p * (jnp.log(teacher_p + 1e-7) - student_logp), axis=-1)
    return (1.0 - alpha) * hard + alpha * (T * T) * jnp.mean(kl)


def make_loss_fn(
    multilabel: bool = False,
    focal_gamma: float | None = None,
    label_smoothing: float = 0.0,
    class_weights=None,
):
    """Build the training loss per the reference's auto-selection rules.

    - focal_gamma set  -> binary focal loss (multi-label); label smoothing
      is IGNORED like the reference (cli/train.py:473-479 selects
      BinaryFocalLoss(gamma) and never passes label_smoothing to it)
    - multilabel       -> BCE (Keras eps/2 smoothing)
    - otherwise        -> CCE (eps/C smoothing)
    """
    cw = None if class_weights is None else jnp.asarray(class_weights, jnp.float32)
    if focal_gamma is not None:
        return partial(binary_focal_loss, gamma=focal_gamma)
    if multilabel:
        return partial(binary_crossentropy, class_weights=cw, label_smoothing=label_smoothing)
    return partial(categorical_crossentropy, class_weights=cw, label_smoothing=label_smoothing)
