"""Optimizer factory + cosine schedule (reference trainer.py:11-39, 118-124)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

VALID_OPTIMIZERS = ("adam", "sgd", "adamw")


def clip_by_per_variable_norm(max_norm: float) -> optax.GradientTransformation:
    """Keras `clipnorm` semantics: each gradient TENSOR is clipped to
    ||g|| <= max_norm independently. (optax.clip_by_global_norm clips the
    concatenated norm instead — with many tensors each under the limit it
    would still scale everything down, diverging from the reference's
    Keras optimizers, trainer.py:11-39.)"""
    def clip_leaf(g):
        n = jnp.sqrt(jnp.sum(jnp.square(g)))
        return g * (max_norm / jnp.maximum(n, max_norm))

    def update(updates, state, params=None):
        del params
        return jax.tree_util.tree_map(clip_leaf, updates), state

    return optax.GradientTransformation(lambda _: optax.EmptyState(), update)


def cosine_schedule(learning_rate: float, epochs: int, steps_per_epoch: int) -> optax.Schedule:
    """CosineDecay over the full run, decaying to 0 (Keras alpha=0.0)."""
    return optax.cosine_decay_schedule(
        init_value=learning_rate, decay_steps=max(1, epochs * steps_per_epoch), alpha=0.0
    )


def build_optimizer(
    name: str,
    learning_rate: float | optax.Schedule,
    weight_decay: float = 0.0,
    gradient_clip_norm: float = 0.0,
) -> optax.GradientTransformation:
    """adam | sgd (momentum 0.9) | adamw (+weight decay), optional clipnorm."""
    name = name.lower()
    if name == "adam":
        tx = optax.adam(learning_rate)
    elif name == "sgd":
        tx = optax.sgd(learning_rate, momentum=0.9)
    elif name == "adamw":
        tx = optax.adamw(learning_rate, weight_decay=weight_decay)
    else:
        raise ValueError(f"Invalid optimizer: {name!r}. Valid options: {VALID_OPTIMIZERS}")
    if gradient_clip_norm and gradient_clip_norm > 0:
        tx = optax.chain(clip_by_per_variable_norm(gradient_clip_norm), tx)
    return tx
