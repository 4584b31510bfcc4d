"""Loss function tests (reference invariants: focal gamma=0 == BCE, etc.)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.training.losses import (
    binary_crossentropy,
    binary_focal_loss,
    categorical_crossentropy,
    distillation_loss,
    make_loss_fn,
    smooth_labels,
)


@pytest.fixture
def data(rng):
    logits = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    labels = jnp.asarray(np.eye(5, dtype=np.float32)[rng.integers(0, 5, 8)])
    return logits, labels


def test_focal_gamma0_equals_bce(data):
    logits, labels = data
    focal = binary_focal_loss(logits, labels, gamma=0.0)
    bce = binary_crossentropy(logits, labels)
    np.testing.assert_allclose(float(focal), float(bce), rtol=1e-6)


def test_focal_downweights_easy(data):
    logits, labels = data
    easy = 10.0 * (2 * labels - 1)  # confident correct logits
    assert float(binary_focal_loss(easy, labels, gamma=2.0)) < float(
        binary_focal_loss(easy, labels, gamma=0.0)
    )


def test_cce_matches_manual(data):
    logits, labels = data
    manual = -jnp.sum(labels * jax.nn.log_softmax(logits), axis=-1).mean()
    np.testing.assert_allclose(float(categorical_crossentropy(logits, labels)), float(manual), rtol=1e-6)


def test_label_smoothing():
    labels = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    sm = smooth_labels(labels, 0.1)
    np.testing.assert_allclose(np.asarray(sm), [[0.925, 0.025, 0.025, 0.025]], rtol=1e-6)


def test_class_weights_reweight(rng):
    logits = jnp.asarray(rng.normal(size=(8, 5)).astype(np.float32))
    labels = jnp.asarray(np.eye(5, dtype=np.float32)[np.arange(8) % 5])  # class 0 present
    w_up = np.ones(5, np.float32)
    w_up[0] = 10.0
    base = float(categorical_crossentropy(logits, labels))
    weighted = float(categorical_crossentropy(logits, labels, class_weights=jnp.asarray(w_up)))
    assert weighted != pytest.approx(base)


def test_distillation_pure_hard_equals_cce(data):
    logits, labels = data
    soft = jax.nn.softmax(logits)
    d = distillation_loss(logits, labels, soft, alpha=0.0)
    np.testing.assert_allclose(float(d), float(categorical_crossentropy(logits, labels)), rtol=1e-6)


def test_distillation_self_soft_zero_kl(data):
    logits, labels = data
    # Teacher == student probabilities => KL term ~ 0.
    soft = jax.nn.softmax(logits)
    d_full = distillation_loss(logits, labels, soft, alpha=1.0)
    assert abs(float(d_full)) < 1e-3


def test_make_loss_fn_selection():
    f1 = make_loss_fn(multilabel=False)
    f2 = make_loss_fn(multilabel=True)
    f3 = make_loss_fn(focal_gamma=2.0)
    logits = jnp.zeros((2, 3))
    labels = jnp.asarray([[1.0, 0, 0], [0, 1.0, 0]])
    for f in (f1, f2, f3):
        assert np.isfinite(float(f(logits, labels)))


def test_binary_smoothing_matches_keras():
    """Keras BinaryCrossentropy(label_smoothing=eps) smooths y*(1-eps)+eps/2
    — NOT eps/C. Golden-checked against TF."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(0)
    B, C = 8, 20
    logits = rng.normal(0, 2, (B, C)).astype(np.float32)
    labels = (rng.uniform(size=(B, C)) < 0.1).astype(np.float32)
    for eps in (0.0, 0.1, 0.3):
        ours = float(binary_crossentropy(jnp.asarray(logits), jnp.asarray(labels),
                                         label_smoothing=eps))
        keras = float(tf.keras.losses.BinaryCrossentropy(
            from_logits=True, label_smoothing=eps)(labels, logits).numpy())
        assert ours == pytest.approx(keras, rel=1e-5), f"eps={eps}"


def test_categorical_smoothing_matches_keras():
    """Keras CategoricalCrossentropy(label_smoothing=eps) uses eps/C."""
    tf = pytest.importorskip("tensorflow")
    rng = np.random.default_rng(1)
    B, C = 8, 10
    logits = rng.normal(0, 2, (B, C)).astype(np.float32)
    labels = np.eye(C, dtype=np.float32)[rng.integers(0, C, B)]
    for eps in (0.0, 0.1):
        ours = float(categorical_crossentropy(jnp.asarray(logits), jnp.asarray(labels),
                                              label_smoothing=eps))
        keras = float(tf.keras.losses.CategoricalCrossentropy(
            from_logits=True, label_smoothing=eps)(labels, logits).numpy())
        assert ours == pytest.approx(keras, rel=1e-5), f"eps={eps}"
