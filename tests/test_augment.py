"""Device-side augmentation tests: mixup label-union, SpecAugment masks."""

import numpy as np

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.data.augment import apply_mixup, apply_spec_augment


def one_hot_batch(B, C, rng):
    return jnp.asarray(np.eye(C, dtype=np.float32)[rng.integers(0, C, B)])


def test_mixup_noop_conditions(rng):
    x = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
    y = one_hot_batch(8, 4, rng)
    x2, y2 = apply_mixup(jax.random.key(0), x, y, alpha=0.0, probability=0.5)
    np.testing.assert_array_equal(np.asarray(x), np.asarray(x2))
    x3, y3 = apply_mixup(jax.random.key(0), x, y, alpha=0.5, probability=0.0)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(y3))


def test_mixup_changes_expected_count(rng):
    B = 16
    x = jnp.asarray(rng.normal(size=(B, 32)).astype(np.float32))
    y = one_hot_batch(B, 5, rng)
    x2, y2 = apply_mixup(jax.random.key(1), x, y, alpha=0.5, probability=0.5)
    changed = np.any(np.asarray(x2) != np.asarray(x), axis=1).sum()
    assert changed <= B // 2  # a partner may coincide with the row itself
    assert changed >= 1


def test_mixup_labels_are_union(rng):
    B, C = 32, 6
    x = jnp.asarray(rng.normal(size=(B, 8)).astype(np.float32))
    y = one_hot_batch(B, C, rng)
    _, y2 = apply_mixup(jax.random.key(2), x, y, alpha=0.5, probability=1.0)
    y2 = np.asarray(y2)
    # still a valid multi-hot: values in {0,1}, every row has >= 1 class
    assert set(np.unique(y2)).issubset({0.0, 1.0})
    assert (y2.sum(axis=1) >= 1).all()
    assert (y2.sum(axis=1) <= 3).all()  # at most 3 sources


def test_mixup_gains_sum_to_one(rng):
    B = 8
    x = jnp.ones((B, 4), jnp.float32)  # all-ones: any convex mix stays 1
    y = one_hot_batch(B, 3, rng)
    x2, _ = apply_mixup(jax.random.key(3), x, y, alpha=0.3, probability=1.0)
    np.testing.assert_allclose(np.asarray(x2), 1.0, atol=1e-5)


def test_mixup_label_smoothing(rng):
    x = jnp.ones((4, 4), jnp.float32)
    y = one_hot_batch(4, 4, rng)
    _, y2 = apply_mixup(jax.random.key(0), x, y, alpha=0.0, probability=0.0, label_smoothing=0.1)
    assert np.asarray(y2).min() > 0.0


def test_spec_augment_masks(rng):
    spec = jnp.asarray(rng.uniform(0.5, 1.0, (4, 32, 64, 1)).astype(np.float32))
    out = np.asarray(apply_spec_augment(jax.random.key(0), spec, freq_mask_max=8, time_mask_max=16))
    assert out.shape == spec.shape
    # masks zero entire rows/columns
    zero_rows = (out[..., 0] == 0).all(axis=2)  # [B, F]
    zero_cols = (out[..., 0] == 0).all(axis=1)  # [B, T]
    assert zero_rows.sum() <= 4 * 16 and zero_cols.sum() <= 4 * 32
    # unmasked cells unchanged
    changed = (out != np.asarray(spec))[..., 0]
    assert ((out[..., 0] == 0) | ~changed).all()


def test_spec_augment_3d_input(rng):
    spec = jnp.asarray(rng.uniform(0.5, 1.0, (2, 16, 32)).astype(np.float32))
    out = apply_spec_augment(jax.random.key(1), spec)
    assert out.shape == spec.shape
