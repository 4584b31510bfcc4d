"""Device-side batched augmentation: Dirichlet multi-source mixup + SpecAugment.

TPU re-design of reference audio/augmentation.py:10-120. The reference runs
mixup per-sample in numpy behind a tf.py_function (generator.py:406-418) and
SpecAugment per-spectrogram in workers; here both are jitted, static-shape
batch transforms that run on device between the input pipeline and the
training step — no host round-trip, fused by XLA into the step's prologue.

Semantics:
- mixup: a fixed count round(B*probability) of rows are mixed from 2-3
  sources with Dirichlet(alpha) gains; labels take the element-wise max
  (multi-label union); optional label smoothing afterwards.
- spec_augment: 2 frequency masks (width <= 8 bins) + 2 time masks
  (width <= 25 frames) zeroed per sample on [B, F, T, ...] features.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("alpha", "probability", "label_smoothing", "max_sources"))
def apply_mixup(
    key: jax.Array,
    batch: jax.Array,
    labels: jax.Array,
    alpha: float = 0.2,
    probability: float = 0.25,
    label_smoothing: float = 0.0,
    max_sources: int = 3,
) -> tuple[jax.Array, jax.Array]:
    """Multi-source additive mixup over a batch.

    Args:
        key: PRNG key.
        batch: [B, ...] samples (waveforms or spectrograms).
        labels: [B, C] one/multi-hot labels.
        alpha: Dirichlet concentration.
        probability: Fraction of the batch to mix (count is static).
        label_smoothing: If > 0, (1-eps)*y + eps/C after mixing.
        max_sources: Maximum sources per mix (reference uses 2-3).

    Returns:
        (mixed batch, mixed labels), same shapes.
    """
    if not 2 <= max_sources <= 3:
        # The distinct-partner draw below produces exactly two offsets;
        # a larger max_sources would mismatch the gain/source shapes at
        # trace time (and the reference mixes 2-3 sources only).
        raise ValueError(f"max_sources={max_sources}: supported range is [2, 3]")
    B = batch.shape[0]
    num_mix = int(round(B * probability))
    if alpha <= 0 or num_mix <= 0:
        if label_smoothing > 0 and labels.shape[-1] > 1:
            C = labels.shape[-1]
            labels = (1.0 - label_smoothing) * labels + label_smoothing / C
        return batch, labels

    k_rows, k_src, k_n, k_gain = jax.random.split(key, 4)
    # Exact-count row selection: first num_mix of a random permutation.
    mix_rows = jax.random.permutation(k_rows, B)[:num_mix]  # [M]
    # Partners distinct from the target row and from each other (reference
    # np.random.choice(..., replace=False)): offset o1 in [1, B), o2 != o1
    # in [1, B) via a shifted draw over the remaining B-2 offsets.
    k_o1, k_o2 = jax.random.split(k_src)
    o1 = jax.random.randint(k_o1, (num_mix,), 1, B)
    # (max() guards B<=2 where two distinct partners cannot exist.)
    o2 = 1 + (o1 - 1 + jax.random.randint(k_o2, (num_mix,), 1, max(B - 1, 2))) % max(B - 1, 1)
    partners = jnp.stack([(mix_rows + o1) % B, (mix_rows + o2) % B], axis=1)
    partners = partners[:, : max_sources - 1]  # [M, S-1]
    sources = jnp.concatenate([mix_rows[:, None], partners], axis=1)  # [M, S]

    # 2 or 3 active sources per row (uniform), as a mask over gain slots.
    n_sources = jax.random.randint(k_n, (num_mix,), 2, max_sources + 1)  # in {2,3}
    slot_active = jnp.arange(max_sources)[None, :] < n_sources[:, None]  # [M, S]

    # Dirichlet(alpha) over the active slots via normalized Gamma draws.
    gamma = jax.random.gamma(k_gain, alpha, (num_mix, max_sources))
    gamma = jnp.where(slot_active, gamma, 0.0)
    gains = gamma / (jnp.sum(gamma, axis=1, keepdims=True) + 1e-12)  # [M, S]

    src_samples = batch[sources]  # [M, S, ...]
    gain_shape = (num_mix, max_sources) + (1,) * (batch.ndim - 1)
    mixed = jnp.sum(gains.reshape(gain_shape) * src_samples, axis=1)

    src_labels = labels[sources]  # [M, S, C]
    union = jnp.max(jnp.where(slot_active[..., None], src_labels, 0.0), axis=1)

    batch = batch.at[mix_rows].set(mixed)
    labels = labels.at[mix_rows].set(union)

    if label_smoothing > 0 and labels.shape[-1] > 1:
        C = labels.shape[-1]
        labels = (1.0 - label_smoothing) * labels + label_smoothing / C
    return batch, labels


@partial(
    jax.jit,
    static_argnames=("freq_mask_max", "time_mask_max", "num_freq_masks", "num_time_masks"),
)
def apply_spec_augment(
    key: jax.Array,
    spec: jax.Array,
    freq_mask_max: int = 8,
    time_mask_max: int = 25,
    num_freq_masks: int = 2,
    num_time_masks: int = 2,
) -> jax.Array:
    """Batched SpecAugment on [B, F, T] or [B, F, T, 1] features.

    Matches the reference's per-sample mask law (augmentation.py:74-120):
    width ~ U[0, min(mask_max, dim)), start ~ U[0, max(1, dim - width)).
    """
    if spec.ndim == 4 and spec.shape[-1] != 1:
        # The reference squeezes only single-channel features
        # (augmentation.py:100-103); spec[..., 0] on C>1 would silently
        # drop channels and change the output shape.
        raise ValueError(f"spec_augment expects [B, F, T] or [B, F, T, 1]; "
                         f"got trailing channel dim {spec.shape[-1]}")
    squeeze = spec.ndim == 4
    x = spec[..., 0] if squeeze else spec
    B, F, T = x.shape

    def mask_axis(key, dim, mask_max, n_masks):
        ks = jax.random.split(key, 2)
        width = jax.random.randint(ks[0], (B, n_masks), 0, max(1, min(mask_max, dim)))
        start = jax.random.randint(ks[1], (B, n_masks), 0, jnp.maximum(1, dim - width))
        pos = jnp.arange(dim)[None, None, :]  # [1, 1, dim]
        inside = (pos >= start[..., None]) & (pos < (start + width)[..., None])  # [B, n, dim]
        return ~jnp.any(inside, axis=1)  # [B, dim] keep-mask

    kf, kt = jax.random.split(key)
    keep_f = mask_axis(kf, F, freq_mask_max, num_freq_masks)  # [B, F]
    keep_t = mask_axis(kt, T, time_mask_max, num_time_masks)  # [B, T]
    x = x * keep_f[:, :, None] * keep_t[:, None, :]
    return x[..., None] if squeeze else x
