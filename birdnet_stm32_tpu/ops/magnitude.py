"""Magnitude compression curves: pwl / pcen / db / none, plus dB helpers.

The reference needs two families of these:
- Host feature path (audio/spectrogram.py:135-147): librosa pcen,
  amplitude_to_db, and an explicit piecewise-linear (pwl) curve.
- In-graph path (models/magnitude.py): the same curves re-encoded as 1x1
  depthwise convolutions because the STM32N6 NPU has no transcendentals.

On TPU there is no reason for the depthwise-conv encoding — these are
straight elementwise math on the VPU (the in-graph *trainable* variants with
per-channel parameters live in models/frontend_layer.py). Everything here is
batched and jit-friendly over [..., F, W] spectrograms (freq-major, time
last), matching the reference's array layout.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# PWL default breakpoints/slopes (reference: audio/spectrogram.py:141-144).
PWL_THRESHOLDS = (0.10, 0.35, 0.65)
PWL_SLOPES = (0.40, 0.25, 0.15, 0.08)


def normalize_minmax(S: jax.Array, axis=None) -> jax.Array:
    """Min-max normalize to [0, 1] (reference: spectrogram.py:12-21).

    Args:
        S: Input array.
        axis: Axes to reduce over; None = whole array (per-sample callers
            pass the non-batch axes).
    """
    s_min = jnp.min(S, axis=axis, keepdims=axis is not None)
    s_max = jnp.max(S, axis=axis, keepdims=axis is not None)
    return (S - s_min) / (s_max - s_min + 1e-10)


def pwl_compress(S: jax.Array) -> jax.Array:
    """Piecewise-linear magnitude compression of a [0, 1]-normalized input.

    y = k0*x + sum_i k_i * relu(x - t_i), the NPU-friendly curve the
    reference uses as its quantization-safe log substitute
    (spectrogram.py:139-144).
    """
    y = PWL_SLOPES[0] * S
    for t, k in zip(PWL_THRESHOLDS, PWL_SLOPES[1:]):
        y = y + k * jax.nn.relu(S - t)
    return y


def power_to_db(S: jax.Array, ref: jax.Array | float = 1.0, amin: float = 1e-10, top_db: float | None = 80.0, axis=None) -> jax.Array:
    """10*log10(S/ref) with clamping, matching librosa.power_to_db.

    Args:
        S: Power spectrogram.
        ref: Reference value (scalar or per-sample array broadcastable to S).
        amin: Floor for S and ref.
        top_db: If set, clamp to [max - top_db, max] (max over `axis`).
        axis: Axes defining one sample for the top_db max.
    """
    log_spec = 10.0 * jnp.log10(jnp.maximum(S, amin))
    log_spec = log_spec - 10.0 * jnp.log10(jnp.maximum(jnp.asarray(ref, S.dtype), amin))
    if top_db is not None:
        peak = jnp.max(log_spec, axis=axis, keepdims=axis is not None)
        log_spec = jnp.maximum(log_spec, peak - top_db)
    return log_spec


def amplitude_to_db(S: jax.Array, ref: jax.Array | float = 1.0, amin: float = 1e-5, top_db: float | None = 80.0, axis=None) -> jax.Array:
    """20*log10(S/ref), matching librosa.amplitude_to_db (ref applied squared)."""
    ref_arr = jnp.asarray(ref, S.dtype)
    return power_to_db(jnp.square(S), ref=jnp.square(ref_arr), amin=amin * amin, top_db=top_db, axis=axis)


def pcen(
    S: jax.Array,
    sr: int,
    hop_length: int,
    gain: float = 0.98,
    bias: float = 2.0,
    power: float = 0.5,
    time_constant: float = 0.400,
    eps: float = 1e-6,
) -> jax.Array:
    """Per-channel energy normalization, matching librosa.pcen defaults.

    The EMA smoother runs along the last (time) axis as a first-order linear
    recurrence, evaluated with an associative scan (log-depth on TPU instead
    of a length-T sequential loop). Initial state follows scipy's
    `lfilter_zi` convention: the smoother starts at the first frame.

    Args:
        S: [..., F, T] magnitude spectrogram (non-negative).
        sr: Sample rate.
        hop_length: STFT hop (controls the smoother coefficient).
        gain, bias, power, time_constant, eps: librosa.pcen parameters.

    Returns:
        PCEN-compressed spectrogram, same shape.
    """
    t_frames = time_constant * sr / float(hop_length)
    b = (jnp.sqrt(1.0 + 4.0 * t_frames**2) - 1.0) / (2.0 * t_frames**2)
    b = jnp.asarray(b, S.dtype)

    # EMA: m[t] = b*S[t] + (1-b)*m[t-1], m[-1] = S[0]  (lfilter_zi start).
    x = jnp.moveaxis(S, -1, 0)  # [T, ..., F]
    # Broadcastable [T, 1, ..., 1] coefficient: the combine() broadcasts,
    # so no need to materialize a full spectrogram-sized constant.
    a_seq = jnp.full((x.shape[0],) + (1,) * (x.ndim - 1), 1.0 - b, dtype=S.dtype)
    # m[0] must equal S[0]: fold the initial state into the first element.
    # b*x[0] + (1-b)*x[0] == x[0], so an elementwise select on an iota mask
    # does it without the scatter-add (`.at[0].add`) that Pallas TPU
    # lowering rejects — this op must run inside the fused Mosaic kernel.
    idx = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    c_seq = jnp.where(idx == 0, x, b * x)

    def combine(left, right):
        a_l, c_l = left
        a_r, c_r = right
        return a_l * a_r, c_l * a_r + c_r

    _, m = jax.lax.associative_scan(combine, (a_seq, c_seq), axis=0)
    M = jnp.moveaxis(m, 0, -1)

    smooth = jnp.exp(-gain * (jnp.log(eps) + jnp.log1p(M / eps)))
    return (bias**power) * jnp.expm1(power * jnp.log1p(S * smooth / bias))


def db_compress(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """In-graph dB curve: 10*log10(max(x, eps)) (models/magnitude.py:194-200)."""
    return 10.0 * jnp.log10(jnp.maximum(x, eps))
