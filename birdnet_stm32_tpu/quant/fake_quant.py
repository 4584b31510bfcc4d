"""INT8 fake-quantization with straight-through gradients.

Numerics match the reference's shadow-weight QAT
(training/qat.py:30-68): asymmetric min/max affine quantization to
`2^bits - 1` levels, per-channel over the output-channel axis, with
banker's rounding (np.round). The reference injects quantization through a
Keras callback that swaps weights around each step (qat.py:80-139); in JAX
the same computation is a straight-through-estimator transform applied to
the parameter pytree inside the loss — functionally identical, but pure.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _ste(w: jax.Array, wq: jax.Array) -> jax.Array:
    return wq


def _ste_fwd(w, wq):
    return wq, None


def _ste_bwd(_, g):
    return g, None  # gradient flows straight through to the FP weights


_ste.defvjp(_ste_fwd, _ste_bwd)


def fake_quantize(
    w: jax.Array,
    num_bits: int = 8,
    per_channel: bool = True,
    channel_axis: int = -1,
) -> jax.Array:
    """Quantize-dequantize a weight tensor (asymmetric min/max affine).

    Args:
        w: Float weight tensor.
        num_bits: Bit width (8 -> 255 levels).
        per_channel: Per-channel ranges over `channel_axis`, else per-tensor.
        channel_axis: Channel axis for per-channel mode.

    Returns:
        Fake-quantized tensor, same shape/dtype.

    Note on parity: this implements TRUE per-channel ranges. The
    reference's per-channel mode is inert — its reduce_axes comparison
    `i != channel_axis` with a negative axis (qat.py:49) never matches, so
    it actually reduces over every axis (per-tensor). We implement the
    intended semantics (and what the TFLite converter does) rather than
    reproducing that bug; per_channel=False gives the reference's actual
    observed behavior.
    """
    qmax = (1 << num_bits) - 1
    if per_channel and w.ndim > 1:
        axes = tuple(i for i in range(w.ndim) if i != channel_axis % w.ndim)
        w_min = jnp.min(w, axis=axes, keepdims=True)
        w_max = jnp.max(w, axis=axes, keepdims=True)
    else:
        w_min = jnp.min(w)
        w_max = jnp.max(w)
    scale = jnp.maximum((w_max - w_min) / qmax, 1e-10)
    return jnp.round((w - w_min) / scale) * scale + w_min


def fake_quantize_ste(w: jax.Array, **kw) -> jax.Array:
    """fake_quantize with identity (straight-through) gradient."""
    return _ste(w, fake_quantize(w, **kw))


def fake_quantize_act(x: jax.Array, num_bits: int = 8) -> jax.Array:
    """Per-tensor ACTIVATION fake-quant with straight-through gradient.

    Round-5 extension past the reference recipe (its QAT fake-quantizes
    weights only, training/qat.py:30-68, while PTQ's error is dominated by
    activation quantization — ACCURACY.json showed QAT BELOW PTQ on cmAP).
    Simulates what the TFLite converter does to every activation tensor:
    per-tensor asymmetric affine int8 with zero always representable.
    Ranges are dynamic per batch (the MinMax-observer surrogate for the
    converter's calibrated ranges — for the post-ReLU6 tensors this hook
    covers, the range is [0, ~6] and batch min/max is a tight estimator).
    """
    qmax = (1 << num_bits) - 1
    x_min = jnp.minimum(jnp.min(x), 0.0)
    x_max = jnp.maximum(jnp.max(x), 0.0)
    scale = jnp.maximum((x_max - x_min) / qmax, 1e-10)
    # Integer zero point (TFLite affine semantics): the grid is anchored so
    # 0.0 maps to an exact code — for post-ReLU6 tensors zp == 0 and this
    # reduces to the min-anchored grid, but logits/input have x_min < 0
    # and an un-nudged grid would represent zero only approximately.
    zp = jnp.round(-x_min / scale)
    q = jnp.clip(jnp.round(x / scale) + zp, 0.0, float(qmax))
    return _ste(x, (q - zp) * scale)


class activation_fake_quant:
    """Context manager arming the model-wide activation fake-quant hook
    (models/blocks._ACT_FQ — applied after every hookable relu6). Enter it
    around the loss TRACE so the quantization noise is part of the traced
    computation; the frontend opts out via relu6(hookable=False)."""

    def __init__(self, num_bits: int = 8):
        self.num_bits = num_bits
        self._token = None

    def __enter__(self):
        from birdnet_stm32_tpu.models import blocks

        self._token = blocks._ACT_FQ.set(
            lambda y: fake_quantize_act(y, num_bits=self.num_bits))
        return self

    def __exit__(self, *exc):
        from birdnet_stm32_tpu.models import blocks

        blocks._ACT_FQ.reset(self._token)
        return False


def is_quantizable(path: tuple, leaf: Any) -> bool:
    """QAT weight selection, mirroring reference qat.py:24-77:
    conv/dense kernels only — skip biases, BN params, the frontend, and
    the attention-pooling score Dense (nested in a custom layer, so the
    reference's top-level isinstance walk never selects it)."""
    keys = [p.key if hasattr(p, "key") else str(p) for p in path]
    if not keys:
        return False
    if keys[0] == "audio_frontend" or keys[0] == "attn_pool_score":
        return False
    if keys[-1] != "kernel":
        return False
    return getattr(leaf, "ndim", 0) >= 2


def quantize_params(params, num_bits: int = 8, per_channel: bool = True, ste: bool = True):
    """Apply fake quantization to every quantizable kernel in a param tree.

    Channel axis is always -1 in this framework's layouts (Conv [kh,kw,i,o],
    depthwise [kh,kw,1,C], Dense [i,o]) — the reference's axis=-2 special
    case exists only for Keras' [kh,kw,C,1] depthwise layout.
    """
    fq = fake_quantize_ste if ste else fake_quantize

    def maybe_quantize(path, leaf):
        if is_quantizable(path, leaf):
            return fq(leaf, num_bits=num_bits, per_channel=per_channel, channel_axis=-1)
        return leaf

    return jax.tree_util.tree_map_with_path(maybe_quantize, params)
