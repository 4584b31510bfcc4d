"""DS-CNN building blocks in Flax: SE, inverted residual, attention pooling.

Behavioral parity with the reference blocks (birdnet_stm32/models/blocks.py:
se_block:27-46, inverted_residual_block:49-133, AttentionPooling:136-159,
ds_conv_block in models/dscnn.py:28-84). The channel-alignment rule
(`make_divisible` to multiples of 8) is kept — it is just as good for TPU
lane tiling as it was for the N6 NPU.

Blocks are plain functions that must run inside a parent `nn.compact`
module: every conv/BN/dense registers as a direct child of that parent with
the exact Keras layer name, which makes checkpoint transplant
(models/transplant.py) a flat name-indexed copy.
"""

from __future__ import annotations

import contextvars

import jax.numpy as jnp
from flax import linen as nn

# Keras BatchNormalization defaults, which the whole reference model uses.
BN_MOMENTUM = 0.99
BN_EPS = 1e-3

# Activation fake-quant hook (quant/fake_quant.activation_fake_quant): when
# set, every hookable relu6 output runs through it — the QAT-with-
# activations step sets this DURING TRACING of its loss so the simulated
# quantization noise covers the same tensors TFLite PTQ quantizes, without
# threading a flag through every block signature. A ContextVar (not a
# module global) so nothing can leak across traces or threads.
_ACT_FQ: contextvars.ContextVar = contextvars.ContextVar("act_fq", default=None)


def make_divisible(v: float, divisor: int = 8) -> int:
    """Round a channel count to the nearest multiple of `divisor` (min = divisor)."""
    return max(divisor, int(v + divisor / 2) // divisor * divisor)


def relu6(x: jnp.ndarray, hookable: bool = True) -> jnp.ndarray:
    """ReLU6; `hookable=False` opts a call site out of activation
    fake-quant (the frontend's, matching the reference QAT's
    audio_frontend exclusion, training/qat.py:24-27)."""
    y = jnp.minimum(jnp.maximum(x, 0.0), 6.0)
    fq = _ACT_FQ.get() if hookable else None
    return fq(y) if fq is not None else y


def batch_norm(x, name: str, train: bool, freeze_bn: bool = False):
    """Keras-default BatchNormalization (momentum .99, eps 1e-3).

    freeze_bn=True runs BN on its running statistics even in training mode
    (no stat updates) — the reference's QAT BN freeze (training/qat.py:142-158).
    """
    return nn.BatchNorm(
        use_running_average=(not train) or freeze_bn,
        momentum=BN_MOMENTUM, epsilon=BN_EPS, name=name,
    )(x)


def conv_bn(x, features: int, kernel, strides, name: str, train: bool, act: bool = True,
            freeze_bn: bool = False):
    """Conv2D (no bias, SAME) + BN + optional ReLU6; `name` is the base
    (e.g. 'stem' -> layers 'stem_conv' + 'stem_bn', matching Keras names)."""
    x = nn.Conv(features, kernel, strides=strides, padding="SAME", use_bias=False, name=f"{name}_conv")(x)
    x = batch_norm(x, f"{name}_bn", train, freeze_bn)
    return relu6(x) if act else x


def depthwise_conv(x, strides, name: str):
    """3x3 depthwise conv (multiplier 1), matching Keras DepthwiseConv2D."""
    c = x.shape[-1]
    return nn.Conv(
        features=c, kernel_size=(3, 3), strides=strides, padding="SAME",
        feature_group_count=c, use_bias=False, name=name,
    )(x)


def spatial_dropout(x, rate: float, name: str, train: bool):
    """SpatialDropout2D: drops whole channels."""
    return nn.Dropout(rate, broadcast_dims=(1, 2), deterministic=not train, name=name)(x)


def se_block(x, reduction: int = 8, name: str = "se"):
    """Squeeze-and-Excite channel attention (reference blocks.py:27-46)."""
    c = x.shape[-1]
    se_ch = max(1, c // reduction)
    s = jnp.mean(x, axis=(1, 2), keepdims=True)
    s = nn.Dense(se_ch, use_bias=False, name=f"{name}_reduce")(s)
    s = nn.relu(s)
    s = nn.Dense(c, use_bias=False, name=f"{name}_expand")(s)
    s = nn.sigmoid(s)
    return x * s


def ds_conv_block(x, out_ch: int, strides=(1, 1), name: str = "ds",
                  drop_rate: float = 0.1, train: bool = False, freeze_bn: bool = False):
    """DW 3x3 -> BN -> ReLU6 -> PW 1x1 -> BN -> drop -> +res -> ReLU6
    (reference dscnn.py:28-84)."""
    in_ch = x.shape[-1]
    y = depthwise_conv(x, strides, name=f"{name}_dw")
    y = batch_norm(y, f"{name}_dw_bn", train, freeze_bn)
    y = relu6(y)
    y = nn.Conv(out_ch, (1, 1), padding="SAME", use_bias=False, name=f"{name}_pw")(y)
    y = batch_norm(y, f"{name}_pw_bn", train, freeze_bn)
    if drop_rate > 0:
        y = spatial_dropout(y, drop_rate, f"{name}_drop", train)
    if strides == (1, 1) and in_ch == out_ch:
        y = x + y
    return relu6(y)


def inverted_residual_block(x, out_ch: int, expansion: int = 2, strides=(1, 1),
                            use_se: bool = True, se_reduction: int = 8,
                            drop_rate: float = 0.1, name: str = "ir",
                            train: bool = False, freeze_bn: bool = False):
    """1x1 expand -> BN/ReLU6 -> DW 3x3 -> BN/ReLU6 -> [SE] -> 1x1 project
    -> BN -> drop -> +res (reference blocks.py:49-133)."""
    in_ch = x.shape[-1]
    hidden = make_divisible(in_ch * expansion, 8)

    y = nn.Conv(hidden, (1, 1), padding="SAME", use_bias=False, name=f"{name}_expand")(x)
    y = batch_norm(y, f"{name}_expand_bn", train, freeze_bn)
    y = relu6(y)

    y = depthwise_conv(y, strides, name=f"{name}_dw")
    y = batch_norm(y, f"{name}_dw_bn", train, freeze_bn)
    y = relu6(y)

    if use_se:
        y = se_block(y, reduction=se_reduction, name=f"{name}_se")

    y = nn.Conv(out_ch, (1, 1), padding="SAME", use_bias=False, name=f"{name}_project")(y)
    y = batch_norm(y, f"{name}_project_bn", train, freeze_bn)
    if drop_rate > 0:
        y = spatial_dropout(y, drop_rate, f"{name}_drop", train)
    if strides == (1, 1) and in_ch == out_ch:
        y = x + y
    return y


def attention_pooling(x, name: str = "attn_pool"):
    """Learned weighted average over spatial positions (blocks.py:136-159)."""
    b, h, w, c = x.shape
    flat = x.reshape(b, h * w, c)
    score = nn.Dense(1, use_bias=False, name=f"{name}_score")(flat)  # [B, HW, 1]
    attn = nn.softmax(score, axis=1)
    return jnp.sum(flat * attn, axis=1)  # [B, C]
