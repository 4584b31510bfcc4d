"""DS-CNN audio classifier in Flax.

Architecture parity with the reference builder (models/dscnn.py:87-262):
frontend -> stem 3x3 s(1,2) -> 4 stages of inverted-residual (or plain DS)
blocks with optional SE, base filters [32, 64, 128, 256] x alpha, repeats
[2, 3, 4, 2] x depth_multiplier (stride (2,2) on each stage's first block)
-> 1x1 embeddings conv (skipped when channels already match) -> GAP or
attention pooling -> dropout -> dense head.

Every weighted layer is a direct child of this module carrying the exact
Keras layer name, so checkpoint transplant is a flat name-indexed copy.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.blocks import (
    attention_pooling,
    conv_bn,
    ds_conv_block,
    inverted_residual_block,
    make_divisible,
    se_block,
)
from birdnet_stm32_tpu.models.frontend_layer import AudioFrontend

BASE_FILTERS: Sequence[int] = (32, 64, 128, 256)
BASE_REPEATS: Sequence[int] = (2, 3, 4, 2)
RAW_MAX_SAMPLES = 1 << 16  # N6 NPU constraint kept for config parity (dscnn.py:144-151)


class DSCNN(nn.Module):
    """DS-CNN with a selectable in-graph audio frontend."""

    num_mels: int = 64
    spec_width: int = 256
    sample_rate: int = 24000
    chunk_duration: float = 3.0
    embeddings_size: int = 256
    num_classes: int = 100
    audio_frontend: str = "hybrid"  # canonical ('librosa'/'mfcc'/'log_mel' => precomputed input)
    alpha: float = 1.0
    depth_multiplier: int = 1
    fft_length: int = 512
    mag_scale: str = "pwl"
    class_activation: str = "softmax"  # 'softmax' | 'sigmoid' | 'none' (logits)
    dropout_rate: float = 0.5
    n_mfcc: int = 20
    use_se: bool = True
    se_reduction: int = 8
    use_inverted_residual: bool = True
    expansion_factor: int = 2
    use_attention_pooling: bool = False
    learn_mel_scale: bool = False  # hybrid-only: learnable mel breakpoints

    @nn.compact
    def __call__(self, x, train: bool = False, return_embeddings: bool = False,
                 freeze_bn: bool = False, freeze_frontend_bn: bool = False):
        """Forward pass.

        Args:
            x: [B, bins, W, 1] spectrogram input, or [B, T, 1] raw waveform.
            train: Enables BN batch stats + dropout.
            return_embeddings: Also return the pooled embedding vector.
            freeze_bn: Run BN on running stats even when train=True (QAT).
            freeze_frontend_bn: Freeze ONLY the frontend's BN (raw
                filterbank): with frontend_trainable=False the reference
                builds those sublayers trainable=False, which in Keras runs
                BN in inference mode with no stat updates — masking the
                gradients alone would still drift the running statistics.

        Returns:
            [B, num_classes] scores (activation per `class_activation`),
            optionally a tuple (scores, [B, emb] embeddings).
        """
        # Mode dispatch through the frontend registry so registered custom
        # frontends resolve like built-ins (reference registry.py:35-92).
        from birdnet_stm32_tpu.models.registry import get_frontend_info

        try:
            frontend_mode = get_frontend_info(self.audio_frontend).mode
        except KeyError:
            raise ValueError(f"Invalid audio frontend: {self.audio_frontend!r}") from None
        input_bins = self.n_mfcc if self.audio_frontend == "mfcc" else self.num_mels

        x = AudioFrontend(
            mode=frontend_mode,
            mel_bins=input_bins if frontend_mode == "precomputed" else self.num_mels,
            spec_width=self.spec_width,
            sample_rate=self.sample_rate,
            chunk_duration=self.chunk_duration,
            fft_length=self.fft_length,
            mag_scale=self.mag_scale if frontend_mode != "precomputed" else "none",
            learn_mel_scale=self.learn_mel_scale,
            name="audio_frontend",
        )(x, train=train, freeze_bn=freeze_bn or freeze_frontend_bn)

        stem_ch = make_divisible(16 * self.alpha, 8)
        x = conv_bn(x, stem_ch, (3, 3), (1, 2), name="stem", train=train, freeze_bn=freeze_bn)

        for si, (bf, br) in enumerate(zip(BASE_FILTERS, BASE_REPEATS), start=1):
            out_ch = make_divisible(int(bf * self.alpha), 8)
            reps = max(1, int(math.ceil(br * self.depth_multiplier)))
            for bi in range(1, reps + 1):
                strides = (2, 2) if bi == 1 else (1, 1)
                if self.use_inverted_residual:
                    x = inverted_residual_block(
                        x, out_ch,
                        expansion=self.expansion_factor,
                        strides=strides,
                        use_se=self.use_se,
                        se_reduction=self.se_reduction,
                        name=f"stage{si}_ir{bi}",
                        train=train, freeze_bn=freeze_bn,
                    )
                else:
                    x = ds_conv_block(x, out_ch, strides=strides, name=f"stage{si}_ds{bi}",
                                      train=train, freeze_bn=freeze_bn)
                    if self.use_se:
                        x = se_block(x, reduction=self.se_reduction, name=f"stage{si}_se{bi}")

        emb_ch = make_divisible(self.embeddings_size, 8)
        if x.shape[-1] != emb_ch:
            x = conv_bn(x, emb_ch, (1, 1), (1, 1), name="emb", train=train, freeze_bn=freeze_bn)

        if self.use_attention_pooling:
            emb = attention_pooling(x, name="attn_pool")
        else:
            emb = jnp.mean(x, axis=(1, 2))  # GAP

        y = nn.Dropout(self.dropout_rate, deterministic=not train, name="dropout")(emb)
        y = nn.Dense(self.num_classes, name="pred")(y)
        if self.class_activation == "softmax":
            y = nn.softmax(y, axis=-1)
        elif self.class_activation == "sigmoid":
            y = nn.sigmoid(y)
        if return_embeddings:
            return y, emb
        return y


def build_dscnn(cfg: ModelConfig, class_activation: str = "softmax",
                learn_mel_scale: bool = False) -> DSCNN:
    """Construct a DSCNN from a ModelConfig (raw-length guard included)."""
    if cfg.audio_frontend == "raw" and cfg.chunk_samples >= RAW_MAX_SAMPLES:
        raise ValueError(
            f"raw frontend input length ({cfg.chunk_samples}) must be < {RAW_MAX_SAMPLES} "
            "for reference deployment parity; lower sample_rate or chunk_duration."
        )
    return DSCNN(
        num_mels=cfg.num_mels,
        spec_width=cfg.spec_width,
        sample_rate=cfg.sample_rate,
        chunk_duration=cfg.chunk_duration,
        embeddings_size=cfg.embeddings_size,
        num_classes=cfg.num_classes,
        audio_frontend=cfg.audio_frontend,
        alpha=cfg.alpha,
        depth_multiplier=cfg.depth_multiplier,
        fft_length=cfg.fft_length,
        mag_scale=cfg.mag_scale,
        dropout_rate=cfg.dropout_rate,
        n_mfcc=cfg.n_mfcc,
        use_se=cfg.use_se,
        se_reduction=cfg.se_reduction,
        use_inverted_residual=cfg.use_inverted_residual,
        expansion_factor=cfg.expansion_factor,
        use_attention_pooling=cfg.use_attention_pooling,
        learn_mel_scale=learn_mel_scale,
        class_activation=class_activation,
    )


def init_model(model: DSCNN, cfg: ModelConfig, key: jax.Array | None = None, batch: int = 1):
    """Initialize variables for a model given its config's input shape.

    Jitted: one whole-graph compile instead of per-op eager compiles.
    """
    if key is None:
        key = jax.random.key(0)
    dummy = jnp.zeros((batch, *cfg.input_shape()), jnp.float32)
    return jax.jit(model.init, static_argnames=("train",))({"params": key}, dummy, train=False)


def shape_init(model: DSCNN, cfg: ModelConfig, batch: int = 1):
    """Abstract init: parameter shapes/dtypes with zero compute."""
    dummy = jax.ShapeDtypeStruct((batch, *cfg.input_shape()), jnp.float32)
    return jax.eval_shape(model.init, jax.random.key(0), dummy)
