"""In-graph audio frontends as Flax modules.

TPU re-design of the reference's AudioFrontendLayer + MagnitudeScalingLayer
(models/frontend.py:59-384, models/magnitude.py:16-217). The reference
encodes per-channel scaling as 1x1 depthwise convolutions because the N6 NPU
only has conv/pool/relu; on TPU those collapse to per-channel vector
parameters applied with plain VPU math — mathematically identical, trainable
the same way, and fusable by XLA into the surrounding ops.

Modes (matching frontend.py:288-358):
- precomputed: [B, bins, T, 1] -> slice to spec_width.
- hybrid: [B, fft_bins, W, 1] linear |STFT| -> mel mixer matmul (NonNeg,
  Slaney-seeded) -> ReLU -> per-sample max-normalize -> magnitude scaling.
- raw: [B, T, 1] -> symmetric pad -> strided conv filterbank (k=16,
  stride=ceil(T/W)) -> BN -> ReLU6 -> magnitude scaling.

Output is always [B, mel_bins, spec_width, 1].
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from birdnet_stm32_tpu.models.blocks import BN_EPS, BN_MOMENTUM, relu6
from birdnet_stm32_tpu.ops.mel import mel_filterbank

# Default pwl/pcen constants (reference magnitude.py:53-134).
_PWL_K0 = 0.40
_PWL_THRESHOLDS = (0.10, 0.35, 0.65)
_PWL_SLOPES = (0.25, 0.15, 0.08)
_PCEN_AGC = 0.6
_PCEN_K1 = 0.15
_PCEN_SHIFT = -0.2
_PCEN_K2MK1 = 0.45


class MagnitudeScaling(nn.Module):
    """Per-channel magnitude compression: 'none' | 'pwl' | 'pcen' | 'db'.

    Operates on [..., C] with C = mel_bins (the reference's [B, 1, W, C]
    layout before the final transpose). Parameters are per-channel vectors,
    the exact equivalent of the reference's 1x1 depthwise conv weights.
    """

    method: str = "pwl"
    channels: int = 64

    @nn.compact
    def __call__(self, x):
        if self.method == "none":
            return x
        if self.method == "db":
            from birdnet_stm32_tpu.ops.magnitude import db_compress

            return db_compress(x)  # one dB curve for in-graph + host paths

        c = self.channels
        if self.method == "pwl":
            k0 = self.param("pwl_k0", lambda k: jnp.full((c,), _PWL_K0, jnp.float32))
            y = k0 * x
            for i, (t, slope) in enumerate(zip(_PWL_THRESHOLDS, _PWL_SLOPES), start=1):
                w = self.param(f"pwl_shift{i}_w", lambda k, _t=t: jnp.ones((c,), jnp.float32))
                b = self.param(f"pwl_shift{i}_b", lambda k, _t=t: jnp.full((c,), -_t, jnp.float32))
                ki = self.param(f"pwl_k{i}", lambda k, _s=slope: jnp.full((c,), _s, jnp.float32))
                y = y + ki * nn.relu(w * x + b)
            return y

        if self.method == "pcen":
            # Reference pcen approx (magnitude.py:166-177): the K "EMA" pools
            # are 1x1 identity average-pools, so the smoother is x itself.
            agc_w = self.param("pcen_agc", lambda k: jnp.full((c,), _PCEN_AGC, jnp.float32))
            k1 = self.param("pcen_k1", lambda k: jnp.full((c,), _PCEN_K1, jnp.float32))
            shift_w = self.param("pcen_shift_w", lambda k: jnp.ones((c,), jnp.float32))
            shift_b = self.param("pcen_shift_b", lambda k: jnp.full((c,), _PCEN_SHIFT, jnp.float32))
            k2mk1 = self.param("pcen_k2mk1", lambda k: jnp.full((c,), _PCEN_K2MK1, jnp.float32))
            y0 = nn.relu(x - agc_w * x)
            b1 = k1 * y0
            b2 = k2mk1 * nn.relu(shift_w * y0 + shift_b)
            return nn.relu(b1 + b2)

        raise ValueError(f"Invalid mag_scale: {self.method!r}")


def tri_mel_matrix(seg_logits: jax.Array, sample_rate: int, fft_length: int,
                   mel_bins: int) -> jax.Array:
    """[F, M] triangular mel weights from learnable segment logits.

    Reference _compute_tri_matrix (frontend.py:216-245): softplus segment
    widths normalized over the [fmin, sr/2] Slaney-mel range, cumsum to
    M+2 breakpoints, triangles evaluated at the FFT bins' mel positions,
    column-normalized. Zero logits give near-uniform mel spacing. Shared by
    the in-graph frontend and the TFLite export path (which materializes it
    as the mel-mixer constant).
    """
    from birdnet_stm32_tpu.ops.mel import hz_to_mel

    eps = 1e-6
    fft_bins = fft_length // 2 + 1
    freqs = np.linspace(0.0, sample_rate / 2.0, fft_bins)
    bins_mel = jnp.asarray(hz_to_mel(freqs), jnp.float32)  # [F]
    mel_fmin = float(hz_to_mel(150.0))
    mel_fmax = float(hz_to_mel(float(sample_rate // 2)))  # reference frontend.py:190 floors

    seg = jax.nn.softplus(seg_logits) + 1e-3                  # [M+1]
    seg = seg / (jnp.sum(seg) + eps) * (mel_fmax - mel_fmin)
    p_full = mel_fmin + jnp.concatenate([jnp.zeros((1,)), jnp.cumsum(seg)])  # [M+2]

    M = mel_bins
    left, center, right = p_full[:M], p_full[1 : M + 1], p_full[2 : M + 2]
    up = (bins_mel[:, None] - left[None, :]) / jnp.maximum(center - left, eps)
    down = (right[None, :] - bins_mel[:, None]) / jnp.maximum(right - center, eps)
    tri = jnp.maximum(jnp.minimum(up, down), 0.0)             # [F, M]
    return tri / (jnp.sum(tri, axis=0, keepdims=True) + eps)


def _mel_mixer_init(sample_rate: int, fft_length: int, mel_bins: int):
    """Slaney mel basis seed for the hybrid mixer (frontend.py:257-276)."""
    def init(key):
        fb = mel_filterbank(sample_rate, fft_length, mel_bins, fmin=150.0,
                            fmax=float(sample_rate // 2))
        return jnp.asarray(fb)  # [fft_bins, mel_bins]
    return init


class AudioFrontend(nn.Module):
    """Interchangeable in-graph frontend producing [B, mel_bins, W, 1]."""

    mode: str  # 'precomputed' | 'hybrid' | 'raw'
    mel_bins: int = 64
    spec_width: int = 256
    sample_rate: int = 24000
    chunk_duration: float = 3.0
    fft_length: int = 512
    mag_scale: str = "pwl"
    learn_mel_scale: bool = False  # learnable mel breakpoints (frontend.py:188-255)

    def _tri_matrix(self, seg_logits: jax.Array) -> jax.Array:
        return tri_mel_matrix(seg_logits, self.sample_rate, self.fft_length,
                              self.mel_bins)

    @nn.compact
    def __call__(self, x, train: bool = False, freeze_bn: bool = False):
        if self.mode == "precomputed":
            return x[:, :, : self.spec_width, :]

        if self.mode == "hybrid":
            fft_bins = self.fft_length // 2 + 1
            if x.ndim != 4 or x.shape[1] != fft_bins:
                raise ValueError(f"Hybrid expects [B,{fft_bins},W,1], got {x.shape}")
            # [B, F, W, 1] -> [B, W, F]: mel mixing is a plain MXU matmul.
            y = jnp.transpose(x[:, :, : self.spec_width, 0], (0, 2, 1))
            if self.learn_mel_scale:
                seg_logits = self.param(
                    "mel_seg_logits",
                    lambda k: jnp.zeros((self.mel_bins + 1,), jnp.float32),
                )
                mixer = self._tri_matrix(seg_logits)
            else:
                mixer = self.param(
                    "mel_mixer",
                    _mel_mixer_init(self.sample_rate, self.fft_length, self.mel_bins),
                )
            # NonNeg constraint parity: the reference's Keras mixer is
            # NonNeg-constrained; projection happens in the optimizer
            # (training/trainer.py applies the same clamp post-update).
            # Full f32 accumulation: this matmul is tiny next to the conv
            # stack, and default (bf16-allowed) precision costs ~3e-3
            # relative error that breaks frontend parity.
            y = jnp.matmul(y, mixer, precision=jax.lax.Precision.HIGHEST)  # [B, W, M]
            y = nn.relu(y)
            y_max = jnp.max(y, axis=(1, 2), keepdims=True)
            y = y / (y_max + 1e-6)
            y = MagnitudeScaling(self.mag_scale, self.mel_bins, name="mag")(y)
            return jnp.transpose(y, (0, 2, 1))[..., None]  # [B, M, W, 1]

        if self.mode == "raw":
            T = int(self.sample_rate * self.chunk_duration)
            W = self.spec_width
            k_t = 16
            stride_t = int(math.ceil(T / float(W)))
            pad_total = max(0, stride_t * (W - 1) + k_t - T)
            pad_l, pad_r = pad_total // 2, pad_total - pad_total // 2

            y = x[:, :T, :]
            y = jnp.pad(y, ((0, 0), (pad_l, pad_r), (0, 0)))
            # [B, T, 1] -> 1-D strided conv filterbank -> [B, W, M].
            y = nn.Conv(
                self.mel_bins, (k_t,), strides=(stride_t,), padding="VALID",
                use_bias=False, name="raw_fb",
            )(y)
            y = nn.BatchNorm(use_running_average=(not train) or freeze_bn,
                             momentum=BN_MOMENTUM, epsilon=BN_EPS, name="raw_fb_bn")(y)
            y = relu6(y, hookable=False)  # frontend excluded from act fq
            y = MagnitudeScaling(self.mag_scale, self.mel_bins, name="mag")(y)
            return jnp.transpose(y, (0, 2, 1))[..., None]  # [B, M, W, 1]

        raise ValueError(f"Invalid frontend mode: {self.mode!r}")
