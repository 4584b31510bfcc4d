"""birdnet_stm32_tpu: a TPU-native bird-sound classification framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
birdnet-team/birdnet-stm32 (reference layout: `birdnet_stm32/`):

- Five audio frontends (librosa-mel, hybrid STFT + learned mel mixer, raw
  learned filterbank, mfcc, log_mel) as batched, fused device kernels.
- DS-CNN family (alpha / depth_multiplier scaling, SE attention, inverted
  residuals, attention pooling) in Flax.
- Shadow-weight INT8 QAT and a per-channel quantization simulator replacing
  the reference's TFLite PTQ path.
- Data-parallel training and >=100k chunks/sec batched inference over a
  `jax.sharding.Mesh`.

The package layout mirrors the reference's layer map (SURVEY.md section 1)
but every compute path is TPU-first: batched tensors in HBM, MXU matmuls,
and XLA-compiled control flow.
"""

from birdnet_stm32_tpu.version import __version__

__all__ = ["__version__"]
