"""Model family: DS-CNN backbone, in-graph audio frontends, blocks, registry."""

from birdnet_stm32_tpu.models.dscnn import DSCNN, build_dscnn
from birdnet_stm32_tpu.models.blocks import make_divisible

__all__ = ["DSCNN", "build_dscnn", "make_divisible"]
