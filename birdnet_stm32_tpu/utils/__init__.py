"""Utility helpers: PRNG threading, logging, seeding."""

from birdnet_stm32_tpu.utils.prng import KeyStream, set_global_seed

__all__ = ["KeyStream", "set_global_seed"]
