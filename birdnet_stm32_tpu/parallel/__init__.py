"""Device-mesh parallelism: sharding rules and pjit-compiled steps."""

from birdnet_stm32_tpu.parallel.mesh import batch_sharding, make_mesh, replicated

__all__ = ["make_mesh", "batch_sharding", "replicated"]
