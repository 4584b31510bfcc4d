"""Command-line entry points (reference birdnet_stm32/cli/)."""
