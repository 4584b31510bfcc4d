"""CLI dispatch: python -m birdnet_stm32_tpu <command> [args].

Parity with reference birdnet_stm32/__main__.py:14-47, including the
deploy and board-test verbs: `deploy` packages a checkpoint into a
self-contained serving bundle (the stedgeai generate/load/validate analog),
`board-test` runs the standalone WAV-dir inference test with the firmware's
[BENCH] / `=== DONE ===` report protocol (firmware/Src/main.c:269-374), and
`benchmark` is the lower-level batched driver both build on.
"""

from __future__ import annotations

import sys

COMMANDS = {
    "train": ("birdnet_stm32_tpu.cli.train", "Train a DS-CNN classifier"),
    "convert": ("birdnet_stm32_tpu.cli.convert", "Export a checkpoint to INT8 TFLite"),
    "evaluate": ("birdnet_stm32_tpu.cli.evaluate", "Evaluate a model on a test set"),
    "benchmark": ("birdnet_stm32_tpu.cli.benchmark", "Batched WAV-dir inference + timing report"),
    "profile": ("birdnet_stm32_tpu.cli.profile", "Analytical model cost profile"),
    "deploy": ("birdnet_stm32_tpu.cli.deploy", "Package a checkpoint into a deployment bundle"),
    "board-test": ("birdnet_stm32_tpu.cli.board_test", "Standalone WAV-dir inference test ([BENCH] protocol)"),
    "serve": ("birdnet_stm32_tpu.cli.serve", "Watch a directory, classify new WAVs continuously"),
}


def _enable_compilation_cache() -> None:
    """Persistent XLA compile cache for every CLI verb.

    Cold compiles of the fused INT8 executor take minutes; without this,
    every CLI invocation paid that cost again (only bench.py set it). The
    env var / an explicit jax.config setting take precedence.
    """
    import os

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if not jax.config.jax_compilation_cache_dir:
            jax.config.update("jax_compilation_cache_dir",
                              "/tmp/jax_cache_birdnet_tpu")
    except Exception:
        pass  # jax unavailable or config locked: non-fatal


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    _enable_compilation_cache()
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: python -m birdnet_stm32_tpu <command> [args]\n\ncommands:")
        for name, (_, doc) in COMMANDS.items():
            print(f"  {name:<10} {doc}")
        return 0 if argv else 2
    cmd = argv[0].replace("_", "-")
    if cmd not in COMMANDS:
        print(f"unknown command: {argv[0]} (expected one of {', '.join(COMMANDS)})",
              file=sys.stderr)
        return 2
    import importlib

    module = importlib.import_module(COMMANDS[cmd][0])
    return module.main(argv[1:]) or 0


if __name__ == "__main__":
    raise SystemExit(main())
