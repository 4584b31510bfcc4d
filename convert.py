"""Backward-compatible wrapper — delegates to the birdnet_stm32_tpu package.

Parity with the reference's legacy repo-root shims (train.py:1-18 there).

Usage: python convert.py --model_path runs/exp1 --data_path data/train [options]
Prefer: python -m birdnet_stm32_tpu convert --model_path runs/exp1 [options]
"""

import warnings

warnings.warn(
    "Running convert.py directly is deprecated. "
    "Use 'python -m birdnet_stm32_tpu convert' instead.",
    DeprecationWarning,
    stacklevel=1,
)

from birdnet_stm32_tpu.cli.convert import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
