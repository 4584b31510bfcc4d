"""Backward-compatible wrapper — delegates to the birdnet_stm32_tpu package.

Parity with the reference's legacy repo-root shims (train.py:1-18 there).

Usage: python train.py --data_path_train data/train [options]
Prefer: python -m birdnet_stm32_tpu train --data_path_train data/train [options]
"""

import warnings

warnings.warn(
    "Running train.py directly is deprecated. "
    "Use 'python -m birdnet_stm32_tpu train' instead.",
    DeprecationWarning,
    stacklevel=1,
)

from birdnet_stm32_tpu.cli.train import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
