"""Backward-compatible wrapper — delegates to the birdnet_stm32_tpu package.

Parity with the reference's legacy repo-root shims (train.py:1-18 there;
its `test.py` maps to the evaluate verb).

Usage: python test.py --model_path runs/exp1 --data_path_test data/test [options]
Prefer: python -m birdnet_stm32_tpu evaluate --model_path runs/exp1 [options]
"""

import warnings

warnings.warn(
    "Running test.py directly is deprecated. "
    "Use 'python -m birdnet_stm32_tpu evaluate' instead.",
    DeprecationWarning,
    stacklevel=1,
)

from birdnet_stm32_tpu.cli.evaluate import main  # noqa: E402

if __name__ == "__main__":
    raise SystemExit(main())
