#!/usr/bin/env bash
# One-command development setup (reference setup.sh analog).
#
# Usage:
#   ./setup.sh [VENV_DIR]
#
# Creates a virtualenv (default .venv), installs the package with test +
# interop extras, builds the native C++ audio library, and generates the
# synthetic fixture dataset used by the integration tests and docs examples.

set -euo pipefail

VENV="${1:-.venv}"

if [ ! -d "$VENV" ]; then
  echo "[setup] creating virtualenv at $VENV"
  python3 -m venv "$VENV"
fi
# shellcheck disable=SC1091
source "$VENV/bin/activate"

echo "[setup] installing package (test + interop extras)"
pip install --upgrade pip >/dev/null
pip install -e ".[test,interop]"

echo "[setup] building native audio library"
make -C native

echo "[setup] generating synthetic fixture dataset (tests/fixtures/data)"
python tests/fixtures/generate_fixtures.py tests/fixtures/data

cat <<'EOS'
[setup] done. Quick check:
  python -m pytest tests/ -q -m "not slow"
  python -m birdnet_stm32_tpu train --data_path_train tests/fixtures/data/train \
      --run_dir /tmp/demo_run --epochs 2 --steps_per_epoch 4 --batch_size 8
EOS
