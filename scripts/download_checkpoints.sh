#!/usr/bin/env bash
# Fetch pre-trained checkpoints (reference scripts/download_checkpoints.sh
# analog). Checkpoints are published as release assets; this framework also
# consumes the reference's .keras/.tflite artifacts directly via
# models/transplant.py and quant/tflite_import.py.
#
# Usage:
#   ./scripts/download_checkpoints.sh [DEST_DIR]

set -euo pipefail

DEST="${1:-checkpoints}"
mkdir -p "$DEST"

echo "Downloading checkpoints to $DEST/ ..."
# Placeholder until release assets are published. Expected contents:
#   <name>.keras                  float checkpoint (transplantable)
#   <name>_quantized.tflite       INT8 artifact (runs on the integer executor)
#   <name>_model_config.json      ModelConfig sidecar
#   <name>_labels.txt             class names
echo "NOTE: placeholder script — point it at your release asset URL."
echo "      Reference-format checkpoints drop in unchanged."
