#!/usr/bin/env bash
# Download a training/test dataset (reference scripts/download_data.sh
# analog). For a synthetic smoke dataset use
#   python tests/fixtures/generate_fixtures.py data
#
# Usage:
#   ./scripts/download_data.sh [DEST_DIR]

set -euo pipefail

DEST="${1:-data}"
mkdir -p "$DEST/train" "$DEST/test"

echo "Downloading dataset to $DEST/ ..."
# Placeholder until a data archive is hosted. Required layout:
#   data/train/<species_name>/*.wav|.flac|.mp3|.ogg|.m4a
#   data/test/<species_name>/*.wav|...
# Special folder names (noise, silence, background, other) keep their files
# but get all-zero labels.
echo "NOTE: placeholder script — point it at your data archive URL."
