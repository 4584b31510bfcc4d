"""Audit: every valid (frontend x mag_scale x pooling) export emits only
ops the INT8 executor supports.

Exports a tiny model for each combination through the production
convert path and diffs the resulting TFLite op set against
quant/tflite_import.py's dispatch. New ops sneak in when a frontend or
scaling lowers differently at some geometry (PAD appeared only once the
raw filterbank stride stopped dividing the chunk length; LOG/MAXIMUM
only under mag_scale=db) — run this after touching the export path or
the model builders. ~20 s per combo on CPU.

Usage: JAX_PLATFORMS=cpu python scripts/audit_export_ops.py [frontend ...]
"""

import os
import sys
import itertools
from pathlib import Path

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

import jax

SUPPORTED = {
    "QUANTIZE", "DEQUANTIZE", "TRANSPOSE", "SHAPE", "PACK", "FILL",
    "STRIDED_SLICE", "CONCATENATION", "CONV_2D", "DEPTHWISE_CONV_2D",
    "FULLY_CONNECTED", "ADD", "SUB", "MEAN", "MUL", "DIV", "REDUCE_MAX",
    "SUM", "RESHAPE", "SOFTMAX", "LOGISTIC", "PAD", "PADV2", "LOG",
    "MAXIMUM", "MINIMUM",
}

FRONTENDS = ("hybrid", "raw", "librosa", "mfcc", "log_mel")
SCALES = ("none", "pwl", "pcen", "db")


def main() -> int:
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.quant.tflite_import import TFLiteGraph

    frontends = sys.argv[1:] or FRONTENDS
    failures = 0
    for fe, ms in itertools.product(frontends, SCALES):
        # attn=True rides the 4100 Hz geometry so the raw pad is non-zero.
        for attn, sr in ((False, 4000), (True, 4100)):
            cfg = ModelConfig(
                sample_rate=sr, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=4,
                class_names=list("abcd"), alpha=0.25, audio_frontend=fe,
                mag_scale=ms, use_attention_pooling=attn,
                use_inverted_residual=True, use_se=True)
            model = build_dscnn(cfg, class_activation="softmax")
            v = init_model(model, cfg, jax.random.key(0))
            lo, hi = (-1, 1) if fe == "raw" else (0, 1)
            calib = np.random.default_rng(0).uniform(
                lo, hi, (8, *cfg.input_shape())).astype(np.float32)
            tfl = convert_to_tflite(v, cfg, calib, quantize="int8",
                                    class_activation="softmax")
            ops = {op.name for op in TFLiteGraph(tfl).ops}
            bad = ops - SUPPORTED
            tag = f"{fe}/{ms}/attn={attn}"
            if bad:
                failures += 1
                print(f"[audit] {tag}: MISSING {sorted(bad)}")
            else:
                print(f"[audit] {tag}: ok ({len(ops)} op kinds)")
    print(f"[audit] {'FAIL' if failures else 'PASS'}: {failures} combos "
          "with unsupported ops")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
