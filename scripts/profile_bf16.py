"""Per-op attribution of the bf16 serving path (round-5 VERDICT ask #6).

The bf16 headline (~116k chunks/s ≈ 12-13% of v5e peak) had no published
attribution. This script answers "where do the microseconds go" two ways:

1. jax.profiler perfetto trace of classify_bf16 at B=2048 — parsed
   directly (gzip+json, no tensorboard needed), aggregated by XLA op,
   top sinks printed with per-chunk µs. Works where the backend supports
   device tracing.
2. Stage microbenchmarks (always works, tunnel included): frontend-only,
   model-only (features pre-resident), fused end-to-end — the residual
   between sum-of-stages and fused shows what fusion saves/costs.

Usage: python scripts/profile_bf16.py [B]
"""

from __future__ import annotations

import glob
import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_birdnet_tpu")

from birdnet_stm32_tpu.config import ModelConfig  # noqa: E402
from birdnet_stm32_tpu.models.transplant import load_reference_model  # noqa: E402
from birdnet_stm32_tpu.ops.frontend import inputs_for_config  # noqa: E402
from birdnet_stm32_tpu.utils.benchmarking import sustained_chunks_per_sec  # noqa: E402

CKPT = "/root/reference/checkpoints/birdnet_stm32n6_100"


def parse_perfetto(trace_dir: str):
    """Aggregate device-track slice durations by op name from the newest
    perfetto trace under `trace_dir` (program-level jit_* parent slices
    excluded — they contain every child). Returns {name: total_us}."""
    paths = sorted(glob.glob(f"{trace_dir}/**/*.json.gz", recursive=True))
    if not paths:
        return None
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", trace if isinstance(trace, list) else [])
    # Device tracks: process names containing TPU/device. Map pid->name.
    proc_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            proc_names[e.get("pid")] = e.get("args", {}).get("name", "")
    dev_pids = {p for p, n in proc_names.items()
                if any(k in n.lower() for k in ("tpu", "device", "/device:"))}
    sums: dict[str, float] = defaultdict(float)
    for e in events:
        if e.get("ph") != "X" or "dur" not in e:
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        if e["name"].startswith("jit_"):  # whole-program parent slice
            continue
        sums[e["name"]] += float(e["dur"])  # µs
    return dict(sums) if sums else None


def hlo_fusion_opcodes(hlo_text: str) -> dict[str, str]:
    """Map entry-computation instruction names (as they appear in trace
    slices, e.g. 'fusion.2') to a compact opcode summary: the fusion's
    computation's heavy ops (convolution/dot) if any, else its ROOT op."""
    import re

    # fused computation name -> opcodes inside it
    comp_ops: dict[str, list[str]] = {}
    cur = None
    for line in hlo_text.splitlines():
        m = re.match(r"%?(fused_computation[.\w]*)\s*\(", line.strip())
        if m:
            cur = m.group(1)
            comp_ops[cur] = []
            continue
        if cur is not None:
            if line.strip().startswith("}"):
                cur = None
                continue
            m = re.match(r"(?:ROOT\s+)?%?[\w.-]+\s*=\s*\S+\s+([a-z-]+)\(",
                         line.strip())
            if m:
                comp_ops[cur].append(m.group(1))
    # entry instruction name -> computation (or direct opcode)
    out: dict[str, str] = {}
    for m in re.finditer(
            r"%?([\w.-]+)\s*=\s*\S+\s+fusion\(.*?calls=%?([\w.-]+)",
            hlo_text):
        name, comp = m.group(1), m.group(2)
        ops = comp_ops.get(comp, [])
        heavy = [o for o in ops if o in ("convolution", "dot")]
        rest = [o for o in ops if o not in ("parameter", "constant")]
        out[name] = "+".join(sorted(set(heavy))) if heavy else (
            ",".join(rest[-3:]) if rest else "?")
    for m in re.finditer(r"%?([\w.-]+)\s*=\s*\S+\s+(convolution|dot|copy|"
                         r"transpose|reshape|convert|pad|slice|reduce)\(",
                         hlo_text):
        out.setdefault(m.group(1), m.group(2))
    return out


def profile_trace(fused, wave, opcodes, trace_dir, n_iters, B):
    """Trace + aggregate + print top ops and op-class shares."""
    try:
        with jax.profiler.trace(trace_dir, create_perfetto_trace=True):
            for _ in range(n_iters):
                out = fused(wave)
            float(out)
        sums = parse_perfetto(trace_dir)
    except Exception as e:  # noqa: BLE001 — tracing may be unsupported here
        print(json.dumps({"stage": "profiler",
                          "error": f"{type(e).__name__}: {e}"[:200]}))
        sums = None
    if not sums:
        print(json.dumps({"stage": "profiler",
                          "note": "no device trace events captured on this "
                                  "backend; stage microbenchmarks above are "
                                  "the attribution"}), flush=True)
        return
    total = sum(sums.values())
    top = sorted(sums.items(), key=lambda kv: -kv[1])[:14]
    n_chunks = n_iters * B
    for name, t in top:
        print(json.dumps({"op": name[:60], "hlo": opcodes.get(name, "?")[:60],
                          "share_pct": round(100 * t / total, 1),
                          "us_per_chunk": round(t / n_chunks, 3)}), flush=True)
    classes: dict[str, float] = defaultdict(float)
    for name, t in sums.items():
        k = opcodes.get(name, "?")
        if "convolution" in k:
            k = "convolution(+fused elementwise)"
        elif "dot" in k:
            k = "dot(+fused elementwise)"
        elif any(s in k for s in ("copy", "transpose", "reshape", "pad",
                                  "slice", "convert", "bitcast")):
            k = "layout/convert"
        elif k == "?":
            k = "other"
        else:
            k = "elementwise/reduce fusion"
        classes[k] += t
    for k, t in sorted(classes.items(), key=lambda kv: -kv[1]):
        print(json.dumps({"op_class": k, "share_pct": round(100 * t / total, 1),
                          "us_per_chunk": round(t / n_chunks, 3)}), flush=True)


def main_int8(B: int) -> None:
    """Per-op attribution of the fused INT8 serving path (exact requant)."""
    from birdnet_stm32_tpu.models.runners import TFLiteSimRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    cfg = ModelConfig.load(f"{CKPT}_model_config.json")
    runner = TFLiteSimRunner(f"{CKPT}.tflite")
    classify = make_fused_classifier(runner, cfg, as_numpy=False)
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))
    fused = jax.jit(lambda w: classify(w).sum())
    opcodes = {}
    try:
        opcodes = hlo_fusion_opcodes(fused.lower(wave).compile().as_text())
    except Exception:  # noqa: BLE001
        pass
    float(fused(wave))
    from birdnet_stm32_tpu.utils.benchmarking import (
        sustained_chunks_per_sec as scs,
    )

    r = scs(fused, wave)
    print(json.dumps({"stage": "fused_e2e_int8", "chunks_per_sec": round(r),
                      "us_per_chunk": round(1e6 / r, 2)}), flush=True)
    profile_trace(fused, wave, opcodes, "/tmp/jax_trace_int8", 8, B)


def main() -> None:
    if "--int8" in sys.argv:
        sys.argv.remove("--int8")
        main_int8(int(sys.argv[1]) if len(sys.argv) > 1 else 2048)
        return
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    cfg = ModelConfig.load(f"{CKPT}_model_config.json")
    model, variables, _ = load_reference_model(f"{CKPT}.keras",
                                               f"{CKPT}_model_config.json")
    rng = np.random.default_rng(0)
    wave = jnp.asarray(rng.normal(size=(B, cfg.chunk_samples)).astype(np.float32))

    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    runner = FlaxRunner(model, variables, cfg, dtype=jnp.bfloat16)
    classify = make_fused_classifier(runner, cfg, as_numpy=False)

    # --- stage microbenchmarks (always available) -----------------------
    from birdnet_stm32_tpu.ops.frontend import waveform_to_input

    def frontend_only(w):
        return waveform_to_input(
            w, audio_frontend=cfg.audio_frontend, sample_rate=cfg.sample_rate,
            n_fft=cfg.fft_length, mel_bins=cfg.num_mels,
            spec_width=cfg.spec_width, mag_scale=cfg.mag_scale,
            n_mfcc=cfg.n_mfcc, chunk_samples=cfg.chunk_samples,
            stft_precision="high", feature_dtype=jnp.bfloat16).sum()

    r_front = sustained_chunks_per_sec(jax.jit(frontend_only), wave)
    x = waveform_to_input(
        wave, audio_frontend=cfg.audio_frontend, sample_rate=cfg.sample_rate,
        n_fft=cfg.fft_length, mel_bins=cfg.num_mels, spec_width=cfg.spec_width,
        mag_scale=cfg.mag_scale, n_mfcc=cfg.n_mfcc,
        chunk_samples=cfg.chunk_samples, stft_precision="high",
        feature_dtype=jnp.bfloat16)
    x = jax.block_until_ready(x)

    def model_only(feats):
        return runner._infer(feats).sum()

    r_model = sustained_chunks_per_sec(jax.jit(model_only), x)
    r_fused = sustained_chunks_per_sec(
        jax.jit(lambda w: classify(w).sum()), wave)
    us = lambda r: 1e6 / r
    print(json.dumps({"stage": "frontend_bf16", "chunks_per_sec": round(r_front),
                      "us_per_chunk": round(us(r_front), 2)}), flush=True)
    print(json.dumps({"stage": "model_bf16", "chunks_per_sec": round(r_model),
                      "us_per_chunk": round(us(r_model), 2)}), flush=True)
    print(json.dumps({"stage": "fused_e2e_bf16", "chunks_per_sec": round(r_fused),
                      "us_per_chunk": round(us(r_fused), 2),
                      "sum_of_stages_us": round(us(r_front) + us(r_model), 2)}),
          flush=True)

    # --- jax.profiler perfetto trace ------------------------------------
    fused = jax.jit(lambda w: classify(w).sum())
    opcodes = {}
    try:
        opcodes = hlo_fusion_opcodes(
            fused.lower(wave).compile().as_text())
    except Exception:  # noqa: BLE001 — attribution still useful without it
        pass
    float(fused(wave))  # compiled + warm
    profile_trace(fused, wave, opcodes, "/tmp/jax_trace_bf16", 8, B)


if __name__ == "__main__":
    main()
