"""Fused Pallas TPU kernel for the serving frontends — full epilogue.

One VMEM-resident pass per batch tile: framing (dense reshape/concat, no
gather) -> windowed real-DFT matmul pair on the MXU -> magnitude -> mel
filterbank matmul -> magnitude scaling (pwl / pcen / db / log1p / DCT for
mfcc) -> per-sample min-max normalization -> freq-major transpose ->
optional int8 quantization straight into the INT8 executor's entry-tensor
orientation. The XLA composition (ops/stft.py + ops/spectrogram.py)
materializes the frame, re/im, magnitude, and mel tensors in HBM between
stages (a measured ~3.7 us/chunk un-fusable HBM floor at flagship geometry,
docs/performance.md); here they never leave VMEM.

Replaces the reference's on-device frontend chain on the hot serving path:
the firmware C STFT (firmware/Src/audio_stft.c:24-71), its mel filterbank
apply (firmware/Src/audio_mel.c:97-124), and the host librosa feature
matrix (audio/spectrogram.py:24-147) — with the same mode x mag_scale
behavior matrix, validated against ops/spectrogram.spectrogram_batch in
interpreter mode across every export combo (tests/test_pallas.py).

Applicability: hop*2 >= n_fft (true for every shipped config; callers fall
back to the XLA path otherwise).

Round-5 hardware verdict — CLOSED: XLA wins at these shapes. Real Mosaic
compiles this kernel on the v5e (numerics 5e-7 vs XLA), but a
nine-formulation sweep (per-sample and batched-tile grids, freq- and
frame-major epilogues, MXU-aligned splits, bf16 limbs — the table in
docs/hardware-validation.md §1) measured every variant 20-30% behind the
XLA composition, with the deficit attributed entirely to Mosaic's dot
lowering vs XLA's window-2 conv lowering: the epilogue is free, the
transposes are free, and XLA leaves no HBM round-trip for VMEM residency
to save. Serving therefore defaults to the XLA path
(make_fused_classifier(pallas_mode='off')) permanently; the kernel
remains the opt-in experimentation surface (pallas_mode='auto', incl.
the round-5 grid='tile' formulation) and the interpreter-mode golden
reference. Measurement: scripts/bench_pallas_frontend.py.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from birdnet_stm32_tpu.ops import magnitude as mag_ops
from birdnet_stm32_tpu.ops.dct import dct_matrix
from birdnet_stm32_tpu.ops.mel import mel_filterbank
from birdnet_stm32_tpu.ops.stft import dft_bases

VALID_MODES = ("linear", "mel", "log_mel", "mfcc")


def _frame_and_mag(z, base_refs, *, n_fft, hop, power):
    """[Wf+1, hop] strided-row waveform view -> [Wf, F] |STFT| (or power).

    Framing never reshapes or concatenates along the lane dimension —
    Mosaic rejects those shape casts (`tpu.reshape vector<8x1548> ->
    vector<8x3x516>` was the round-3 compile blocker). Instead frame k =
    (row k ++ row k+1)[:n_fft] is expressed as a SPLIT matmul against the
    pre-split DFT bases: rows [:‑1] hit base[:hop_l] and, when n_fft >
    hop, rows [1:] (lane prefix n_fft−hop) hit base[hop_l:] — two plain
    2-D MXU dots per component, summed. Requires 2*hop >= n_fft.
    """
    wcl_ref, wsl_ref, wcr_ref, wsr_ref = base_refs
    hop_l = min(hop, n_fft)
    left = z[:-1, :hop_l]
    re = jnp.dot(left, wcl_ref[:], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(left, wsl_ref[:], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    if n_fft > hop:
        right = z[1:, : n_fft - hop]
        re = re + jnp.dot(right, wcr_ref[:], precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
        im = im + jnp.dot(right, wsr_ref[:], precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    sq = re * re + im * im
    return sq if power == 2.0 else jnp.sqrt(sq)


def _sample_epilogue(S, dct_ref, *, mode, mag_scale, sample_rate, hop,
                     spec_width, quant, freq_major_out: bool = True):
    """One sample's post-mel epilogue: [Wf, bins_in] magnitudes (mel/DCT
    already applied for mel modes; mfcc receives POWER mel) -> final
    [bins, out_w] float32 (freq_major_out) or [out_w, bins]
    (frame-major — the tile grid emits this and lets XLA transpose
    outside the kernel), or — with `quant` — the int8 entry tile
    [out_w, bins], always frame-major (the executor's entry-TRANSPOSE
    orientation, so the quant path never transposes in-kernel at all).

    The math runs frame-major natively: every op here is either
    elementwise or reduces over BOTH axes, so the values are identical
    to the freq-major formulation (pcen is the one axis-sensitive op —
    its time-axis smoother gets local transposes; it is
    interpreter-only anyway, Mosaic rejects its scan). Applies the exact
    spectrogram_batch (ops/spectrogram.py) behavior matrix — same helper
    functions, same normalization placement — so outputs match the XLA
    composition. Shared by the per-sample and batched-tile grids."""
    axes = (0, 1)
    # S stays [Wf, bins] frame-major throughout.

    if mode == "mfcc":
        # power_to_db ref/top_db stats over the FULL frame count, DCT over
        # the mel axis, then slice to spec_width (spectrogram_batch order).
        ref = jnp.max(S, axis=axes, keepdims=True)
        S = mag_ops.power_to_db(S, ref=ref, top_db=80.0, axis=axes)
        S = jnp.dot(S, dct_ref[:], precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)  # [Wf, n_mfcc]
        S = S[:spec_width]
    elif mode == "log_mel":
        S = jnp.log1p(S)
    elif mag_scale == "pcen":
        S = mag_ops.pcen(S.T * (2.0**31), sr=sample_rate, hop_length=hop).T
    elif mag_scale == "pwl":
        S = mag_ops.pwl_compress(mag_ops.normalize_minmax(S, axis=axes))
    elif mag_scale == "db":
        ref = jnp.max(S, axis=axes, keepdims=True)
        S = mag_ops.amplitude_to_db(S, ref=ref, top_db=80.0, axis=axes)

    S = mag_ops.normalize_minmax(S, axis=axes)

    if quant is None:
        return S.T if freq_major_out else S
    # int8-quantize epilogue: emit the INT8 executor's entry tensor in
    # the entry-TRANSPOSE output orientation [W, bins], i.e. the
    # graph's leading QUANTIZE -> TRANSPOSE pair collapses into this
    # kernel (quant/tflite_import.py entry_transpose_perm semantics).
    scale, zp = quant
    # Same float ops as the executor's entry quantize (_round_away(x/s)
    # + zp, quant/tflite_import.py) — a multiply by 1/scale would round
    # differently in the last ULP and flip occasional int8 codes.
    f = S / scale
    q = jnp.sign(f) * jnp.floor(jnp.abs(f) + 0.5) + zp
    return jnp.clip(q, -128, 127).astype(jnp.int8)  # [W, bins]


def _split_refs(refs, *, n_fft, hop, mode):
    wave_ref, wcl_ref, wsl_ref, *rest = refs
    out_ref = rest[-1]
    rest = rest[:-1]
    if n_fft > hop:
        wcr_ref, wsr_ref, *rest = rest
    else:
        wcr_ref = wsr_ref = None
    fb_ref = rest[0] if mode != "linear" else None
    dct_ref = rest[1] if mode == "mfcc" else None
    return wave_ref, (wcl_ref, wsl_ref, wcr_ref, wsr_ref), fb_ref, dct_ref, out_ref


def _kernel(*refs, n_fft, hop, n_frames, spec_width, mode, mag_scale,
            sample_rate, quant):
    """One SAMPLE through the full frontend epilogue (grid = batch).

    refs: (wave, wcl, wsl, [wcr, wsr], [fb], [dct], out). Every in-kernel
    array is 2-D — framing via split matmuls, mel/DCT as plain dots, one
    [Wf, bins] transpose — the dialect subset real Mosaic compiles (a
    lane-splitting batch-tile formulation was what it rejected in round 3;
    the sublane-stacked tile grid of _kernel_tile is the round-5 retry).
    """
    wave_ref, base_refs, fb_ref, dct_ref, out_ref = _split_refs(
        refs, n_fft=n_fft, hop=hop, mode=mode)

    power = 2.0 if mode == "mfcc" else 1.0
    z = wave_ref[0]  # [Wf + 1, hop]
    S = _frame_and_mag(z, base_refs, n_fft=n_fft, hop=hop, power=power)  # [Wf, F]
    if fb_ref is not None:
        # Mel matmul on the MXU while the sample is VMEM-resident (the
        # firmware applies this per-frame on the M55, audio_mel.c:97-124).
        S = jnp.dot(S, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)

    S = _sample_epilogue(S, dct_ref, mode=mode, mag_scale=mag_scale,
                         sample_rate=sample_rate, hop=hop,
                         spec_width=spec_width, quant=quant)
    if quant is None:
        out_ref[0] = S
    else:
        out_ref[0, 0] = S


def _kernel_tile(*refs, n_fft, hop, n_frames, spec_width, mode, mag_scale,
                 sample_rate, quant, tile, bins, out_w):
    """TILE samples through the frontend per grid program (round-5 batched
    formulation, docs/hardware-validation.md §1 "remaining open item").

    The tile's waveform rows are stacked along the SUBLANE axis outside the
    kernel ([tile*(Wf+1), hop] — an XLA-side reshape, so no lane-splitting
    shape cast ever reaches Mosaic): the framing/DFT matmuls then run ONCE
    over the whole stack with tile× the MXU rows of the per-sample grid.
    Frame k of sample g pairs stacked rows g*(Wf+1)+k and +k+1 — both
    within sample g — so `A[:-1] + B[1:]` yields every frame, plus one
    garbage boundary row per sample that the per-sample epilogue slices
    (static sublane-offset slices, which Mosaic accepts) never read.
    Outputs stack per-sample results along sublanes too; the caller
    un-stacks with another free XLA reshape.
    """
    wave_ref, base_refs, fb_ref, dct_ref, out_ref = _split_refs(
        refs, n_fft=n_fft, hop=hop, mode=mode)

    power = 2.0 if mode == "mfcc" else 1.0
    z = wave_ref[0]  # [tile*(Wf+1), hop]
    S_all = _frame_and_mag(z, base_refs, n_fft=n_fft, hop=hop, power=power)
    if fb_ref is not None:
        # One stacked mel matmul (garbage boundary rows included — cheaper
        # than tile separate dots, and those rows are never read).
        S_all = jnp.dot(S_all, fb_ref[:], precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)

    stride = n_frames + 1
    for g in range(tile):
        S = S_all[g * stride : g * stride + n_frames]
        # Frame-major output ([out_w, bins] rows): the tile kernel never
        # transposes in-kernel — float callers transpose once in XLA
        # outside, the quant path needs no transpose at all (entry
        # orientation IS frame-major).
        S = _sample_epilogue(S, dct_ref, mode=mode, mag_scale=mag_scale,
                             sample_rate=sample_rate, hop=hop,
                             spec_width=spec_width, quant=quant,
                             freq_major_out=False)
        out_ref[0, g * out_w : (g + 1) * out_w, :] = S


@partial(jax.jit, static_argnames=(
    "mode", "mag_scale", "sample_rate", "n_fft", "mel_bins", "spec_width",
    "n_mfcc", "quant", "batch_tile", "interpret", "hop", "n_frames", "grid"))
def fused_spectrogram(
    y: jax.Array,
    mode: str = "linear",
    mag_scale: str = "none",
    sample_rate: int = 22050,
    n_fft: int = 512,
    mel_bins: int = 64,
    spec_width: int = 256,
    n_mfcc: int = 20,
    quant: tuple[float, int] | None = None,
    batch_tile: int = 8,
    interpret: bool = False,
    hop: int | None = None,
    n_frames: int | None = None,
    grid: str = "sample",
) -> jax.Array:
    """[B, T] waveforms -> frontend features, one fused VMEM-resident pass.

    Equivalent to spectrogram_batch(...) for the same (mode, mag_scale)
    with librosa centering and hop = T // spec_width. Returns
    [B, bins, W] float32 (bins = n_fft//2+1, mel_bins, or n_mfcc), or —
    with `quant=(scale, zero_point)` — the INT8 executor entry tensor
    [B, 1, W, bins] int8 (entry QUANTIZE + TRANSPOSE folded in).

    Requires 2*hop >= n_fft. Two grids:

    - grid='sample' (default): one program per sample; `batch_tile` is
      accepted for API compatibility and ignored; any batch size runs.
    - grid='tile': `batch_tile` samples per program, stacked along the
      SUBLANE axis so every in-kernel array stays 2-D while the DFT
      matmuls get batch_tile× the MXU rows (_kernel_tile); requires
      B % batch_tile == 0 (callers pad or fall back).
    """
    if grid not in ("sample", "tile"):
        raise ValueError(f"grid must be 'sample'|'tile', got {grid!r}")
    if grid == "tile" and y.shape[0] % batch_tile:
        raise ValueError(
            f"grid='tile' requires B % batch_tile == 0, got B={y.shape[0]} "
            f"batch_tile={batch_tile}")
    if mode not in VALID_MODES:
        raise ValueError(f"Invalid mode: {mode!r}")
    B, T = y.shape
    if hop is None:
        hop = max(1, T // spec_width) if spec_width > 0 else n_fft // 2
    if 2 * hop < n_fft:
        raise ValueError(f"fused frontend requires 2*hop >= n_fft, got {hop=} {n_fft=}")
    F = n_fft // 2 + 1

    # Frame count: mfcc stats (power_to_db ref/top_db) run over the FULL
    # librosa frame count before slicing; other modes slice first
    # (spectrogram_batch, ops/spectrogram.py:77-81).
    n_frames_full = 1 + T // hop
    if n_frames is None:
        if mode == "mfcc" or spec_width <= 0:
            n_frames = n_frames_full
        else:
            n_frames = min(spec_width, n_frames_full)
    if mode == "mfcc" and spec_width > 0:
        out_w = min(spec_width, n_frames)
    else:
        out_w = n_frames

    if mode == "linear":
        bins = F
    elif mode == "mfcc":
        bins = n_mfcc
    else:
        bins = mel_bins

    # Center pad + tail pad once in XLA (cheap, fused into the input copy),
    # then expose the strided-row framing view [B, Wf+1, hop] as an HBM
    # reshape — free outside the kernel, and it removes the lane-splitting
    # in-kernel reshape Mosaic rejects.
    pad = n_fft // 2
    need = (n_frames + 1) * hop
    y = jnp.pad(y, ((0, 0), (pad, max(0, need - (T + pad)))))[:, :need]
    tile = batch_tile if grid == "tile" else 1
    n_programs = B // tile
    if grid == "tile":
        # Stack the tile's samples along the sublane axis (free XLA-side
        # reshape); in-kernel arrays stay 2-D.
        y = y.reshape(n_programs, tile * (n_frames + 1), hop)
    else:
        y = y.reshape(B, n_frames + 1, hop)

    # DFT bases pre-split at the frame boundary (hop): the kernel's framing
    # is a split matmul, and slicing the bases HERE (numpy, static) avoids
    # in-kernel sublane-offset slices.
    wc, ws = dft_bases(n_fft)
    hop_l = min(hop, n_fft)
    operands = [y, jnp.asarray(wc[:hop_l]), jnp.asarray(ws[:hop_l])]
    in_specs = [
        pl.BlockSpec((1, tile * (n_frames + 1), hop), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((hop_l, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((hop_l, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    if n_fft > hop:
        operands += [jnp.asarray(wc[hop:]), jnp.asarray(ws[hop:])]
        in_specs += [
            pl.BlockSpec((n_fft - hop, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft - hop, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ]
    if mode != "linear":
        fb = mel_filterbank(sample_rate, n_fft, mel_bins, fmin=150.0,
                            fmax=float(sample_rate // 2))
        operands.append(jnp.asarray(fb))
        in_specs.append(pl.BlockSpec((F, mel_bins), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))
    if mode == "mfcc":
        operands.append(jnp.asarray(dct_matrix(mel_bins, n_mfcc)))
        in_specs.append(pl.BlockSpec((mel_bins, n_mfcc), lambda i: (0, 0),
                                     memory_space=pltpu.VMEM))

    if grid == "tile":
        # Per-sample outputs stack FRAME-MAJOR along sublanes (the kernel
        # never transposes); un-stacked below with a free XLA reshape, and
        # float outputs get their one [W, bins] -> [bins, W] transpose in
        # XLA outside the kernel.
        dtype = jnp.float32 if quant is None else jnp.int8
        out_shape = jax.ShapeDtypeStruct((n_programs, tile * out_w, bins),
                                         dtype)
        out_specs = pl.BlockSpec((1, tile * out_w, bins),
                                 lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
        out = pl.pallas_call(
            partial(_kernel_tile, n_fft=n_fft, hop=hop, n_frames=n_frames,
                    spec_width=spec_width, mode=mode, mag_scale=mag_scale,
                    sample_rate=sample_rate, quant=quant, tile=tile,
                    bins=bins, out_w=out_w),
            out_shape=out_shape,
            grid_spec=pl.GridSpec(grid=(n_programs,), in_specs=in_specs,
                                  out_specs=out_specs),
            interpret=interpret,
        )(*operands)
        if quant is None:
            return out.reshape(B, out_w, bins).transpose(0, 2, 1)
        return out.reshape(B, 1, out_w, bins)

    if quant is None:
        out_shape = jax.ShapeDtypeStruct((B, bins, out_w), jnp.float32)
        out_specs = pl.BlockSpec((1, bins, out_w), lambda i: (i, 0, 0),
                                 memory_space=pltpu.VMEM)
    else:
        out_shape = jax.ShapeDtypeStruct((B, 1, out_w, bins), jnp.int8)
        out_specs = pl.BlockSpec((1, 1, out_w, bins),
                                 lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM)

    return pl.pallas_call(
        partial(_kernel, n_fft=n_fft, hop=hop, n_frames=n_frames,
                spec_width=spec_width, mode=mode, mag_scale=mag_scale,
                sample_rate=sample_rate, quant=quant),
        out_shape=out_shape,
        grid_spec=pl.GridSpec(grid=(B,), in_specs=in_specs,
                              out_specs=out_specs),
        interpret=interpret,
    )(*operands)


def fused_hybrid_frontend(
    y: jax.Array,
    n_fft: int,
    hop: int,
    n_frames: int,
    batch_tile: int = 8,
    interpret: bool = False,
    grid: str = "sample",
) -> jax.Array:
    """[B, T] waveforms -> [B, n_fft//2+1, n_frames] normalized |STFT|.

    Explicit-geometry wrapper over fused_spectrogram(mode='linear').
    """
    return fused_spectrogram(y, mode="linear", mag_scale="none", n_fft=n_fft,
                             spec_width=n_frames, hop=hop, n_frames=n_frames,
                             batch_tile=batch_tile, interpret=interpret,
                             grid=grid)


_PALLAS_OK: bool | None = None


def pallas_available() -> bool:
    """Probe whether Mosaic kernels compile on the current backend.

    As of round 4 the tunneled v5e environment DOES compile Mosaic (the
    remote compile helper gained AOT TPU support), and this kernel's
    per-sample 2-D formulation passes it: validated on-chip at 5e-7 vs
    the XLA composition across the mode matrix (pcen excepted — see
    frontend_input). The probe still guards environments without Mosaic
    (pure-CPU runs fall back to the XLA composition; interpreter-mode
    tests cover the kernel there).
    """
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            y = jnp.zeros((8, 2 * 516), jnp.float32)
            fused_spectrogram(y, mode="linear", n_fft=512, spec_width=2,
                              batch_tile=8).block_until_ready()
            _PALLAS_OK = True
        except Exception as e:  # noqa: BLE001 — any Mosaic failure means fallback
            # Cached for the process lifetime: a compile failure won't heal,
            # and retrying a transient failure on every call would make the
            # serving path's latency unpredictable. Log what was swallowed
            # so a downgrade to the XLA path is diagnosable.
            from birdnet_stm32_tpu.utils.logging import warn

            warn("pallas", f"Mosaic probe failed ({type(e).__name__}: {e}); "
                 "using the XLA frontend composition")
            _PALLAS_OK = False
    return _PALLAS_OK


def _kernel_geometry_ok(cfg, T: int) -> bool:
    hop = max(1, T // cfg.spec_width)
    return 2 * hop >= cfg.fft_length


def frontend_input(y: jax.Array, cfg, batch_tile: int = 8,
                   interpret: bool = False,
                   quant: tuple[float, int] | None = None) -> jax.Array:
    """[B, T] -> model input via the fused kernel for any spectrogram
    frontend (hybrid / librosa / mfcc / log_mel), falling back to the XLA
    composition (ops/frontend.inputs_for_config) when Mosaic is
    unavailable, the geometry violates the kernel's 2*hop >= n_fft
    precondition, or the frontend is 'raw' (no spectrogram to fuse).

    Float output is [B, bins, W, 1]; with `quant` (hybrid/librosa only)
    the INT8 executor entry tensor [B, 1, W, bins] int8 is produced
    in-kernel (feed build_executor(pretransposed_input=True,
    prequantized_input=True)). Any batch size runs (per-sample grid).
    """
    mode = {"hybrid": "linear", "librosa": "mel",
            "mfcc": "mfcc", "log_mel": "log_mel"}.get(cfg.audio_frontend)
    # pcen's associative-scan smoother hits an MLIR slice Mosaic rejects
    # (round-4 compile log); it stays interpreter-validated + XLA-served.
    pcen_blocked = (mode == "mel" and cfg.mag_scale == "pcen"
                    and not interpret)
    usable = (mode is not None and not pcen_blocked
              and _kernel_geometry_ok(cfg, y.shape[1])
              and (interpret or pallas_available()))
    if not usable:
        if quant is not None:
            raise ValueError(
                "in-kernel quantization has no XLA fallback here; callers "
                "gate on pallas_available() and quantize via the executor")
        from birdnet_stm32_tpu.ops.frontend import inputs_for_config

        return inputs_for_config(y, cfg)

    mag_scale = cfg.mag_scale if mode == "mel" else "none"
    out = fused_spectrogram(
        y, mode=mode, mag_scale=mag_scale, sample_rate=cfg.sample_rate,
        n_fft=cfg.fft_length, mel_bins=cfg.num_mels, spec_width=cfg.spec_width,
        n_mfcc=cfg.n_mfcc, quant=quant, batch_tile=batch_tile,
        interpret=interpret)
    if quant is not None:
        return out
    return out[..., None]


def hybrid_frontend_input(y: jax.Array, cfg, batch_tile: int = 8,
                          interpret: bool = False) -> jax.Array:
    """[B, T] -> [B, F, W, 1] hybrid model input via the fused kernel
    (back-compat wrapper over frontend_input; the XLA fallback computes the
    same linear |STFT| via spectrogram_batch)."""
    if cfg.audio_frontend == "hybrid":
        return frontend_input(y, cfg, batch_tile=batch_tile, interpret=interpret)
    # Hybrid features regardless of cfg.audio_frontend (legacy semantics).
    if _kernel_geometry_ok(cfg, y.shape[1]) and (interpret or pallas_available()):
        out = fused_spectrogram(y, mode="linear", n_fft=cfg.fft_length,
                                spec_width=cfg.spec_width,
                                batch_tile=batch_tile, interpret=interpret)
        return out[..., None]
    from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

    S = spectrogram_batch(y, sample_rate=cfg.sample_rate, n_fft=cfg.fft_length,
                          mel_bins=-1, spec_width=cfg.spec_width,
                          mag_scale="none", mode="linear")
    return S[..., None]
