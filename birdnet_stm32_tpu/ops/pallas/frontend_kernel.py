"""Fused Pallas TPU kernel for the hybrid serving frontend.

One VMEM-resident pass per batch tile: framing (dense reshape/concat, no
gather) -> windowed real-DFT matmul pair on the MXU -> magnitude -> per-
sample min-max normalization -> freq-major transpose. The XLA composition
(ops/stft.py + ops/spectrogram.py) materializes the frame and re/im tensors
in HBM between stages; here they never leave VMEM.

Replaces the reference's two STFT implementations on the hot serving path
(librosa host STFT, audio/spectrogram.py:106-115, and the firmware C STFT,
firmware/Src/audio_stft.c:24-71). Applicability: hop*2 >= n_fft (true for
every shipped config; callers fall back to the XLA path otherwise).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from birdnet_stm32_tpu.ops.stft import dft_bases


def _kernel(wave_ref, wc_ref, ws_ref, out_ref, *, n_fft, hop, n_frames):
    """One batch tile: [TB, T_pad] padded waveform -> [TB, F, W] normalized."""
    tb = wave_ref.shape[0]
    # Framing via the strided-row view: frame k = rows k, k+1 of the
    # [n_frames + 1, hop] view, truncated to n_fft (requires 2*hop >= n_fft).
    z = wave_ref[:].reshape(tb, n_frames + 1, hop)
    frames = jnp.concatenate([z[:, :-1, :], z[:, 1:, :]], axis=-1)[:, :, :n_fft]

    flat = frames.reshape(tb * n_frames, n_fft)
    re = jnp.dot(flat, wc_ref[:], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    im = jnp.dot(flat, ws_ref[:], precision=jax.lax.Precision.HIGHEST,
                 preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im).reshape(tb, n_frames, re.shape[-1])

    # Per-sample min-max to [0, 1] (ops/magnitude.py normalize_minmax).
    s_min = jnp.min(mag, axis=(1, 2), keepdims=True)
    s_max = jnp.max(mag, axis=(1, 2), keepdims=True)
    mag = (mag - s_min) / (s_max - s_min + 1e-10)

    out_ref[:] = jnp.swapaxes(mag, 1, 2)  # [TB, F, W] freq-major


@partial(jax.jit, static_argnames=("n_fft", "hop", "n_frames", "batch_tile", "interpret"))
def fused_hybrid_frontend(
    y: jax.Array,
    n_fft: int,
    hop: int,
    n_frames: int,
    batch_tile: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """[B, T] waveforms -> [B, n_fft//2+1, n_frames] normalized |STFT|.

    Equivalent to spectrogram_batch(mode='linear', mag_scale='none') with
    librosa centering, fused into one kernel. Requires 2*hop >= n_fft and
    B % batch_tile == 0 (callers pad the batch); batch_tile must be a
    multiple of 8 (Mosaic sublane tiling).

    Args:
        y: [B, T] float32 waveforms.
        n_fft, hop, n_frames: STFT geometry (hop = T // n_frames upstream).
        batch_tile: Waveforms per grid step (VMEM-bounded).
        interpret: Run in interpreter mode (CPU tests).
    """
    if 2 * hop < n_fft:
        raise ValueError(f"fused frontend requires 2*hop >= n_fft, got {hop=} {n_fft=}")
    B, T = y.shape
    if B % batch_tile:
        raise ValueError(f"batch {B} not divisible by batch_tile {batch_tile}")
    F = n_fft // 2 + 1

    # Center pad + tail pad once in XLA (cheap, fused into the input copy).
    pad = n_fft // 2
    need = (n_frames + 1) * hop
    y = jnp.pad(y, ((0, 0), (pad, max(0, need - (T + pad)))))[:, :need]

    wc, ws = dft_bases(n_fft)
    grid = (B // batch_tile,)
    return pl.pallas_call(
        partial(_kernel, n_fft=n_fft, hop=hop, n_frames=n_frames),
        out_shape=jax.ShapeDtypeStruct((B, F, n_frames), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((batch_tile, need), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((n_fft, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((n_fft, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((batch_tile, F, n_frames), lambda i: (i, 0, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(y, jnp.asarray(wc), jnp.asarray(ws))


_PALLAS_OK: bool | None = None


def pallas_available() -> bool:
    """Probe whether Mosaic kernels compile on the current backend.

    NOTE: tunneled single-chip environments whose remote compile helper
    strips the TPU topology env (`TPU_ACCELERATOR_TYPE`) cannot compile
    Mosaic kernels even though XLA programs run fine; callers fall back to
    the XLA composition (ops/spectrogram.py) there. The kernel itself is
    validated bit-identical in interpreter mode (tests/test_pallas.py).
    """
    global _PALLAS_OK
    if _PALLAS_OK is None:
        try:
            y = jnp.zeros((8, 2 * 516), jnp.float32)
            fused_hybrid_frontend(y, 512, 258, 2, batch_tile=8).block_until_ready()
            _PALLAS_OK = True
        except Exception as e:  # noqa: BLE001 — any Mosaic failure means fallback
            # Cached for the process lifetime: a compile failure won't heal,
            # and retrying a transient failure on every call would make the
            # serving path's latency unpredictable. Log what was swallowed
            # so a downgrade to the XLA path is diagnosable.
            print(f"[pallas] Mosaic probe failed ({type(e).__name__}: {e}); "
                  "using the XLA frontend composition")
            _PALLAS_OK = False
    return _PALLAS_OK


def hybrid_frontend_input(y: jax.Array, cfg, batch_tile: int = 8,
                          interpret: bool = False) -> jax.Array:
    """[B, T] -> [B, F, W, 1] hybrid model input via the fused kernel,
    falling back to the XLA composition when Mosaic is unavailable, the
    geometry violates the kernel's 2*hop >= n_fft precondition, or the
    batch doesn't divide into batch_tile (the tail is padded in)."""
    hop = max(1, y.shape[1] // cfg.spec_width)
    n_frames = min(cfg.spec_width, 1 + y.shape[1] // hop)
    if (2 * hop < cfg.fft_length or interpret is False and not pallas_available()):
        # Same features the fused kernel computes — a linear |STFT| in the
        # entry orientation — NOT inputs_for_config, which dispatches on
        # cfg.audio_frontend and could return a different frontend's shape.
        from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

        S = spectrogram_batch(y, sample_rate=cfg.sample_rate, n_fft=cfg.fft_length,
                              mel_bins=-1, spec_width=cfg.spec_width,
                              mag_scale="none", mode="linear")
        return S[..., None]
    B = y.shape[0]
    pad = (-B) % batch_tile
    if pad:
        y = jnp.pad(y, ((0, pad), (0, 0)))
    out = fused_hybrid_frontend(y, cfg.fft_length, hop, n_frames,
                                batch_tile=batch_tile, interpret=interpret)
    return out[:B, ..., None]
