"""Device-side polyphase resampling as a dilated convolution.

`scipy.signal.resample_poly` semantics (the reference's host resampler,
audio/io.py:14-30 there) computed on the accelerator: upfirdn — zero-stuff
upsample by `up`, Kaiser-windowed-sinc FIR low-pass, downsample by `down` —
is exactly one `lax.conv_general_dilated` with `lhs_dilation=up` and
`window_strides=down`. The MXU/whatever-XLA-picks does the filtering; no
frame tensor, no host round trip.

Why on device: host serving throughput is decode-bound, and resampling is
~30-40% of the host's per-file cost (docs/performance.md). Moving it into
the serving program lets hosts feed native-rate PCM and amortizes the
filter FLOPs into the existing dispatch. Filter design (a few thousand
floats) happens once on the host in numpy, matching scipy's
firwin(2*10*max(up,down)+1, 1/max(up,down), window=('kaiser', 5.0)) — the
same design the native C++ resampler implements (native/audio_native.cc,
scipy parity 5e-7).
"""

from __future__ import annotations

from functools import lru_cache
from math import gcd

import numpy as np

import jax.numpy as jnp
from jax import lax


@lru_cache(maxsize=32)
def kaiser_poly_filter(up: int, down: int) -> np.ndarray:
    """scipy resample_poly's FIR: firwin Kaiser(5.0) low-pass scaled by up.

    Args:
        up, down: Rate ratio, already reduced by gcd.

    Returns:
        float32 taps of length 2*10*max(up, down) + 1 (zero-phase center).
    """
    from scipy.signal import firwin

    max_rate = max(up, down)
    half_len = 10 * max_rate
    # The exact filter resample_poly designs (scipy is already a runtime
    # dependency via the host fallback in audio/io.fast_resample), scaled
    # by up per its polyphase convention.
    taps = firwin(2 * half_len + 1, 1.0 / max_rate, window=("kaiser", 5.0)) * up
    return taps.astype(np.float32)


def resample_output_len(n_in: int, sr_in: int, sr_out: int) -> int:
    """Output length of resample_poly: ceil(n_in * up / down)."""
    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    return -(-n_in * up // down)


def resample_poly_device(x: jnp.ndarray, sr_in: int, sr_out: int) -> jnp.ndarray:
    """Batched resample [B, T] (or [T]) at sr_in -> [B, T_out] at sr_out.

    Matches scipy.signal.resample_poly(x, up, down, axis=-1) with the
    default ('kaiser', 5.0) window and zero edge padding, to float32
    accuracy. Jit-safe: all shapes derive from static ints.
    """
    if sr_in == sr_out:
        return x.astype(jnp.float32)
    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g

    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    B, T = x.shape
    n_out = -(-T * up // down)  # ceil

    taps = kaiser_poly_filter(up, down)
    n_taps = taps.shape[0]
    half_len = (n_taps - 1) // 2

    # y[j] = sum_k x[k] * taps[j*down + half_len - k*up]
    #      = correlation of the zero-stuffed signal with reversed taps,
    #        window start j*down - half_len  =>  left pad half_len.
    # (taps are symmetric; reversal kept for upfirdn fidelity.)
    up_len = (T - 1) * up + 1  # zero-stuffed length
    pad_l = half_len
    pad_r = max(0, (n_out - 1) * down + n_taps - pad_l - up_len)

    out = lax.conv_general_dilated(
        x[:, None, :].astype(jnp.float32),           # [B, 1, T]
        jnp.asarray(taps[::-1].copy())[None, None, :],  # [1, 1, n_taps]
        window_strides=(down,),
        padding=[(pad_l, pad_r)],
        lhs_dilation=(up,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[:, 0, :n_out]
    return out[0] if squeeze else out


def resample_chunk_batch(wave: jnp.ndarray, sr_in: int, cfg) -> jnp.ndarray:
    """Resample a [B, T_src] chunk batch to exactly cfg.chunk_samples.

    Serving entry point: chunks arrive at the file's native rate with
    T_src = chunk_duration * sr_in samples; after resampling, rounding can
    leave the length one sample off cfg.chunk_samples — pad/trim to the
    model's static geometry.
    """
    y = resample_poly_device(wave, sr_in, cfg.sample_rate)
    want = cfg.chunk_samples
    have = y.shape[-1]
    if have < want:
        y = jnp.pad(y, ((0, 0), (0, want - have)))
    elif have > want:
        y = y[:, :want]
    return y
