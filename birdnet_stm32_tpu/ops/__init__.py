"""TPU-native DSP ops: mel filterbanks, batched STFT, magnitude scalings.

All device-side functions are pure, static-shaped, and jit-friendly; host
(numpy) twins exist where the reference computes features on the host so
golden tests can compare the two paths bit-for-bit.
"""

from birdnet_stm32_tpu.ops.mel import hz_to_mel, mel_filterbank, mel_to_hz
from birdnet_stm32_tpu.ops.stft import frame_signal, stft_magnitude
from birdnet_stm32_tpu.ops.spectrogram import spectrogram_batch

__all__ = [
    "hz_to_mel",
    "mel_to_hz",
    "mel_filterbank",
    "frame_signal",
    "stft_magnitude",
    "spectrogram_batch",
]
