"""ctypes bindings for the native host-side audio library.

Loads native/build/libaudio_native.so (building it with `make -C native` on
first use if a compiler is available) and exposes the decode / resample /
normalize hot loop as numpy-friendly functions. Every function has a pure
numpy twin in audio/io.py; `available()` gates the fast path so the
framework works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
# Wheel installs have no repo-relative native/ tree; BIRDNET_TPU_NATIVE_LIB
# points them at a prebuilt library (docs/release-process.md).
_SO_PATH = Path(os.environ.get(
    "BIRDNET_TPU_NATIVE_LIB",
    _REPO_ROOT / "native" / "build" / "libaudio_native.so"))
_lib = None
_load_failed = False
_load_lock = threading.Lock()


def _build_locked(target: Path | None = None):
    """Build the library under an exclusive cross-process file lock.

    Loader threads AND spawn-pool workers can hit the first use
    concurrently; without the lock, two `make` runs link to the same
    output path and a reader can CDLL a partially-written .so (latching
    _load_failed for the process lifetime).

    `target` is the .so this caller needs (default: the base library).
    Guarding `make` on the BASE library alone would skip the build when
    the codec .so is the missing one (e.g. base built before libav-dev
    was installed), permanently latching codec_available() False.
    """
    import fcntl

    target = target or _SO_PATH
    build_dir = _SO_PATH.parent
    build_dir.mkdir(parents=True, exist_ok=True)
    with open(build_dir / ".build.lock", "w") as lk:
        fcntl.flock(lk, fcntl.LOCK_EX)
        try:
            if not target.exists():  # another process may have built it
                subprocess.run(["make", "-C", str(_REPO_ROOT / "native")],
                               check=True, capture_output=True, timeout=120)
        finally:
            fcntl.flock(lk, fcntl.LOCK_UN)


def _try_load():
    global _lib, _load_failed
    if _lib is not None or _load_failed:
        return _lib
    if os.environ.get("BIRDNET_TPU_NO_NATIVE"):
        _load_failed = True
        return None
    with _load_lock:
        if _lib is not None or _load_failed:
            return _lib
        return _try_load_locked()


def _try_load_locked():
    global _lib, _load_failed
    try:
        if not _SO_PATH.exists():
            _build_locked()
        lib = ctypes.CDLL(str(_SO_PATH))
    except Exception:
        _load_failed = True
        return None

    lib.wav_native_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
    lib.wav_native_info.restype = ctypes.c_int
    lib.wav_native_read.argtypes = [
        ctypes.c_char_p, ctypes.c_long, ctypes.c_long, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float)]
    lib.wav_native_read.restype = ctypes.c_long
    lib.resample_poly_native.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_long, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_float)]
    lib.resample_poly_native.restype = ctypes.c_long
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native library loaded (or could be built) on this host."""
    return _try_load() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def wav_info(path: str | os.PathLike) -> tuple[int, int, int]:
    """(sample_rate, channels, frames) of a WAV file."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    sr, ch, fr = ctypes.c_int(), ctypes.c_int(), ctypes.c_long()
    rc = lib.wav_native_info(str(path).encode(), ctypes.byref(sr),
                             ctypes.byref(ch), ctypes.byref(fr))
    if rc != 0:
        raise ValueError(f"cannot parse WAV {path} (rc={rc})")
    return sr.value, ch.value, fr.value


def wav_read(path: str | os.PathLike, start_frame: int = 0,
             n_frames: int | None = None, downmix: bool = True) -> np.ndarray:
    """Decode a frame window to mono float32 (C decode loop)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    if n_frames is None:
        _, _, total = wav_info(path)
        n_frames = total - start_frame
    out = np.empty(max(0, n_frames), np.float32)
    got = lib.wav_native_read(str(path).encode(), start_frame, n_frames,
                              int(downmix), _fptr(out))
    if got < 0:
        raise ValueError(f"cannot decode WAV {path} (rc={got})")
    return out[:got]


def resample_poly(x: np.ndarray, sr_in: int, sr_out: int) -> np.ndarray:
    """Polyphase resample matching scipy.signal.resample_poly(x, up, down)."""
    lib = _try_load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    from math import gcd

    g = gcd(sr_in, sr_out)
    up, down = sr_out // g, sr_in // g
    x = np.ascontiguousarray(x, np.float32)
    if up == down:
        return x
    n_out = -(-len(x) * up // down)
    out = np.empty(n_out, np.float32)
    got = lib.resample_poly_native(_fptr(x), len(x), up, down, _fptr(out))
    return out[:got]


# --- Multi-format codec library (libaudio_codec.so, optional) --------------
#
# Decode/encode mp3/flac/ogg/m4a via FFmpeg's libav* (the reference reaches
# these formats through soundfile/audioread, data/dataset.py
# SUPPORTED_AUDIO_EXTS; this environment ships libavformat instead of
# libsndfile). Built by the same `make -C native` when the libav dev
# packages exist; everything degrades to WAV-only when absent.

_CODEC_PATH = Path(os.environ.get(
    "BIRDNET_TPU_NATIVE_CODEC_LIB",
    _REPO_ROOT / "native" / "build" / "libaudio_codec.so"))
_codec = None
_codec_failed = False


def _try_load_codec():
    global _codec, _codec_failed
    if _codec is not None or _codec_failed:
        return _codec
    if os.environ.get("BIRDNET_TPU_NO_NATIVE"):
        _codec_failed = True
        return None
    with _load_lock:
        if _codec is not None or _codec_failed:
            return _codec
        try:
            if not _CODEC_PATH.exists():
                _build_locked(_CODEC_PATH)  # builds the codec when libav is present
            lib = ctypes.CDLL(str(_CODEC_PATH))
        except Exception:
            _codec_failed = True
            return None
        lib.codec_audio_info.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_long)]
        lib.codec_audio_info.restype = ctypes.c_int
        lib.codec_decode_f32.argtypes = [
            ctypes.c_char_p, ctypes.c_long, ctypes.c_long,
            ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.POINTER(ctypes.c_int)]
        lib.codec_decode_f32.restype = ctypes.c_long
        lib.codec_encode_f32.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_long,
            ctypes.c_int]
        lib.codec_encode_f32.restype = ctypes.c_int
        _codec = lib
        return _codec


def codec_available() -> bool:
    """True when the libav-backed multi-format codec loaded on this host."""
    return _try_load_codec() is not None


def codec_info(path: str | os.PathLike) -> tuple[int, int, int]:
    """(sample_rate, channels, approx_frames) of any supported audio file."""
    lib = _try_load_codec()
    if lib is None:
        raise RuntimeError("codec library unavailable")
    sr, ch, fr = ctypes.c_int(), ctypes.c_int(), ctypes.c_long()
    rc = lib.codec_audio_info(str(path).encode(), ctypes.byref(sr),
                              ctypes.byref(ch), ctypes.byref(fr))
    if rc != 0:
        raise ValueError(f"cannot probe audio file: {path}")
    return sr.value, ch.value, fr.value


def codec_decode(path: str | os.PathLike, offset_frames: int = 0,
                 max_frames: int = 0) -> tuple[np.ndarray, int]:
    """Decode to (mono float32 at native rate, sample_rate).

    Channel MEAN downmix (reference io.py `y.mean(axis=1)` semantics);
    max_frames <= 0 decodes to EOF.
    """
    lib = _try_load_codec()
    if lib is None:
        raise RuntimeError("codec library unavailable")
    if max_frames and max_frames > 0:
        # Hot path (per-window reads): the cap is the caller's request —
        # skip the container probe codec_info would pay (the decoder call
        # below opens the file itself).
        cap = int(max_frames)
    else:
        _sr, _ch, fr = codec_info(path)
        cap = max(fr, _sr) + _sr
    sro = ctypes.c_int()
    while True:
        out = np.empty(cap + 4096, np.float32)
        n = lib.codec_decode_f32(str(path).encode(), int(offset_frames),
                                 int(max_frames), _fptr(out), len(out),
                                 ctypes.byref(sro))
        if n < 0:
            raise ValueError(f"decode failed for {path}")
        # Container duration estimates (codec_audio_info) can undercount —
        # e.g. VBR mp3 without a Xing header. A decode that fills the buffer
        # exactly may be truncated: retry with doubled capacity until the
        # decoder stops short of it (full-file mode only; with max_frames
        # the caller asked for exactly that many).
        if n < len(out) or (max_frames and max_frames > 0):
            return out[:n].copy(), sro.value
        cap *= 2


def codec_encode(path: str | os.PathLike, data: np.ndarray, sample_rate: int) -> None:
    """Encode mono float32 to .flac/.ogg/.mp3/.m4a/.wav by extension."""
    lib = _try_load_codec()
    if lib is None:
        raise RuntimeError("codec library unavailable")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    x = np.ascontiguousarray(data, np.float32)
    rc = lib.codec_encode_f32(str(path).encode(), _fptr(x), len(x), int(sample_rate))
    if rc != 0:
        raise ValueError(f"encode failed for {path} (rc={rc})")
