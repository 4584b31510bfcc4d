"""Fused waveform -> scores classification for serving and evaluation.

One XLA dispatch per batch when the runner is device-side: the frontend
(STFT/mel matmuls) and the model (Flax forward or INT8 integer graph)
compile into a single program. On tunneled backends every blocking host
transfer costs ~28 ms, so collapsing the two stages roughly halves serving
latency; on any backend it removes an HBM round-trip of the feature tensor.
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.ops.frontend import inputs_for_config


def quantize_waveform_int16(wave: np.ndarray) -> np.ndarray:
    """[-1, 1] float waveforms -> [B, T+1] int16 codes + scale column for
    half-bandwidth shipping (make_fused_classifier(input_dtype='int16')
    dequantizes on device by dividing codes by |scale|).

    At the device's measured 61.2k INT8 / 116.1k bf16 chunks/s (round-4
    BENCH_r04.json), float32
    3-s/22.05 kHz waveforms are a 16-30 GB/s host->device stream — int16 halves that on
    any link (measured 1.8x end-to-end on the tunneled chip). This
    REQUANTIZING path costs one PCM16 LSB (~3e-5) of waveform error — the
    fallback for floats that aren't raw PCM16 codes (resampled, downmixed,
    codec-decoded). PCM16 sources at the model rate take the exact path
    instead (audio/io.load_chunks_int16 ships the decoder's raw codes with
    the window peak in the scale column; bit-exact vs the float32 path).
    """
    codes = np.clip(np.round(wave * 32767.0), -32768, 32767).astype(np.int16)
    scale = np.full((codes.shape[0], 1), 32767, np.int16)
    return np.concatenate([codes, scale], axis=1)


def _two_prod_f32(x, y):
    """Exact f32 product x*y = (hi, lo) via Dekker splitting (no FMA).

    Valid when the exact product fits in 48 significand bits — true for
    the dequant residuals here (24-bit quotient x 16-bit integer scale).
    """
    split = jnp.float32(4097.0)  # 2**12 + 1
    cx = split * x
    x_hi = cx - (cx - x)
    x_lo = x - x_hi
    cy = split * y
    y_hi = cy - (cy - y)
    y_lo = y - y_hi
    hi = x * y
    lo = ((x_hi * y_hi - hi) + x_hi * y_lo + x_lo * y_hi) + x_lo * y_lo
    return hi, lo


def _div_exact_int(c, b, q0=None):
    """Correctly-rounded f32 division c/b for integer-valued operands.

    TPU f32 division is reciprocal-based and off by 1 ulp on ~all
    operands (measured), so a plain `c / b` cannot reproduce the host's
    IEEE-754 numpy division bit-for-bit. For |c| <= 32768 and
    1 <= b <= 32768 (both integers), the residual c - q*b of a candidate
    quotient q is computable EXACTLY in f32 (Dekker 2Prod, then Sterbenz
    subtraction — every term lands on a shared 17-bit grid), and the
    correctly-rounded quotient is the unique candidate minimizing |c - q*b|
    (ties are impossible: a ratio of 16-bit integers is either exactly
    representable or has an infinite binary expansion, never a 25-bit
    midpoint). Five candidates cover a 2-ulp-wrong fast division.

    Pure elementwise VPU ops (~60 flops/element): ~0.26 TFLOPS at the
    100k-chunks/s serving rate, invisible next to the frontend matmuls.

    q0 overrides the fast-division starting point (tests perturb it to
    prove the candidate search recovers from a backend whose division is
    up to 2 ulp off).
    """
    if q0 is None:
        q0 = c / b
    inf = jnp.float32(jnp.inf)

    def err(q):
        hi, lo = _two_prod_f32(q, b)
        return jnp.abs((c - hi) - lo)

    best_q, best_e = q0, err(q0)
    up1 = jnp.nextafter(q0, inf)
    dn1 = jnp.nextafter(q0, -inf)
    for q in (up1, dn1, jnp.nextafter(up1, inf), jnp.nextafter(dn1, -inf)):
        e = err(q)
        take = e < best_e
        best_q = jnp.where(take, q, best_q)
        best_e = jnp.where(take, e, best_e)
    return best_q


def _dequantize_int16(w):
    """[B, T+1] int16 codes + scale column -> [B, T] float32 waveforms.

    scale = |last column| (−32768 encodes a peak of 32768); rows from
    load_chunks_int16 carry their window's peak code (bit-exact
    reconstruction of the host's peak-normalized floats), rows from
    quantize_waveform_int16 carry 32767 (the requantizing fallback).
    """
    codes = w[:, :-1].astype(jnp.float32)
    scale = jnp.maximum(jnp.abs(w[:, -1:].astype(jnp.float32)), 1.0)
    return _div_exact_int(codes, scale)


def _dequantize_ulaw(q):
    """[B, T] int8 mu-law codes -> [B, T] float32 waveforms (inverse of
    data/worker.ulaw_encode: mu = 255 companding on a symmetric 8-bit
    grid). Quarter of the float32 host->device bytes; ~2.2% relative
    waveform error at every amplitude (log companding). Used by the
    training feed (make_train_batcher(input_dtype='ulaw'), fidelity
    gated by ACCURACY.json's float32_ulaw_feed row) and by the serving
    ingress (make_fused_classifier(input_dtype='ulaw') — NOT bit-exact,
    measured score cosine in docs/performance.md; the INT8 bit-exact
    headline requires the int16 or float path)."""
    f = q.astype(jnp.float32) / 127.0
    return jnp.sign(f) * jnp.expm1(jnp.abs(f) * jnp.float32(np.log1p(255.0))) / 255.0


def quantize_waveform_ulaw(wave: np.ndarray) -> np.ndarray:
    """[-1, 1] float waveforms [B, T] -> [B, T] int8 mu-law codes for
    quarter-bandwidth shipping (host twin of the device's
    _dequantize_ulaw; the same companding encode the training feed uses,
    data/worker.ulaw_encode)."""
    from birdnet_stm32_tpu.data.worker import ulaw_encode

    return ulaw_encode(np.asarray(wave, np.float32))


def make_fused_classifier(runner, cfg, input_sample_rate: int | None = None,
                          as_numpy: bool = True,
                          stft_precision: str | None = None,
                          pallas_mode: str = "off",
                          input_dtype: str | None = None):
    """waveform batch [B, T] -> scores [B, C], fused when possible.

    Falls back to frontend-then-predict for non-jittable runners (the
    TFLite interpreter).

    Args:
        runner: FlaxRunner / TFLiteSimRunner / interpreter runner.
        cfg: ModelConfig (audio + model geometry).
        input_sample_rate: When set and != cfg.sample_rate, batches arrive
            at this rate ([B, chunk_duration * input_sample_rate]) and are
            polyphase-resampled ON DEVICE inside the same dispatch
            (ops/resample.py) — hosts then feed native-rate PCM and skip
            the ~30-40% resampling share of their decode cost.
        as_numpy: True (default) blocks and returns np.ndarray. False
            returns the jax.Array future immediately (JAX async dispatch) —
            the pipelined serving driver enqueues many batches and drains
            later, overlapping host decode with device compute.
        stft_precision: Frontend DFT matmul precision ('highest' | 'high'
            | 'default', ops/stft.py). None picks 'high' for bf16 float
            runners (serving-grade, ~1e-6 relative error, ~half the
            frontend MXU work) and 'highest' otherwise (librosa parity —
            and the INT8 executor's bit-exactness depends on it).
        pallas_mode: 'off' (default) uses the XLA frontend composition.
            'auto' computes the frontend with the fused VMEM-resident
            Pallas kernel (ops/pallas/frontend_kernel.py) when Mosaic
            compiles on this backend — for the INT8 executor the kernel
            also fuses the entry int8-quantize + transpose and feeds the
            integer graph directly (prequantized_input). The default is
            OFF from a real-hardware measurement (round 4, v5e): the
            compiled kernel matches XLA to 5e-7 but runs the frontend
            30% SLOWER (84.8k vs 110.2k chunks/s — XLA already fuses this
            chain well) and its summation order flips occasional INT8
            entry codes, breaking the bit-exact-vs-TFLite guarantee
            (min cosine 0.99701 e2e). 'interpret' runs the kernel in
            interpreter mode (validation/tests only — slow).
        input_dtype: 'int16' accepts [B, T+1] int16 codes + scale column
            (audio/io.load_chunks_int16 raw PCM codes — bit-exact vs the
            float path — or quantize_waveform_int16 requantized floats)
            and dequantizes on device inside the same dispatch with
            correctly-rounded division — halves the host->device waveform
            stream (13.7 GB/s of float32 at the device's measured rate).
            'ulaw' accepts [B, T] int8 mu-law codes
            (quantize_waveform_ulaw) — QUARTER of the float32 stream at
            ~2.2% relative waveform error; NOT bit-exact (measured score
            cosine in docs/performance.md) — for link-bound hosts where
            the int16 stream still binds. None = float32 waveforms [B, T].
    """
    if stft_precision is None:
        stft_precision = ("high" if getattr(runner, "dtype", None) is not None
                          else "highest")
    if pallas_mode not in ("auto", "off", "interpret"):
        raise ValueError(f"Invalid pallas_mode: {pallas_mode!r}")
    if input_dtype not in (None, "float32", "int16", "ulaw"):
        raise ValueError(f"Invalid input_dtype: {input_dtype!r}")
    _dequant = {"int16": _dequantize_int16,
                "ulaw": _dequantize_ulaw}.get(input_dtype)

    from birdnet_stm32_tpu.ops.pallas.frontend_kernel import (
        frontend_input,
        pallas_available,
    )

    # The fused kernel computes at HIGHEST precision only; bf16 serving
    # (stft_precision='high') keeps the XLA frontend.
    _interp = pallas_mode == "interpret"
    use_kernel = (pallas_mode != "off" and stft_precision == "highest"
                  and cfg.audio_frontend != "raw"
                  and (_interp or pallas_available()))

    if input_sample_rate is not None and input_sample_rate != cfg.sample_rate:
        from birdnet_stm32_tpu.ops.resample import resample_chunk_batch

        def _wave(wave):
            if _dequant is not None:
                wave = _dequant(wave)
            return resample_chunk_batch(wave, input_sample_rate, cfg)
    else:
        def _wave(wave):
            if _dequant is not None:
                wave = _dequant(wave)
            return wave

    # bf16 float runners consume bf16 features: request them from the
    # frontend (bf16-I/O STFT, ops/stft.py — halves the frontend's
    # intermediate HBM traffic, the measured bottleneck; 98.5k -> 115k
    # chunks/s on the flagship at B=2048) instead of casting f32 features
    # after the fact. mfcc keeps the f32 pipeline internally either way.
    _feat_dtype = (getattr(runner, "dtype", None)
                   if stft_precision != "highest" else None)

    def _inputs(wave, cfg=cfg):
        w = _wave(wave)
        if use_kernel:
            # Falls back to the XLA composition internally when the
            # geometry violates the kernel's 2*hop >= n_fft precondition.
            return frontend_input(w, cfg, interpret=_interp)
        return inputs_for_config(w, cfg, stft_precision=stft_precision,
                                 feature_dtype=_feat_dtype)

    _out = np.asarray if as_numpy else (lambda a: a)
    mesh = getattr(runner, "mesh", None)
    shardings = {}
    if mesh is not None:
        from birdnet_stm32_tpu.parallel.mesh import batch_sharding, replicated

        shardings = {"data": batch_sharding(mesh), "rep": replicated(mesh)}

    if hasattr(runner, "graph"):  # TFLiteSimRunner: fuse executor + frontend
        from birdnet_stm32_tpu.ops.pallas.frontend_kernel import _kernel_geometry_ok
        from birdnet_stm32_tpu.quant.tflite_import import (
            build_executor,
            entry_quant_params,
            entry_transpose_perm,
        )

        # Deepest fusion: the kernel quantizes straight into the executor's
        # int8 entry tensor (entry QUANTIZE + TRANSPOSE fold into the
        # epilogue), when the graph starts with that pattern and the kernel
        # handles this frontend/geometry.
        entry_q = None
        if (use_kernel and _kernel_geometry_ok(cfg, cfg.chunk_samples)
                and entry_transpose_perm(runner.graph) is not None
                and cfg.audio_frontend in ("hybrid", "librosa", "mfcc", "log_mel")
                # pcen's scan doesn't lower in Mosaic (frontend_input's
                # pcen_blocked guard): in-kernel quantization has no XLA
                # fallback, so the fused-entry gate must exclude it too.
                and not (cfg.audio_frontend == "librosa"
                         and cfg.mag_scale == "pcen" and not _interp)):
            entry_q = entry_quant_params(runner.graph)

        fns = {}

        def classify(wave: np.ndarray) -> np.ndarray:
            b = wave.shape[0]
            if b not in fns:
                requant = getattr(runner, "_requant", "exact")
                if entry_q is not None:
                    fwd = build_executor(runner.graph, batch_size=b,
                                         requant=requant, prequantized_input=True)
                    fn = lambda w: fwd(frontend_input(  # noqa: E731
                        _wave(w), cfg, quant=entry_q, interpret=_interp))
                else:
                    fwd = build_executor(runner.graph, batch_size=b, requant=requant)
                    fn = lambda w: fwd(_inputs(w, cfg))  # noqa: E731
                if mesh is not None:
                    fns[b] = jax.jit(fn, in_shardings=shardings["data"],
                                     out_shardings=shardings["data"])
                else:
                    fns[b] = jax.jit(fn)
            return _out(fns[b](jnp.asarray(wave)))

        return classify

    if hasattr(runner, "model"):  # FlaxRunner
        dtype = getattr(runner, "dtype", None)
        if dtype is not None:  # bf16 serving: cast features in, f32 out
            fn = lambda v, w: runner.model.apply(  # noqa: E731
                v, _inputs(w, cfg).astype(dtype), train=False).astype(jnp.float32)
        else:
            fn = lambda v, w: runner.model.apply(  # noqa: E731
                v, _inputs(w, cfg), train=False)
        if mesh is not None:
            fused = jax.jit(fn, in_shardings=(shardings["rep"], shardings["data"]),
                            out_shardings=shardings["data"])
            v_rep = jax.device_put(runner.variables, shardings["rep"])

            def classify(wave: np.ndarray) -> np.ndarray:
                return _out(fused(v_rep, jnp.asarray(wave)))
        else:
            fused = jax.jit(fn)

            def classify(wave: np.ndarray) -> np.ndarray:
                return _out(fused(runner.variables, jnp.asarray(wave)))

        return classify

    if not as_numpy:
        print("[warn] runner has no device-side graph (TFLite interpreter): "
              "async dispatch unavailable, classify calls block — pipelined "
              "serving degrades to serial for this artifact")
    frontend = jax.jit(lambda w: _inputs(w, cfg))

    def classify(wave: np.ndarray) -> np.ndarray:
        return np.asarray(runner.predict(np.asarray(frontend(jnp.asarray(wave)))))

    return classify


def make_embedder(runner, cfg, stft_precision: str | None = None):
    """waveform batch [B, T] -> embeddings [B, emb] (FlaxRunner only).

    The DS-CNN's pooled pre-head vector (reference `return_embeddings`
    path) — the representation linear probing and downstream classifiers
    build on. INT8/interpreter artifacts don't expose it (the reference's
    TFLite export drops it too); callers should check for FlaxRunner.
    """
    if not hasattr(runner, "model"):
        raise TypeError("embeddings need a float (Flax) runner; "
                        ".tflite artifacts expose only class scores")
    if stft_precision is None:
        stft_precision = ("high" if getattr(runner, "dtype", None) is not None
                          else "highest")
    dtype = getattr(runner, "dtype", None)

    def fn(v, w):
        x = inputs_for_config(w, cfg, stft_precision=stft_precision,
                              feature_dtype=(dtype if stft_precision != "highest"
                                             else None))
        if dtype is not None:
            x = x.astype(dtype)  # no-op when the frontend already emitted bf16
        _, emb = runner.model.apply(v, x, train=False, return_embeddings=True)
        return emb.astype(jnp.float32)

    mesh = getattr(runner, "mesh", None)
    if mesh is not None:  # same batch/replica shardings as the classifier
        from birdnet_stm32_tpu.parallel.mesh import batch_sharding, replicated

        rep, data = replicated(mesh), batch_sharding(mesh)
        fused = jax.jit(fn, in_shardings=(rep, data), out_shardings=data)
        v_in = jax.device_put(runner.variables, rep)
    else:
        fused = jax.jit(fn)
        v_in = runner.variables

    def embed(wave: np.ndarray) -> np.ndarray:
        return np.asarray(fused(v_in, jnp.asarray(wave)))

    return embed


def decode_for_classify(path, cfg, overlap: float = 0.0, max_duration=None,
                        device_resample: bool = False,
                        cache_dir: str | None = None,
                        int16_io: bool = False,
                        ulaw_io: bool = False):
    """One probe + one decode for the serving drivers (cli/benchmark.py,
    cli/serve.py): (chunks [N, T], src_rate, audio_seconds, read_ms).

    The native-rate probe, audio-duration read, and fallback policy live
    here so the two drivers can't drift — and duration comes from the same
    header probe, not a second file open on the coordination thread.
    Thread-safe (no shared state): pipelined/threaded decode runs it on
    worker threads. cache_dir routes decode through the decoded-waveform
    cache (audio/io.cached_waveform): pre-staged bulk serving decodes each
    file once, later passes read memmap slices.

    int16_io=True returns [N, T+1] int16 codes + scale column instead:
    mono PCM16 WAVs already at the decode rate ship their RAW sample codes
    (bit-exact vs the float path after the device dequant); everything
    else decodes to float and requantizes (quantize_waveform_int16, one
    PCM16 LSB of error). ulaw_io=True returns [N, T] int8 mu-law codes
    (quarter-bandwidth, companded — NOT bit-exact; pair with
    make_fused_classifier(input_dtype='ulaw')).
    """
    if int16_io and ulaw_io:
        raise ValueError("int16_io and ulaw_io are mutually exclusive")
    from birdnet_stm32_tpu.audio.io import audio_info
    from birdnet_stm32_tpu.evaluation.metrics import chunks_for_file

    t0 = time.perf_counter()
    src_rate = cfg.sample_rate
    duration = 0.0
    try:
        info = audio_info(path)
        if info.sample_rate > 0:
            duration = info.frames / float(info.sample_rate)
            if device_resample:
                src_rate = int(info.sample_rate)
    except Exception:
        pass  # unparseable header: decode below yields 0 chunks
    if int16_io:
        chunks = chunks_for_classify_int16(str(path), cfg, overlap,
                                           max_duration=max_duration,
                                           sample_rate=src_rate,
                                           cache_dir=cache_dir)
    else:
        chunks = chunks_for_file(str(path), cfg, overlap,
                                 max_duration=max_duration,
                                 sample_rate=src_rate, cache_dir=cache_dir)
        if ulaw_io:
            chunks = quantize_waveform_ulaw(chunks)
    if duration <= 0.0 and len(chunks):
        # No header duration (e.g. stream estimate failed): approximate
        # from the chunk count (overlapped chunks double-count time).
        duration = len(chunks) * (cfg.chunk_duration - overlap) + overlap
    return chunks, src_rate, duration, (time.perf_counter() - t0) * 1000.0


def chunks_for_classify_int16(path, cfg, overlap: float = 0.0,
                              max_duration=None, sample_rate=None,
                              cache_dir: str | None = None) -> np.ndarray:
    """[N, T+1] int16 chunks + scale column for one file.

    Mono PCM16 WAVs at the decode rate ship their RAW codes (window peak
    in the scale column — bit-exact after the device dequant); everything
    else (resampled, multi-channel, codec formats, cached float decodes)
    falls back to float decode + quantize_waveform_int16 (scale 32767,
    one PCM16 LSB of error). Shared by decode_for_classify and
    evaluation.metrics.evaluate(int16_io=True).
    """
    from birdnet_stm32_tpu.audio.io import load_chunks_int16
    from birdnet_stm32_tpu.evaluation.metrics import chunks_for_file

    rate = sample_rate or cfg.sample_rate
    chunks = load_chunks_int16(path, sample_rate=rate,
                               chunk_duration=cfg.chunk_duration,
                               chunk_overlap=overlap,
                               max_duration=max_duration)
    if chunks is None:
        chunks = quantize_waveform_int16(
            chunks_for_file(path, cfg, overlap, max_duration=max_duration,
                            sample_rate=rate, cache_dir=cache_dir))
    return chunks


def classify_in_batches(classify, chunks: np.ndarray, batch_size: int):
    """Run [N, T] chunks through a fixed-batch classifier, padding the tail.

    One compiled shape serves every file regardless of its chunk count
    (the serial drivers in cli/benchmark.py and cli/serve.py share this).

    Returns:
        ([N, C] scores, device seconds spent in classify calls).
    """
    scores, dt = [], 0.0
    for i in range(0, len(chunks), batch_size):
        wave = chunks[i : i + batch_size]
        n = wave.shape[0]
        if n < batch_size:
            wave = np.pad(wave, ((0, batch_size - n), (0, 0)))
        t0 = time.perf_counter()
        scores.append(np.asarray(classify(wave))[:n])
        dt += time.perf_counter() - t0
    return np.concatenate(scores), dt


def top_predictions(pooled: np.ndarray, top_k: int,
                    score_threshold) -> list[int]:
    """Top-k class indices; ranks past the first must clear score_threshold
    (the firmware's APP_SCORE_THRESHOLD display rule, main.c:109-134:
    the top-1 prediction is always shown).

    score_threshold may be a scalar (the firmware's flat rule) or a
    per-class [C] vector — the operating point `evaluate
    --optimize_thresholds` writes (`serve --thresholds`)."""
    thr = np.broadcast_to(np.asarray(score_threshold, np.float32),
                          pooled.shape)
    top = np.argsort(pooled)[::-1][:top_k]
    return [int(i) for rank, i in enumerate(top)
            if rank == 0 or pooled[i] >= thr[i]]


def make_classifier_cache(runner, cfg, as_numpy: bool = True, verbose: bool = False,
                          input_dtype: str | None = None):
    """classifier_for(rate) -> fused classifier, compiled once per distinct
    source sample rate (shared by the serve and benchmark drivers; rates
    equal to cfg.sample_rate skip the on-device resampler)."""
    cache: dict[int, object] = {}

    def classifier_for(rate: int):
        if rate not in cache:
            if verbose and rate != cfg.sample_rate:
                print(f"[info] compiling device-resample classifier for {rate} Hz input")
            cache[rate] = make_fused_classifier(
                runner, cfg, as_numpy=as_numpy,
                input_sample_rate=rate if rate != cfg.sample_rate else None,
                input_dtype=input_dtype)
        return cache[rate]

    return classifier_for
