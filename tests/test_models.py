"""DS-CNN model family tests: shapes, scaling, frontends (tiny configs).

Structural assertions use jax.eval_shape (no compute); only a handful of
tests run real jitted forwards.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.blocks import make_divisible
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model, shape_init


def tiny_cfg(**kw):
    base = dict(
        sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
        chunk_duration=1.0, embeddings_size=32, num_classes=3,
        class_names=["a", "b", "c"], audio_frontend="librosa", mag_scale="none",
        alpha=0.25, depth_multiplier=1,
    )
    base.update(kw)
    return ModelConfig(**base)


def n_params(variables):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(variables["params"]))


def test_make_divisible():
    assert make_divisible(16) == 16
    assert make_divisible(1) == 8
    assert make_divisible(12) == 16
    assert make_divisible(100) == 104


@pytest.mark.parametrize("frontend", ["librosa", "hybrid", "raw", "mfcc", "log_mel"])
def test_shapes_per_frontend(frontend):
    cfg = tiny_cfg(audio_frontend=frontend)
    model = build_dscnn(cfg)
    shapes = shape_init(model, cfg, batch=2)
    out = jax.eval_shape(
        lambda v, x: model.apply(v, x, train=False),
        shapes, jax.ShapeDtypeStruct((2, *cfg.input_shape()), jnp.float32),
    )
    assert out.shape == (2, 3)


def test_channels_divisible_by_8():
    cfg = tiny_cfg(alpha=0.7)
    shapes = shape_init(build_dscnn(cfg), cfg)
    for path, leaf in jax.tree_util.tree_flatten_with_path(shapes["params"])[0]:
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "kernel" and len(leaf.shape) == 4:
            assert leaf.shape[-1] % 8 == 0, (path, leaf.shape)


def test_alpha_monotonic_params():
    sizes = []
    for alpha in (0.25, 0.5, 1.0):
        cfg = tiny_cfg(alpha=alpha)
        sizes.append(n_params(shape_init(build_dscnn(cfg), cfg)))
    assert sizes[0] < sizes[1] < sizes[2]


def test_depth_multiplier_adds_layers():
    c1, c2 = tiny_cfg(depth_multiplier=1), tiny_cfg(depth_multiplier=2)
    p1 = shape_init(build_dscnn(c1), c1)["params"]
    p2 = shape_init(build_dscnn(c2), c2)["params"]
    assert len(p2) > len(p1)


def test_raw_length_guard():
    with pytest.raises(ValueError, match="raw frontend"):
        build_dscnn(tiny_cfg(audio_frontend="raw", sample_rate=24000, chunk_duration=3.0))


def test_plain_ds_and_attention_pooling_structure():
    cfg = tiny_cfg(use_inverted_residual=False, use_se=True, use_attention_pooling=True)
    shapes = shape_init(build_dscnn(cfg), cfg)
    assert any("attn_pool" in k for k in shapes["params"])
    assert any("_se" in k for k in shapes["params"])
    assert any("_ds1_pw" in k for k in shapes["params"])


def test_inverted_residual_structure():
    cfg = tiny_cfg(use_inverted_residual=True, use_se=True)
    shapes = shape_init(build_dscnn(cfg), cfg)
    assert any("_ir1_expand" in k for k in shapes["params"])
    assert any("_ir1_project" in k for k in shapes["params"])


def test_forward_softmax_and_embeddings():
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="softmax")
    variables = init_model(model, cfg)
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False, return_embeddings=True))
    y, emb = fwd(variables, jnp.ones((2, *cfg.input_shape())))
    np.testing.assert_allclose(np.asarray(y).sum(axis=1), 1.0, rtol=1e-5)
    assert emb.shape == (2, make_divisible(cfg.embeddings_size, 8))
    assert bool(jnp.all(jnp.isfinite(y)))


def test_train_mode_runs_with_dropout_rng():
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    variables = init_model(model, cfg)
    fwd = jax.jit(
        lambda v, x, k: model.apply(v, x, train=True, rngs={"dropout": k}, mutable=["batch_stats"])
    )
    y, updates = fwd(variables, jnp.ones((4, *cfg.input_shape())), jax.random.key(1))
    assert y.shape == (4, 3)
    assert "batch_stats" in updates


def test_learnable_mel_scale():
    """Hybrid with learn_mel_scale: breakpoint logits replace the mel mixer,
    gradients flow, and zero logits give a valid column-normalized triangle
    basis (reference frontend.py:188-255)."""
    cfg = tiny_cfg(audio_frontend="hybrid", mag_scale="none")
    model = build_dscnn(cfg, class_activation="none", learn_mel_scale=True)
    variables = init_model(model, cfg)
    fe = variables["params"]["audio_frontend"]
    assert "mel_seg_logits" in fe and "mel_mixer" not in fe
    assert fe["mel_seg_logits"].shape == (cfg.num_mels + 1,)

    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, *cfg.input_shape())).astype(np.float32))
    y = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    assert y.shape == (2, cfg.num_classes)
    assert bool(jnp.all(jnp.isfinite(y)))

    def loss(params):
        return model.apply({"params": params, "batch_stats": variables["batch_stats"]},
                           x, train=False).sum()

    g = jax.grad(loss)(variables["params"])
    assert float(jnp.abs(g["audio_frontend"]["mel_seg_logits"]).sum()) > 0

    # The zero-logit triangle basis itself: columns sum to 1.
    fe_mod = model.bind(variables).audio_frontend  # noqa: F841 (bind smoke)
    from birdnet_stm32_tpu.models.frontend_layer import AudioFrontend

    af = AudioFrontend(mode="hybrid", mel_bins=cfg.num_mels, spec_width=cfg.spec_width,
                       sample_rate=cfg.sample_rate, fft_length=cfg.fft_length,
                       learn_mel_scale=True)
    tri = af._tri_matrix(jnp.zeros((cfg.num_mels + 1,)))
    assert tri.shape == (cfg.fft_bins, cfg.num_mels)
    np.testing.assert_allclose(np.asarray(tri.sum(axis=0)), 1.0, atol=1e-3)


def test_bf16_runner_matches_f32():
    """bf16 serving (FlaxRunner dtype + fused classifier) tracks float32
    closely and returns float32 scores."""
    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import make_fused_classifier

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32,
                      fft_length=128, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, audio_frontend="hybrid", mag_scale="pwl",
                      alpha=0.25)
    model = build_dscnn(cfg)
    variables = init_model(model, cfg, jax.random.key(0))
    r32 = FlaxRunner(model, variables, cfg)
    r16 = FlaxRunner(model, variables, cfg, dtype=jnp.bfloat16)

    x = np.random.default_rng(0).uniform(0, 1, (4, *cfg.input_shape())).astype(np.float32)
    s32, s16 = r32.predict(x), r16.predict(x)
    assert s16.dtype == np.float32
    np.testing.assert_allclose(s16, s32, atol=0.02)

    wave = np.random.default_rng(1).normal(size=(4, cfg.chunk_samples)).astype(np.float32)
    c32 = make_fused_classifier(r32, cfg)(wave)
    c16 = make_fused_classifier(r16, cfg)(wave)
    np.testing.assert_allclose(np.asarray(c16), np.asarray(c32), atol=0.02)
    # bf16 params really are bf16 (the speed comes from the cast).
    assert r16.variables["params"]["pred"]["kernel"].dtype == jnp.bfloat16


def test_tri_mel_matrix_golden():
    """Golden test vs a pure-numpy twin of the reference's learnable
    triangle construction (frontend.py:188-245): softplus segment widths
    over the [hz_to_mel(150), hz_to_mel(sr//2)] range, cumsum breakpoints,
    triangles at the FFT bins' mel positions, column normalization."""
    import jax
    import numpy as np

    from birdnet_stm32_tpu.models.frontend_layer import tri_mel_matrix

    def hz_to_mel_slaney(f):
        f = np.asarray(f, np.float64)
        f_sp = 200.0 / 3
        mels = f / f_sp
        min_log_hz = 1000.0
        logstep = np.log(6.4) / 27.0
        log_t = f >= min_log_hz
        return np.where(log_t, min_log_hz / f_sp + np.log(np.maximum(f, 1e-12) / min_log_hz) / logstep, mels)

    def numpy_twin(logits, sr, n_fft, M):
        eps = 1e-6
        F = n_fft // 2 + 1
        bins_mel = hz_to_mel_slaney(np.linspace(0.0, sr / 2.0, F))
        fmin = float(hz_to_mel_slaney(150.0))
        fmax = float(hz_to_mel_slaney(float(sr // 2)))
        seg = np.log1p(np.exp(logits)) + 1e-3  # softplus
        seg = seg / (seg.sum() + eps) * (fmax - fmin)
        p = fmin + np.concatenate([[0.0], np.cumsum(seg)])
        left, center, right = p[:M], p[1 : M + 1], p[2 : M + 2]
        up = (bins_mel[:, None] - left[None, :]) / np.maximum(center - left, eps)
        dn = (right[None, :] - bins_mel[:, None]) / np.maximum(right - center, eps)
        tri = np.maximum(np.minimum(up, dn), 0.0)
        return tri / (tri.sum(axis=0, keepdims=True) + eps)

    rng = np.random.default_rng(0)
    for sr, n_fft, M in [(22050, 512, 64), (8000, 128, 16)]:
        for logits in (np.zeros(M + 1, np.float32),
                       rng.normal(0, 0.5, M + 1).astype(np.float32)):
            ours = np.asarray(tri_mel_matrix(jax.numpy.asarray(logits), sr, n_fft, M))
            ref = numpy_twin(logits.astype(np.float64), sr, n_fft, M)
            np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_int16_io_serving_parity(rng):
    """make_fused_classifier(input_dtype='int16') consumes
    quantize_waveform_int16 codes and matches float32 serving within the
    one-LSB waveform quantization error."""
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner
    from birdnet_stm32_tpu.models.serving import (
        make_fused_classifier,
        quantize_waveform_int16,
    )

    cfg = ModelConfig(sample_rate=8000, num_mels=32, spec_width=32,
                      fft_length=256, chunk_duration=1.0, embeddings_size=32,
                      num_classes=4, class_names=list("abcd"), alpha=0.25,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="softmax")
    v = init_model(model, cfg, jax.random.key(0))
    runner = FlaxRunner(model, v, cfg)

    wave = rng.normal(0, 0.4, (4, cfg.chunk_samples)).astype(np.float32)
    wave = wave / (np.abs(wave).max() + 1e-6)  # [-1, 1] like the decode path
    f32 = make_fused_classifier(runner, cfg)(wave)
    q = quantize_waveform_int16(wave)
    assert q.dtype == np.int16
    i16 = make_fused_classifier(runner, cfg, input_dtype="int16")(q)
    np.testing.assert_allclose(i16, f32, atol=2e-3)
    cos = np.sum(i16 * f32) / (np.linalg.norm(i16) * np.linalg.norm(f32))
    assert cos > 0.99999

    with pytest.raises(ValueError, match="input_dtype"):
        make_fused_classifier(runner, cfg, input_dtype="int8")
