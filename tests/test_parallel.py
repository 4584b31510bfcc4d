"""Data-parallel sharding tests on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.parallel.mesh import make_mesh, pad_to_multiple, replicated, shard_batch
from birdnet_stm32_tpu.parallel.steps import TrainState, make_eval_step, make_train_step
from birdnet_stm32_tpu.training.losses import make_loss_fn


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig(
        sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
        chunk_duration=1.0, embeddings_size=32, num_classes=4,
        audio_frontend="hybrid", mag_scale="pwl", frontend_trainable=True,
    )
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(0))
    tx = optax.adam(1e-3)
    loss_fn = make_loss_fn(multilabel=True)

    rng = np.random.default_rng(0)
    B = 16
    x = rng.uniform(0, 1, (B, *cfg.input_shape())).astype(np.float32)
    y = np.eye(4, dtype=np.float32)[rng.integers(0, 4, B)]
    return cfg, model, variables, tx, loss_fn, x, y


def test_eight_devices_present():
    assert len(jax.devices()) == 8


def test_sharded_step_matches_single_device(setup):
    cfg, model, variables, tx, loss_fn, x, y = setup

    # Same global batch, same rng: the loss trajectory must agree between
    # single-device and 8-way sharded execution. (Updated params are NOT
    # compared elementwise: the grad all-reduce changes summation order, a
    # near-zero gradient can flip sign, and Adam's first step amplifies that
    # to +/-lr — expected floating-point nondeterminism, not a DP bug.)
    s1 = TrainState.create(variables, tx)
    step1 = make_train_step(model, tx, loss_fn, mesh=None, donate=False)

    mesh = make_mesh()
    s8 = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
    step8 = make_train_step(model, tx, loss_fn, mesh=mesh, donate=False)
    batch = shard_batch({"x": x, "y": y}, mesh)

    for i in range(3):
        s1, m1 = step1(s1, jnp.asarray(x), jnp.asarray(y), jax.random.key(7))
        s8, m8 = step8(s8, batch["x"], batch["y"], jax.random.key(7))
        if i == 0:
            # Identical params: loss must agree tightly; grad_norm is
            # cancellation-dominated so only ~1% (a real DP bug — e.g.
            # missing loss scaling — would show an ~n_devices factor).
            np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-3)
            np.testing.assert_allclose(float(m1["grad_norm"]), float(m8["grad_norm"]), rtol=3e-2)
        else:
            # After one Adam step the +/-lr sign-flip divergence on
            # near-zero-grad params makes trajectories chaotic on this tiny
            # random model; only require both to stay finite and same-scale.
            assert np.isfinite(float(m1["loss"])) and np.isfinite(float(m8["loss"]))
            assert abs(float(m1["loss"]) - float(m8["loss"])) < 0.5


def test_nonneg_mixer_projection(setup):
    cfg, model, variables, tx, loss_fn, x, y = setup
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, loss_fn, mesh=None, donate=False)
    for i in range(3):
        state, _ = step(state, jnp.asarray(x), jnp.asarray(y), jax.random.key(i))
    assert float(jnp.min(state.params["audio_frontend"]["mel_mixer"])) >= 0.0


def test_frontend_freeze(setup):
    cfg, model, variables, tx, loss_fn, x, y = setup
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, loss_fn, mesh=None, frontend_trainable=False, donate=False)
    before = np.asarray(state.params["audio_frontend"]["mel_mixer"])
    state, _ = step(state, jnp.asarray(x), jnp.asarray(y), jax.random.key(0))
    after = np.asarray(state.params["audio_frontend"]["mel_mixer"])
    np.testing.assert_array_equal(before, after)
    # backbone did move
    assert not np.allclose(
        np.asarray(variables["params"]["stem_conv"]["kernel"]),
        np.asarray(state.params["stem_conv"]["kernel"]),
    )


def test_mixed_precision_step(setup):
    """bf16 compute: loss tracks the f32 step, masters stay float32."""
    cfg, model, variables, tx, loss_fn, x, y = setup

    s32 = TrainState.create(variables, tx)
    s16 = TrainState.create(variables, tx)
    step32 = make_train_step(model, tx, loss_fn, mesh=None, donate=False)
    step16 = make_train_step(model, tx, loss_fn, mesh=None, donate=False,
                             compute_dtype=jnp.bfloat16)

    for _ in range(3):
        s32, m32 = step32(s32, jnp.asarray(x), jnp.asarray(y), jax.random.key(3))
        s16, m16 = step16(s16, jnp.asarray(x), jnp.asarray(y), jax.random.key(3))

    # bf16 has ~3 decimal digits; losses should track to that precision.
    np.testing.assert_allclose(float(m16["loss"]), float(m32["loss"]),
                               rtol=0.05, atol=0.02)
    # Master params, BN stats, and optimizer state remain float32.
    for leaf in jax.tree_util.tree_leaves((s16.params, s16.batch_stats,
                                           s16.opt_state)):
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            assert leaf.dtype == jnp.float32
    assert np.isfinite(float(m16["loss"]))

    # Sharded variant compiles and runs too.
    mesh = make_mesh()
    s8 = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
    step8 = make_train_step(model, tx, loss_fn, mesh=mesh, donate=False,
                            compute_dtype=jnp.bfloat16)
    batch = shard_batch({"x": x, "y": y}, mesh)
    s8, m8 = step8(s8, batch["x"], batch["y"], jax.random.key(3))
    assert np.isfinite(float(m8["loss"]))


def test_eval_step_sharded(setup):
    cfg, model, variables, tx, loss_fn, x, y = setup
    mesh = make_mesh()
    state = jax.device_put(TrainState.create(variables, tx), replicated(mesh))
    ev = make_eval_step(model, loss_fn, mesh=mesh, activation="sigmoid")
    batch = shard_batch({"x": x, "y": y}, mesh)
    loss, scores = ev(state, batch["x"], batch["y"])
    assert np.isfinite(float(loss))
    assert scores.shape == (16, 4)
    s = np.asarray(scores)
    assert (s >= 0).all() and (s <= 1).all()


def test_pad_to_multiple():
    batch = {"x": np.ones((13, 3), np.float32)}
    padded, real = pad_to_multiple(batch, 8)
    assert real == 13
    assert padded["x"].shape == (16, 3)
    assert padded["x"][13:].sum() == 0


def test_sharded_runners_match_single_device(tmp_path):
    """Mesh-sharded FlaxRunner and INT8 TFLiteSimRunner produce the same
    scores as their single-device counterparts (8-device CPU mesh)."""
    import pytest

    tf = pytest.importorskip("tensorflow")  # noqa: F841 (export path needs TF)
    import jax

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.conversion.export_tflite import convert_to_tflite
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.models.runners import FlaxRunner, TFLiteSimRunner
    from birdnet_stm32_tpu.parallel.mesh import make_mesh

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=3,
                      class_names=["a", "b", "c"], audio_frontend="hybrid",
                      mag_scale="pwl", alpha=0.25)
    model = build_dscnn(cfg)
    variables = init_model(model, cfg, jax.random.key(0))
    mesh = make_mesh()
    x = np.random.default_rng(0).uniform(0, 1, (16, *cfg.input_shape())).astype(np.float32)

    plain = FlaxRunner(model, variables, cfg).predict(x)
    sharded = FlaxRunner(model, variables, cfg, mesh=mesh).predict(x)
    np.testing.assert_allclose(sharded, plain, atol=1e-5)

    calib = np.random.default_rng(1).uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32)
    tfl = tmp_path / "m.tflite"
    tfl.write_bytes(convert_to_tflite(variables, cfg, calib, quantize="int8"))
    plain_q = TFLiteSimRunner(tfl).predict(x)
    sharded_q = TFLiteSimRunner(tfl, mesh=mesh).predict(x)
    np.testing.assert_array_equal(sharded_q, plain_q)  # integer graph: bit-equal


def test_frontend_freeze_survives_adamw_decay():
    """frontend_trainable=False keeps frontend params bit-identical even
    under adamw's decoupled weight decay."""
    import jax
    import jax.numpy as jnp

    from birdnet_stm32_tpu.config import ModelConfig
    from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
    from birdnet_stm32_tpu.parallel.steps import TrainState, make_train_step
    from birdnet_stm32_tpu.training.losses import make_loss_fn
    from birdnet_stm32_tpu.training.optimizer import build_optimizer

    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=2,
                      class_names=["a", "b"], audio_frontend="hybrid",
                      mag_scale="pwl", alpha=0.25, frontend_trainable=False)
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg, jax.random.key(0))
    tx = build_optimizer("adamw", 1e-2, weight_decay=1e-2)
    state = TrainState.create(variables, tx)
    step = make_train_step(model, tx, make_loss_fn(), mesh=None,
                           frontend_trainable=False, donate=False)
    x = jnp.ones((4, *cfg.input_shape()))
    y = jnp.asarray(np.eye(2, dtype=np.float32)[[0, 1, 0, 1]])
    before = jax.device_get(state.params["audio_frontend"])
    for _ in range(3):
        state, _ = step(state, x, y, jax.random.key(1))
    after = jax.device_get(state.params["audio_frontend"])
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(before)[0],
        jax.tree_util.tree_flatten_with_path(after)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=str(pa))
    # Backbone did train.
    assert not np.array_equal(np.asarray(state.params["pred"]["kernel"]),
                              np.asarray(variables["params"]["pred"]["kernel"]))
