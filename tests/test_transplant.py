"""Checkpoint transplant parity: shipped .keras -> Flax, vs a TF float golden.

Marked integration: needs TensorFlow and the reference checkpoints. The
golden reconstructs the stored functional graph with vanilla TF ops
(tests/tf_golden.py) and must agree with the transplanted JAX forward.
"""

import numpy as np
import pytest

pytestmark = pytest.mark.integration

KERAS_PATH = "/root/reference/checkpoints/birdnet_stm32n6_100.keras"
CONFIG_PATH = "/root/reference/checkpoints/birdnet_stm32n6_100_model_config.json"


@pytest.fixture(scope="module")
def loaded():
    pytest.importorskip("tensorflow")
    import jax.numpy as jnp  # noqa: F401

    from birdnet_stm32_tpu.models.transplant import load_reference_model

    return load_reference_model(KERAS_PATH, CONFIG_PATH)


def test_detected_architecture(loaded):
    _, _, cfg = loaded
    # The shipped graph is plain DS-CNN without SE (regardless of sidecar defaults).
    assert cfg.use_inverted_residual is False
    assert cfg.use_se is False
    assert cfg.use_attention_pooling is False
    assert cfg.num_classes == 100


def test_param_structure_matches_fresh_init(loaded):
    import jax

    from birdnet_stm32_tpu.models.dscnn import init_model

    model, variables, cfg = loaded
    fresh = init_model(model, cfg, jax.random.key(0))
    ours = jax.tree_util.tree_structure(variables["params"])
    ref = jax.tree_util.tree_structure(fresh["params"])
    assert ours == ref
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["params"])[0],
        jax.tree_util.tree_flatten_with_path(fresh["params"])[0],
    ):
        assert a.shape == b.shape, (pa, a.shape, b.shape)


def test_float_forward_matches_tf_golden(loaded):
    import jax
    import jax.numpy as jnp

    from tests.tf_golden import build_tf_golden

    model, variables, cfg = loaded
    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (4, 257, 256, 1)).astype(np.float32)

    golden = build_tf_golden(KERAS_PATH)(x)["pred"]
    fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
    ours = np.asarray(fwd(variables, jnp.asarray(x)))

    assert ours.shape == golden.shape
    for i in range(x.shape[0]):
        cos = float(np.dot(ours[i], golden[i]) / (np.linalg.norm(ours[i]) * np.linalg.norm(golden[i])))
        assert cos > 0.99999, f"sample {i} cosine {cos}"
    np.testing.assert_allclose(ours, golden, atol=5e-4)


def test_detect_arch_ignores_lookalike_names():
    """Substring lookalikes ('probe_sep', 'mixer_ir10n') must not toggle
    SE/IR; real stage block names must."""
    from birdnet_stm32_tpu.models.transplant import detect_arch

    mk = lambda *names: [{"class_name": "Conv2D", "name": n, "config": {}}
                         for n in names]
    plain = detect_arch(mk("stem_conv", "probe_sep", "mixer_ir10n",
                           "stage1_ds1_dw", "pred"))
    assert not plain["use_se"] and not plain["use_inverted_residual"]

    se = detect_arch(mk("stage1_ds1_dw", "stage1_se1_squeeze",
                        "stage1_se1_reduce"))
    assert se["use_se"] and not se["use_inverted_residual"]

    ir_se = detect_arch(mk("stage2_ir3_expand", "stage2_ir3_se_squeeze"))
    assert ir_se["use_se"] and ir_se["use_inverted_residual"]
