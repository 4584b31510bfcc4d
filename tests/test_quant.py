"""Fake-quant / QAT / validation-metric tests (reference invariants)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.parallel.steps import TrainState
from birdnet_stm32_tpu.quant.fake_quant import fake_quantize, fake_quantize_ste, quantize_params
from birdnet_stm32_tpu.quant.qat import make_qat_train_step
from birdnet_stm32_tpu.quant.validate import cosine_similarity, pearson_correlation
from birdnet_stm32_tpu.training.losses import make_loss_fn


def test_fake_quantize_roundtrip_error_bound(rng):
    w = jnp.asarray(rng.normal(size=(3, 3, 8, 16)).astype(np.float32))
    wq = fake_quantize(w, num_bits=8, per_channel=True, channel_axis=-1)
    # max error <= half a quantization step per channel
    step = (w.max(axis=(0, 1, 2)) - w.min(axis=(0, 1, 2))) / 255.0
    err = jnp.abs(wq - w).max(axis=(0, 1, 2))
    assert bool(jnp.all(err <= step * 0.5 + 1e-7))


def test_fake_quantize_levels(rng):
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    wq = np.asarray(fake_quantize(w, per_channel=False))
    assert len(np.unique(wq.round(7))) <= 256


def test_per_channel_beats_per_tensor(rng):
    w = rng.normal(size=(3, 3, 4, 8)).astype(np.float32)
    w[..., 0] *= 100.0  # one huge-range channel
    wj = jnp.asarray(w)
    e_pc = float(jnp.abs(fake_quantize(wj, per_channel=True) - wj).mean())
    e_pt = float(jnp.abs(fake_quantize(wj, per_channel=False) - wj).mean())
    assert e_pc < e_pt


def test_ste_gradient_identity(rng):
    w = jnp.asarray(rng.normal(size=(8, 8)).astype(np.float32))
    g = jax.grad(lambda w: jnp.sum(fake_quantize_ste(w) ** 2))(w)
    # d/dw sum(q(w)^2) with STE = 2*q(w)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(fake_quantize(w)), atol=1e-5)


def test_quantize_params_skips_frontend_bias_bn():
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=3,
                      audio_frontend="hybrid", mag_scale="pwl")
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    qp = quantize_params(variables["params"], ste=False)
    # frontend untouched
    np.testing.assert_array_equal(
        np.asarray(qp["audio_frontend"]["mel_mixer"]),
        np.asarray(variables["params"]["audio_frontend"]["mel_mixer"]),
    )
    # BN scale untouched; conv kernel quantized
    np.testing.assert_array_equal(
        np.asarray(qp["stem_bn"]["scale"]), np.asarray(variables["params"]["stem_bn"]["scale"])
    )
    assert not np.array_equal(
        np.asarray(qp["stem_conv"]["kernel"]), np.asarray(variables["params"]["stem_conv"]["kernel"])
    )
    # pred bias untouched
    np.testing.assert_array_equal(
        np.asarray(qp["pred"]["bias"]), np.asarray(variables["params"]["pred"]["bias"])
    )


def test_qat_step_trains_and_freezes_bn(rng):
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=3,
                      audio_frontend="librosa", mag_scale="none")
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    tx = optax.adam(1e-4)
    state = TrainState.create(variables, tx)
    step = make_qat_train_step(model, tx, make_loss_fn(multilabel=True), donate=False)

    x = jnp.asarray(rng.uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)])
    stats_before = jax.tree_util.tree_map(np.asarray, state.batch_stats)
    losses = []
    for i in range(4):
        state, m = step(state, x, y, jax.random.key(i))
        losses.append(float(m["loss"]))
    assert all(np.isfinite(losses))
    # BN running stats unchanged (frozen)
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(stats_before)[0],
        jax.tree_util.tree_flatten_with_path(state.batch_stats)[0],
    ):
        np.testing.assert_array_equal(a, np.asarray(b))
    # kernels did move
    assert not np.array_equal(
        np.asarray(variables["params"]["stem_conv"]["kernel"]),
        np.asarray(state.params["stem_conv"]["kernel"]),
    )


def test_fake_quantize_act_properties(rng):
    """Per-tensor activation fake-quant: 256 levels, zero exactly
    representable, STE identity gradient."""
    from birdnet_stm32_tpu.quant.fake_quant import fake_quantize_act

    x = jnp.asarray(rng.uniform(0, 6, (4, 33)).astype(np.float32))
    q = fake_quantize_act(x)
    assert len(np.unique(np.asarray(q))) <= 255
    step = float(jnp.max(x)) / 255
    assert float(jnp.max(jnp.abs(q - x))) <= step / 2 + 1e-6
    # Zero representable EXACTLY, including with a negative-min range
    # (logits): the integer zero-point nudge, TFLite affine semantics.
    x0 = x.at[0, 0].set(0.0)
    assert float(fake_quantize_act(x0)[0, 0]) == 0.0
    xn = jnp.asarray(rng.normal(0, 2.0, (4, 33)).astype(np.float32))
    xn = xn.at[0, 0].set(0.0)
    assert float(fake_quantize_act(xn)[0, 0]) == 0.0
    # STE: gradient of sum(fq(x)) is all-ones.
    g = jax.grad(lambda v: fake_quantize_act(v).sum())(x)
    np.testing.assert_array_equal(np.asarray(g), np.ones_like(g))


def test_relu6_act_fq_hook(rng):
    """The blocks.relu6 hook fires only inside activation_fake_quant and
    only for hookable call sites; the context always resets."""
    from birdnet_stm32_tpu.models.blocks import _ACT_FQ, relu6
    from birdnet_stm32_tpu.quant.fake_quant import activation_fake_quant

    x = jnp.asarray(rng.uniform(-1, 7, (3, 40)).astype(np.float32))
    plain = np.asarray(relu6(x))
    with activation_fake_quant(num_bits=4):
        hooked = np.asarray(relu6(x))
        unhooked = np.asarray(relu6(x, hookable=False))
    assert _ACT_FQ.get() is None  # context reset
    np.testing.assert_array_equal(unhooked, plain)
    assert not np.array_equal(hooked, plain)  # 4-bit grid is coarse
    assert len(np.unique(hooked)) <= 16  # 4-bit affine grid
    np.testing.assert_array_equal(np.asarray(relu6(x)), plain)  # hook gone


def test_qat_step_act_fq_trains(rng):
    """make_qat_train_step(act_fq=True) runs, keeps BN frozen, and traces
    the activation noise into the loss (loss differs from weights-only)."""
    cfg = ModelConfig(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                      chunk_duration=1.0, embeddings_size=32, num_classes=3,
                      audio_frontend="librosa", mag_scale="none")
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    tx = optax.adam(1e-4)
    loss_fn = make_loss_fn(multilabel=True)
    x = jnp.asarray(rng.uniform(0, 1, (8, *cfg.input_shape())).astype(np.float32))
    y = jnp.asarray(np.eye(3, dtype=np.float32)[rng.integers(0, 3, 8)])

    state_w = TrainState.create(variables, tx)
    step_w = make_qat_train_step(model, tx, loss_fn, donate=False)
    state_a = TrainState.create(variables, tx)
    step_a = make_qat_train_step(model, tx, loss_fn, donate=False, act_fq=True)

    losses_w, losses_a = [], []
    for i in range(3):
        state_w, mw = step_w(state_w, x, y, jax.random.key(i))
        state_a, ma = step_a(state_a, x, y, jax.random.key(i))
        losses_w.append(float(mw["loss"]))
        losses_a.append(float(ma["loss"]))
    assert all(np.isfinite(losses_a))
    # Activation noise is in the traced loss: trajectories diverge.
    assert losses_a != losses_w
    # BN still frozen under act_fq.
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_flatten_with_path(variables["batch_stats"])[0],
        jax.tree_util.tree_flatten_with_path(state_a.batch_stats)[0],
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Kernels moved.
    assert not np.array_equal(
        np.asarray(variables["params"]["stem_conv"]["kernel"]),
        np.asarray(state_a.params["stem_conv"]["kernel"]))


def test_cosine_similarity_edge_cases():
    z = np.zeros(10)
    v = np.ones(10)
    assert cosine_similarity(z, z) == 1.0
    assert cosine_similarity(z, v) == 0.0
    assert cosine_similarity(v, v) == pytest.approx(1.0)
    assert cosine_similarity(v, -v) == pytest.approx(-1.0)


def test_pearson_edge_cases():
    """Reference validate.py:32-48: EITHER side constant (centered-norm
    product < eps) returns 1.0 — its zero-variance guard."""
    z = np.zeros(10)
    c = np.full(10, 3.0)  # constant, zero variance
    x = np.arange(10.0)
    assert pearson_correlation(z, c) == 1.0
    assert pearson_correlation(c, x) == 1.0  # one constant side -> guard
    assert pearson_correlation(x, 2 * x + 1) == pytest.approx(1.0)
    assert pearson_correlation(x, -x) == pytest.approx(-1.0)


def _mbqm_golden_int64(x, qm, shift):
    """int64 numpy golden of TFLite MultiplyByQuantizedMultiplier: gemmlowp
    SRDHM (sign-dependent nudge, truncating divide) then the TF 2.21
    add-half-then-arithmetic-shift rounding divide."""
    x = x.astype(np.int64)
    left = np.maximum(shift, 0)
    right = np.maximum(-shift, 0)
    p = (x << left) * qm.astype(np.int64)
    nudge = np.where(p >= 0, np.int64(1 << 30), np.int64(1 - (1 << 30)))
    t = p + nudge
    sr = np.sign(t) * (np.abs(t) // (1 << 31))  # trunc toward zero
    add = np.where(right > 0, np.int64(1) << np.maximum(right - 1, 0), 0)
    return np.where(right > 0, (sr + add) >> right, sr)


def test_mbqm_limbs_bit_exact_vs_int64_golden():
    """The fused limb requant matches the int64 golden on randoms, tie
    boundaries, and the degenerate qm=0 / right=0 / left>0 channels."""
    from birdnet_stm32_tpu.quant.tflite_import import _mbqm_limbs, _mbqm_ref

    rng = np.random.default_rng(7)
    C = 64
    qm = rng.integers(2**30 + 1, 2**31, C)
    shift = rng.integers(-24, 3, C)
    qm[0], shift[0] = 0, 0          # _quantize_multiplier(0.0) channel
    shift[1] = 0                    # no rounding-divide stage
    shift[2], shift[3] = 1, 2       # left-shift path

    N = 4096
    x = np.empty((N, C), np.int32)
    x[: N // 2] = rng.integers(-(2**27), 2**27, (N // 2, C))
    x[N // 2 : 3 * N // 4] = rng.integers(-1024, 1024, (N // 4, C))
    k = rng.integers(-(2**6), 2**6, (N - 3 * N // 4, C)).astype(np.int64)
    near = (k * (1 << 31)) // np.maximum(qm, 1)[None, :]
    x[3 * N // 4 :] = (near + rng.integers(-1, 2, near.shape)).astype(np.int32)

    got = np.asarray(_mbqm_limbs(jnp.asarray(x), qm, shift), np.int64)
    gold = _mbqm_golden_int64(x, qm[None, :], shift[None, :])
    np.testing.assert_array_equal(got, gold)

    # scalar path + two-stage reference formulation agree too
    got1 = np.asarray(_mbqm_ref(jnp.asarray(x[:, 5]), int(qm[5]), int(shift[5])),
                      np.int64)
    np.testing.assert_array_equal(got1, gold[:, 5])


def test_add_rescale_small_form_bit_exact():
    """The 2-multiply ADD/SUB input rescale (_mbqm_shifted_small) and the
    host constant rescale (_mbqm_host) match the int64 golden of
    MBQM(x << 20, qm, shift) EXHAUSTIVELY over every possible input
    (|code - zp| <= 255) for a sweep of multipliers/shifts, including the
    .5-tie mantissas and the qm=0 channel."""
    from birdnet_stm32_tpu.quant.tflite_import import (
        _add_rescale,
        _mbqm_host,
        _mbqm_shifted_small,
    )

    rng = np.random.default_rng(11)
    x = np.arange(-255, 256, dtype=np.int32)
    x64 = x.astype(np.int64) << 20
    qms = [0, 1 << 30, (1 << 31) - 1, 3 << 29]
    qms += [int(q) for q in rng.integers(2**30, 2**31, 8)]
    for qm in qms:
        for shift in range(-11, 1):  # D = 11 - shift in [11, 22]
            gold = _mbqm_golden_int64(x64, np.array([qm]), np.array([shift]))
            got = np.asarray(_mbqm_shifted_small(jnp.asarray(x), qm, shift),
                             np.int64)
            np.testing.assert_array_equal(got, gold, err_msg=f"{qm=} {shift=}")
            np.testing.assert_array_equal(_mbqm_host(x64 >> 20 << 20, qm, shift)
                                          .astype(np.int64), gold)
            # dispatcher picks the small form here
            got2 = np.asarray(_add_rescale(jnp.asarray(x), qm, shift), np.int64)
            np.testing.assert_array_equal(got2, gold)
    # out-of-precondition shift falls back to the limb pass, still exact
    gold = _mbqm_golden_int64(x64, np.array([qms[4]]), np.array([-14]))
    got = np.asarray(_add_rescale(jnp.asarray(x), qms[4], -14), np.int64)
    np.testing.assert_array_equal(got, gold)


def test_mbqm_bounded_forms_bit_exact():
    """The bound-gated small (2-multiply) and mid (4-multiply, carry-free)
    requant forms match the int64 golden across their whole precondition
    space: right shifts over the full admissible 0..31 range, boundary
    accumulators at exactly +/-2^15 and +/-2^29, tie-adjacent values, and
    the qm=0 channel."""
    from birdnet_stm32_tpu.quant.tflite_import import (
        _mbqm_bounded,
        _mbqm_mid,
        _mbqm_small,
    )

    rng = np.random.default_rng(23)
    C = 16
    qm = rng.integers(2**30 + 1, 2**31, C)
    qm[0] = 0
    qm[1] = (1 << 31) - 1
    qm[2] = 1 << 30
    shift = -rng.integers(0, 32, C)
    shift[0] = 0
    shift[3], shift[4], shift[5] = 0, -14, -31  # precondition edges

    def cases(bound):
        N = 2048
        x = np.empty((N, C), np.int64)
        x[: N // 2] = rng.integers(-bound, bound + 1, (N // 2, C))
        x[N // 2 : N // 2 + 8] = [[bound] * C, [-bound] * C,
                                  [bound - 1] * C, [-bound + 1] * C,
                                  [0] * C, [1] * C, [-1] * C, [255] * C]
        # tie-adjacent: x near k*2^(31+right)/qm where the rounding flips
        k = rng.integers(-(2**4), 2**4, (N - N // 2 - 8, C)).astype(np.int64)
        near = (k << (31 - shift[None, :])) // np.maximum(qm, 1)[None, :]
        x[N // 2 + 8 :] = np.clip(near + rng.integers(-1, 2, near.shape),
                                  -bound, bound)
        return x.astype(np.int32)

    for form, bound in ((_mbqm_small, 1 << 15), (_mbqm_mid, 1 << 29)):
        x = cases(bound)
        gold = _mbqm_golden_int64(x.astype(np.int64), qm[None, :],
                                  shift[None, :])
        got = np.asarray(form(jnp.asarray(x), qm, shift), np.int64)
        np.testing.assert_array_equal(got, gold, err_msg=form.__name__)
        # the dispatcher picks an exact form for this bound too
        got2 = np.asarray(_mbqm_bounded(jnp.asarray(x), qm, shift, bound),
                          np.int64)
        np.testing.assert_array_equal(got2, gold)

    # out-of-precondition dispatches fall back to the generic limb pass
    x = cases(1 << 29)
    big = _mbqm_golden_int64(x.astype(np.int64), qm[None, :], shift[None, :])
    for bad_bound in ((1 << 29) + 1, None):
        got = np.asarray(_mbqm_bounded(jnp.asarray(x), qm, shift, bad_bound),
                         np.int64)
        np.testing.assert_array_equal(got, big)
    left = shift.copy()
    left[5] = 2  # a left-shift channel breaks the no-left precondition
    xs = np.clip(cases(1 << 15), -(2**27), 2**27)  # keep x<<2 in int32
    gold = _mbqm_golden_int64(xs.astype(np.int64), qm[None, :], left[None, :])
    got = np.asarray(_mbqm_bounded(jnp.asarray(xs), qm, left, 1 << 15),
                     np.int64)
    np.testing.assert_array_equal(got, gold)


def test_conv_acc_range_exact_and_reachable():
    """_conv_acc_range gives true per-channel ceilings (no int8 input can
    exceed them) that are tight (some input reaches each endpoint), for
    conv-style and affine-style shapes."""
    from birdnet_stm32_tpu.quant.tflite_import import _conv_acc_range

    rng = np.random.default_rng(5)
    w = rng.integers(-127, 128, (4, 3, 3, 5)).astype(np.int8)  # [O,kh,kw,I]
    bias = rng.integers(-(2**16), 2**16, 4)
    for in_zp in (-128, -7, 0, 127):
        lo_c, hi_c = _conv_acc_range(w, (1, 2, 3), in_zp, bias)
        # brute-force the reachable extremes: each tap independently picks
        # the endpoint that maximizes/minimizes acc -> the true extreme is
        # the endpoint assignment matching the weight signs.
        a_min, a_max = -128 - in_zp, 127 - in_zp
        w64 = w.astype(np.int64)
        hi = (np.maximum(w64, 0).sum((1, 2, 3)) * a_max
              + np.minimum(w64, 0).sum((1, 2, 3)) * a_min + bias)
        lo = (np.maximum(w64, 0).sum((1, 2, 3)) * a_min
              + np.minimum(w64, 0).sum((1, 2, 3)) * a_max + bias)
        np.testing.assert_array_equal(hi_c, hi)
        np.testing.assert_array_equal(lo_c, lo)
    # affine form (per-channel 1x1 depthwise): no reduction axes
    wv = np.array([-3, 0, 7], np.int64)
    b = np.array([10, -5, 2], np.int64)
    lo_c, hi_c = _conv_acc_range(wv, (), 0, b)
    np.testing.assert_array_equal(lo_c, [-3 * 127 + 10, -5, 7 * -128 + 2])
    np.testing.assert_array_equal(hi_c, [-3 * -128 + 10, -5, 7 * 127 + 2])


def test_requant_exact_constant_channel_rewrite():
    """A channel whose endpoint goldens coincide is emitted as a constant
    (bit-exact by MBQM monotonicity); live channels still requant exactly —
    the reference model's +/-2^30-bias dead channels exercise this path."""
    from birdnet_stm32_tpu.quant.tflite_import import (
        _mbqm_host_vec,
        _quantize_multiplier,
        _requant_exact,
    )

    # channel 0: live, small multiplier. channel 1: dead — saturated bias,
    # tiny multiplier (the TFLite converter's dead-channel signature).
    # channel 2: live with a larger range.
    mult = np.array([2**-9, 2**-24, 2**-7], np.float64)
    bias = np.array([1000, 1 << 30, -2000], np.int64)
    taps = np.array([5000, 300, 40000], np.int64)  # conv-term range +/-taps
    lo_c, hi_c = bias - taps, bias + taps
    zp = 3

    rng = np.random.default_rng(11)
    acc = np.stack([rng.integers(l, h + 1, 4096) for l, h in zip(lo_c, hi_c)],
                   axis=-1).astype(np.int32)
    got = np.asarray(_requant_exact(jnp.asarray(acc), mult, zp, -128, 127,
                                    acc_range=(lo_c, hi_c)), np.int64)
    qms = [_quantize_multiplier(float(m)) for m in mult]
    gold = np.clip(_mbqm_host_vec(acc.astype(np.int64),
                                  np.array([q for q, _ in qms]),
                                  np.array([s for _, s in qms])) + zp,
                   -128, 127)
    np.testing.assert_array_equal(got, gold)
    # the dead channel really is constant (the rewrite had teeth)
    assert np.unique(gold[:, 1]).size == 1
    # and without the range hint the result is identical (pure speedup)
    got2 = np.asarray(_requant_exact(jnp.asarray(acc), mult, zp, -128, 127),
                      np.int64)
    np.testing.assert_array_equal(got2, gold)
