"""Tests for frontend registry, analytical profiler, LR finder, tuner,
linear probe, and calibration sampling.

Mirrors reference tests/test_frontend_registry.py:22-66 (registry semantics)
and the profiler/tuner/probe behavior described in SURVEY.md §2.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn, init_model
from birdnet_stm32_tpu.models.profiler import (
    check_n6_compatibility,
    profile_model,
    totals,
)
from birdnet_stm32_tpu.models.registry import (
    FrontendInfo,
    get_frontend_info,
    is_n6_compatible,
    is_precomputed,
    register_frontend,
    registered_frontends,
)
from birdnet_stm32_tpu.quant.calibrate import stratified_sample_paths
from birdnet_stm32_tpu.training.linear_probe import (
    assert_backbone_frozen,
    head_only_mask,
    make_probe,
    run_linear_probe,
)
from birdnet_stm32_tpu.training.losses import make_loss_fn
from birdnet_stm32_tpu.training.lr_finder import run_lr_finder, suggest_lr
from birdnet_stm32_tpu.training.tuner import (
    SPACE,
    Study,
    run_tuning,
    sample_params,
)


def tiny_cfg(**kw):
    base = dict(sample_rate=4000, num_mels=16, spec_width=32, fft_length=128,
                chunk_duration=1.0, embeddings_size=32, num_classes=2,
                class_names=["a", "b"], audio_frontend="librosa",
                mag_scale="none", alpha=0.25)
    base.update(kw)
    return ModelConfig(**base)


# ---------------------------------------------------------------- registry

def test_registry_builtins():
    names = registered_frontends()
    for n in ("librosa", "hybrid", "raw", "mfcc", "log_mel"):
        assert n in names
    assert is_precomputed("librosa")
    assert not is_precomputed("hybrid")
    assert is_n6_compatible("raw")
    assert get_frontend_info("hybrid").mode == "hybrid"


def test_registry_rejects_duplicates_and_bad_mode():
    with pytest.raises(ValueError):
        register_frontend(FrontendInfo("librosa", "precomputed", True, True))
    with pytest.raises(ValueError):
        register_frontend(FrontendInfo("weird", "magic", True, True))
    with pytest.raises(KeyError):
        get_frontend_info("nope")


def test_registry_extension():
    register_frontend(FrontendInfo("test_custom_fe", "precomputed", True, False))
    assert not is_n6_compatible("test_custom_fe")


def test_model_registry():
    """Architecture registry (reference models/__init__.py semantics)."""
    from birdnet_stm32_tpu.models import (
        DSCNN,
        build_model,
        list_models,
        register_model,
    )

    assert "dscnn" in list_models()
    model = build_model("dscnn", tiny_cfg(), class_activation="none")
    assert isinstance(model, DSCNN)

    with pytest.raises(KeyError):
        build_model("transformer_9000", tiny_cfg())

    @register_model("test_custom_arch")
    def build_custom(cfg, **kw):
        return build_model("dscnn", cfg, **kw)

    assert "test_custom_arch" in list_models()
    assert isinstance(build_model("test_custom_arch", tiny_cfg()), DSCNN)
    with pytest.raises(ValueError):
        register_model("dscnn")(build_custom)


# ---------------------------------------------------------------- profiler

@pytest.mark.parametrize("kw", [
    {},  # librosa default
    {"audio_frontend": "raw", "mag_scale": "pwl"},
    {"audio_frontend": "raw", "mag_scale": "pcen"},
    {"audio_frontend": "hybrid", "mag_scale": "pwl"},
])
def test_profiler_matches_real_param_count(kw):
    """Analytical params must equal the actual Flax parameter count —
    across frontends (the raw branch once omitted the mag-scale params)."""
    cfg = tiny_cfg(**kw)
    model = build_dscnn(cfg)
    variables = init_model(model, cfg)
    real = sum(int(np.prod(p.shape))
               for p in jax.tree_util.tree_leaves(variables["params"]))
    # BN running stats are not params in the analytic model either; but the
    # analytic BN cost counts gamma/beta only (2c), matching Flax `params`.
    est = totals(profile_model(cfg))["params"]
    assert est == real, f"analytic {est} != real {real} for {kw}"


def test_profiler_alpha_monotone():
    small = totals(profile_model(tiny_cfg(alpha=0.25)))
    big = totals(profile_model(tiny_cfg(alpha=1.0)))
    assert big["params"] > small["params"]
    assert big["macs"] > small["macs"]
    assert big["size_int8_bytes"] == big["params"]
    assert big["size_float32_bytes"] == 4 * big["params"]


def test_profiler_compat_warnings():
    warns = check_n6_compatibility(tiny_cfg(mag_scale="db"))
    assert any("db" in w for w in warns)
    long_raw = tiny_cfg(audio_frontend="raw", sample_rate=24000,
                        chunk_duration=3.0, spec_width=128)
    assert any("65536" in w for w in check_n6_compatibility(long_raw))
    assert check_n6_compatibility(tiny_cfg()) == []


# ---------------------------------------------------------------- tuner

def test_sample_params_in_space():
    rng = np.random.default_rng(0)
    for _ in range(20):
        p = sample_params(rng)
        assert 0.25 <= p["alpha"] <= 1.5
        assert p["embeddings_size"] in (64, 128, 256)
        assert ("se_reduction" in p) == p["use_se"]
        assert ("expansion_factor" in p) == p["use_inverted_residual"]
        assert set(SPACE) <= set(p)


def test_tpe_proposals_respect_space():
    """TPE-proposed params stay in the search space with the conditional
    structure intact."""
    from birdnet_stm32_tpu.training.tuner import Trial, tpe_propose

    rng = np.random.default_rng(0)
    completed = []
    for i in range(10):
        p = sample_params(rng)
        completed.append(Trial(number=i, params=p, value=float(rng.uniform())))
    for _ in range(10):
        p = tpe_propose(rng, completed)
        assert 0.25 <= p["alpha"] <= 1.5
        assert 1e-4 <= p["learning_rate"] <= 1e-2
        assert p["depth_multiplier"] in (1, 2, 3)
        assert p["embeddings_size"] in (64, 128, 256)
        assert ("se_reduction" in p) == p["use_se"]
        assert ("expansion_factor" in p) == p["use_inverted_residual"]
        assert set(SPACE) <= set(p)


def test_tpe_concentrates_on_optimum():
    """On a smooth objective peaked at alpha=1.0 the TPE sampler's later
    proposals sit closer to the optimum than random search's."""
    def objective(trial):
        return -(trial.params["alpha"] - 1.0) ** 2

    def late_alpha_err(sampler, seed):
        study = Study(seed=seed, sampler=sampler, n_startup_trials=5)
        study.optimize(objective, 40)
        late = study.trials[20:]
        return float(np.mean([abs(t.params["alpha"] - 1.0) for t in late]))

    tpe = np.mean([late_alpha_err("tpe", s) for s in range(3)])
    rnd = np.mean([late_alpha_err("random", s) for s in range(3)])
    assert tpe < rnd, f"TPE {tpe:.3f} not better than random {rnd:.3f}"
    # Uniform-random expectation is ~0.33 over alpha in [0.25, 1.5]; TPE
    # must concentrate meaningfully below that despite 15 nuisance dims.
    assert tpe < 0.3, f"TPE late-stage alpha error {tpe:.3f} too large"


def test_study_prunes_bad_trials(tmp_path):
    """Objective = alpha; bad trials report low intermediates and get pruned."""
    calls = []

    def objective(trial):
        score = trial.params["alpha"]
        for step in range(3):
            trial.report(score, step, study)
        calls.append(trial.number)
        return score

    study = Study(seed=0, n_warmup_trials=3, n_warmup_steps=1)
    study.optimize(objective, 12)
    done = [t for t in study.trials if t.value is not None]
    pruned = [t for t in study.trials if t.pruned]
    assert len(done) >= 3
    assert pruned, "median pruner never fired"
    assert study.best_trial.value == max(t.value for t in done)


def test_run_tuning_persists_best(tmp_path):
    best = run_tuning(lambda t: t.params["alpha"], 5, tmp_path, seed=1)
    assert (tmp_path / "best_params.json").exists()
    import json
    saved = json.loads((tmp_path / "best_params.json").read_text())
    assert saved["value"] == pytest.approx(best.value)
    assert saved["params"]["alpha"] == pytest.approx(best.params["alpha"])


# ---------------------------------------------------------------- lr finder

def _toy_model_batches(cfg, batch=8, seed=0):
    rng = np.random.default_rng(seed)
    T = cfg.chunk_samples
    t = np.arange(T) / cfg.sample_rate
    from birdnet_stm32_tpu.ops.frontend import inputs_for_config

    def gen():
        while True:
            labels = rng.integers(0, 2, batch)
            waves = np.stack([
                np.sin(2 * np.pi * (300 if l == 0 else 1500) * t).astype(np.float32)
                for l in labels])
            x = np.asarray(inputs_for_config(jnp.asarray(waves), cfg))
            y = np.eye(2, dtype=np.float32)[labels]
            yield x, y

    return gen()


def test_lr_finder_sweeps_and_suggests():
    cfg = tiny_cfg()
    model = build_dscnn(cfg, class_activation="none")
    variables = init_model(model, cfg)
    before = jax.device_get(variables)
    loss_fn = make_loss_fn(multilabel=False)
    out = run_lr_finder(model, variables, _toy_model_batches(cfg), loss_fn,
                        min_lr=1e-5, max_lr=10.0, num_steps=25)
    assert len(out["lrs"]) == len(out["smoothed"]) > 5
    # LRs grow geometrically.
    assert out["lrs"][1] / out["lrs"][0] == pytest.approx(
        out["lrs"][2] / out["lrs"][1], rel=1e-6)
    assert out["suggested_lr"] in out["lrs"]
    # Caller's weights untouched.
    for a, b in zip(jax.tree_util.tree_leaves(before["params"]),
                    jax.tree_util.tree_leaves(variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_suggest_lr_steepest_descent():
    lrs = list(np.logspace(-5, 0, 30))
    # Loss drops fastest around index 20.
    smoothed = [1.0] * 20 + [0.5, 0.2, 0.15, 0.14] + [0.14] * 6
    s = suggest_lr(lrs, smoothed)
    assert s in lrs[19:23]


# ---------------------------------------------------------------- probe

def test_head_only_mask():
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    variables = init_model(model, cfg)
    mask = head_only_mask(variables["params"])
    flat = jax.tree_util.tree_flatten_with_path(mask)[0]
    heads = [v for p, v in flat if "pred" in str(p)]
    rest = [v for p, v in flat if "pred" not in str(p)]
    assert all(v == 1.0 for v in heads) and heads
    assert all(v == 0.0 for v in rest) and rest


def test_make_probe_reinits_head():
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    variables = init_model(model, cfg)
    new_classes = ["x", "y", "z"]
    pm, pv, pcfg = make_probe(variables, cfg, new_classes)
    assert pcfg.num_classes == 3
    assert pv["params"]["pred"]["kernel"].shape[1] == 3
    # Backbone copied verbatim.
    np.testing.assert_array_equal(
        np.asarray(pv["params"]["stem_conv"]["kernel"]),
        np.asarray(variables["params"]["stem_conv"]["kernel"]))
    # Probe forward works on config-shaped input.
    x = jnp.zeros((2, *pcfg.input_shape()), jnp.float32)
    out = pm.apply(pv, x, train=False)
    assert out.shape == (2, 3)


@pytest.mark.slow
def test_linear_probe_trains_head_only(tmp_path):
    cfg = tiny_cfg()
    model = build_dscnn(cfg)
    variables = init_model(model, cfg, jax.random.key(7))
    batches = _toy_model_batches(cfg, batch=8)
    val = [next(batches) for _ in range(2)]
    best, history = run_linear_probe(
        variables, cfg, ["lo", "hi"], batches, lambda: iter(val),
        tmp_path, epochs=2, steps_per_epoch=5)
    assert len(history) == 2
    probe_before, _, _ = make_probe(variables, cfg, ["lo", "hi"])
    _ = probe_before  # only the structure matters: compare vs original backbone
    assert_backbone_frozen(
        {"params": {k: v for k, v in variables["params"].items()}},
        {"params": {k: v for k, v in best["params"].items()}})


# ---------------------------------------------------------------- calibrate

def test_stratified_sample_paths():
    paths = [f"f{i}.wav" for i in range(30)]
    labels = ["a"] * 10 + ["b"] * 10 + ["c"] * 10
    out = stratified_sample_paths(paths, labels, per_class=3, seed=0)
    assert len(out) == 9
    assert len(set(out)) == 9
    got = {l: 0 for l in "abc"}
    for p in out:
        i = int(p[1:-4])
        got[labels[i]] += 1
    assert got == {"a": 3, "b": 3, "c": 3}


def test_study_prunes_through_trial_backref():
    """Trial.report works without an explicit study arg (Study.optimize
    sets the backref) and bad trials actually stop early."""
    from birdnet_stm32_tpu.training.tuner import Study

    calls = []

    def objective(trial):
        # Trials alternate good (rising AUC) and bad (flat zero).
        good = trial.number % 2 == 0
        for epoch in range(5):
            v = 0.5 + 0.1 * epoch if good else 0.0
            trial.report(v, epoch)  # no study argument: backref path
            calls.append((trial.number, epoch))
        return v

    study = Study(seed=0, n_warmup_trials=2, n_warmup_steps=1, sampler="random")
    study.optimize(objective, n_trials=8)
    pruned = [t for t in study.trials if t.pruned]
    completed = [t for t in study.trials if t.value is not None]
    assert pruned, "flat-zero trials should be pruned below the median"
    assert all(t.number % 2 == 1 for t in pruned)
    assert study.best_trial.value == max(t.value for t in completed)
    # Pruned trials stopped early: fewer reports than 5 epochs.
    worst = max(t.number for t in pruned)
    assert len([c for c in calls if c[0] == worst]) < 5
