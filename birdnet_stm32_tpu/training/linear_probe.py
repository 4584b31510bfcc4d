"""Linear probing: retrain only a fresh classifier head on a new class set.

Parity with reference training/linear_probe.py:22-201 (freeze the backbone,
replace the head, fine-tune on new classes, save probe checkpoint + config
+ labels). In JAX the freeze is a gradient mask instead of layer.trainable
flags, and "replace the head" is re-initializing the `pred` entry in the
parameter tree.
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from birdnet_stm32_tpu.config import ModelConfig
from birdnet_stm32_tpu.models.dscnn import build_dscnn
from birdnet_stm32_tpu.parallel.steps import TrainState
from birdnet_stm32_tpu.training import checkpoint as ckpt
from birdnet_stm32_tpu.training.losses import make_loss_fn
from birdnet_stm32_tpu.training.optimizer import build_optimizer, cosine_schedule
from birdnet_stm32_tpu.utils.logging import info


def make_probe(variables: dict, cfg: ModelConfig, new_classes: list[str],
               key=None) -> tuple:
    """Build a probe model: old backbone weights + fresh head for new classes.

    Returns:
        (model, variables, new_cfg) with `pred` re-initialized to
        [emb, len(new_classes)].
    """
    key = key if key is not None else jax.random.key(0)
    # Keep the CALLER's label order: head column i corresponds to
    # new_classes[i]; sorting here would silently permute predictions
    # against the training labels.
    new_cfg = dataclasses.replace(cfg, num_classes=len(new_classes),
                                  class_names=list(new_classes))
    model = build_dscnn(new_cfg, class_activation="none")

    emb = variables["params"]["pred"]["kernel"].shape[0]
    c = len(new_classes)
    params = dict(variables["params"])
    params["pred"] = {
        "kernel": jax.nn.initializers.lecun_normal()(key, (emb, c), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
    }
    new_vars = {"params": params}
    if variables.get("batch_stats"):
        new_vars["batch_stats"] = variables["batch_stats"]
    return model, new_vars, new_cfg


def head_only_mask(params) -> object:
    """Gradient mask: 1 for `pred` params, 0 elsewhere (backbone frozen)."""
    def mask(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return 1.0 if top == "pred" else 0.0

    return jax.tree_util.tree_map_with_path(mask, params)


def head_only_optimizer(tx: optax.GradientTransformation, params) -> optax.GradientTransformation:
    """Apply `tx` to the `pred` head only; zero every backbone update.

    (optax.masked alone is wrong here: leaves outside the mask pass through
    as raw gradient updates rather than being zeroed.)
    """
    def label(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        return "train" if top == "pred" else "freeze"

    labels = jax.tree_util.tree_map_with_path(label, params)
    return optax.multi_transform({"train": tx, "freeze": optax.set_to_zero()}, labels)


def run_linear_probe(
    variables: dict,
    cfg: ModelConfig,
    new_classes: list[str],
    train_batches,
    val_batches,
    run_dir: str | Path,
    epochs: int = 10,
    steps_per_epoch: int = 50,
    learning_rate: float = 1e-3,
    multilabel: bool = False,
    seed: int = 0,
) -> tuple[dict, list[dict]]:
    """Fine-tune a fresh head; backbone gradients are zeroed.

    train_batches / val_batches supply (model_inputs, labels-[B, len(new_classes)]).

    The probe model is built from cfg + new_classes (the head shape changes,
    so a caller-supplied model could not be honored anyway).

    Returns:
        (best variables, history).
    """
    probe_model, probe_vars, probe_cfg = make_probe(variables, cfg, new_classes,
                                                    jax.random.key(seed))
    info("probe", f"training head for {len(new_classes)} classes, backbone frozen")

    schedule = cosine_schedule(learning_rate, epochs, steps_per_epoch)
    tx = head_only_optimizer(build_optimizer("adam", schedule), probe_vars["params"])
    loss_fn = make_loss_fn(multilabel=multilabel)
    state = TrainState.create(probe_vars, tx)

    @jax.jit
    def step(state, x, y, rng):
        def compute_loss(params):
            # Backbone frozen: BN runs on its stored statistics.
            logits = probe_model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, freeze_bn=True, rngs={"dropout": rng},
            )
            return loss_fn(logits, y)

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params, opt_state=opt_state), loss

    @jax.jit
    def eval_loss(state, x, y):
        logits = probe_model.apply(state.variables(), x, train=False)
        return loss_fn(logits, y)

    key = jax.random.key(seed)
    host_step = 0  # no blocking device read per step
    history = []
    best_val, best_vars = float("inf"), probe_vars
    run_dir = Path(run_dir)
    for epoch in range(epochs):
        losses = []
        for _ in range(steps_per_epoch):
            x, y = next(train_batches)
            state, loss = step(state, jnp.asarray(x), jnp.asarray(y),
                               jax.random.fold_in(key, host_step))
            host_step += 1
            losses.append(loss)  # device array: convert once per epoch
        losses = [float(l) for l in losses]
        vals = [float(eval_loss(state, jnp.asarray(x), jnp.asarray(y))) for x, y in val_batches()]
        val_loss = float(np.mean(vals)) if vals else float("nan")
        history.append({"loss": float(np.mean(losses)), "val_loss": val_loss})
        info("probe", f"epoch {epoch + 1}/{epochs} loss={history[-1]['loss']:.4f} val={val_loss:.4f}")
        if val_loss < best_val:
            best_val = val_loss
            best_vars = jax.device_get(state.variables())
            ckpt.save_checkpoint(run_dir, best_vars, probe_cfg)
    if not np.isfinite(best_val):
        # No finite val loss ever seen (empty val iterable / NaN losses):
        # returning the random-init head and writing NO checkpoint would
        # silently discard the whole run. Keep the final trained state.
        from birdnet_stm32_tpu.utils.logging import warn

        warn("probe", "no finite validation loss; saving the FINAL epoch "
                      "state instead of a best-val checkpoint")
        best_vars = jax.device_get(state.variables())
        ckpt.save_checkpoint(run_dir, best_vars, probe_cfg)
    return best_vars, history


def assert_backbone_frozen(before: dict, after: dict) -> None:
    """Verify only the head moved (used by tests)."""
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(before["params"])[0],
        jax.tree_util.tree_flatten_with_path(after["params"])[0],
    ):
        top = pa[0].key if hasattr(pa[0], "key") else str(pa[0])
        same = np.array_equal(np.asarray(a), np.asarray(b))
        if top == "pred":
            continue
        assert same, f"backbone param {pa} moved during probe"
