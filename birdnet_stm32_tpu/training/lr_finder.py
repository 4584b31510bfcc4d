"""Learning-rate finder: exponential sweep + steepest-descent suggestion.

Parity with reference training/lr_finder.py:12-163: sweep LR geometrically
from min to max over N steps, record smoothed loss, stop early when loss
explodes past 4x the best, suggest the LR at the steepest descent of the
smoothed curve, and leave the caller's weights untouched (the sweep runs on
a throwaway copy of the training state — cleaner than the reference's
save/restore of live Keras weights).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from birdnet_stm32_tpu.parallel.steps import TrainState


def run_lr_finder(
    model,
    variables: dict,
    batches,
    loss_fn,
    min_lr: float = 1e-7,
    max_lr: float = 1.0,
    num_steps: int = 100,
    smoothing: float = 0.98,
    explosion_factor: float = 4.0,
    seed: int = 0,
) -> dict:
    """Sweep the LR and return the loss curve + suggestion.

    Args:
        model: DSCNN with class_activation='none'.
        variables: Starting {params, batch_stats} (not modified).
        batches: Iterator of (model_inputs, labels) device-ready batches.
        loss_fn: (logits, labels) -> scalar.
        min_lr, max_lr: Sweep range (geometric).
        num_steps: Number of sweep steps.
        smoothing: EMA factor for the smoothed loss.
        explosion_factor: Stop when smoothed loss > factor * best.

    Returns:
        {"lrs": [...], "losses": [...], "smoothed": [...],
         "suggested_lr": float}
    """
    import optax

    gamma = (max_lr / min_lr) ** (1.0 / max(1, num_steps - 1))

    # SGD with externally supplied LR via inject_hyperparams.
    tx = optax.inject_hyperparams(optax.sgd)(learning_rate=min_lr)
    state = TrainState.create(jax.tree_util.tree_map(jnp.copy, variables), tx)

    @jax.jit
    def step(state, x, y, lr, rng):
        def compute_loss(params):
            out, updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                x, train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
            )
            return loss_fn(out, y), updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        opt_state = state.opt_state
        opt_state.hyperparams["learning_rate"] = lr
        updates, opt_state = tx.update(grads, opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return state.replace(step=state.step + 1, params=params,
                             batch_stats=stats, opt_state=opt_state), loss

    lrs, losses, smoothed = [], [], []
    avg = 0.0
    best = float("inf")
    key = jax.random.key(seed)
    for i in range(num_steps):
        lr = min_lr * gamma**i
        x, y = next(batches)
        state, loss = step(state, jnp.asarray(x), jnp.asarray(y), jnp.float32(lr),
                           jax.random.fold_in(key, i))
        loss = float(loss)
        if not np.isfinite(loss):
            break
        avg = smoothing * avg + (1 - smoothing) * loss
        corrected = avg / (1 - smoothing ** (i + 1))
        lrs.append(lr)
        losses.append(loss)
        smoothed.append(corrected)
        best = min(best, corrected)
        if i > 10 and corrected > explosion_factor * best:
            break

    suggestion = suggest_lr(lrs, smoothed)
    return {"lrs": lrs, "losses": losses, "smoothed": smoothed, "suggested_lr": suggestion}


def suggest_lr(lrs: list[float], smoothed: list[float]) -> float:
    """LR at the steepest descent of the smoothed curve
    (reference lr_finder.py:58-78)."""
    if len(lrs) < 5:
        return lrs[len(lrs) // 2] if lrs else 1e-3
    d = np.gradient(np.asarray(smoothed), np.log10(np.asarray(lrs)))
    return float(lrs[int(np.argmin(d))])
