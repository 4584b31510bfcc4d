"""Quantization-aware training: STE fake-quant train step.

Functional re-design of the reference's shadow-weight QAT callback
(training/qat.py:80-139). The callback saves FP weights, injects
fake-quantized copies before each batch, and re-applies the optimizer delta
to the FP copy afterwards — an imperative approximation of the
straight-through estimator. In JAX the same thing is direct: keep FP
parameters, fake-quantize them *inside* the loss with an identity-gradient
transform, and let the optimizer update the FP parameters. Exactly the same
math, no weight swapping.

Matching reference policy: biases/BN/frontend excluded (qat.py:24-77), BN
frozen during QAT fine-tuning (qat.py:142-158).
"""

from __future__ import annotations

from typing import Callable

import jax
import optax
from jax.sharding import Mesh

from birdnet_stm32_tpu.parallel.mesh import batch_sharding, replicated
from birdnet_stm32_tpu.parallel.steps import (
    TrainState,
    _project_nonneg_mel_mixer,
    conv_kernel_l2,
    freeze_mask,
)
from birdnet_stm32_tpu.quant.fake_quant import quantize_params


def make_qat_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable,
    mesh: Mesh | None = None,
    num_bits: int = 8,
    per_channel: bool = True,
    donate: bool = True,
    kernel_l2: float = 1e-4,
    frontend_trainable: bool = True,
    act_fq: bool = False,
):
    """Build the jitted QAT fine-tuning step.

    The model runs with train=True (dropout active) and freeze_bn=True
    (BN on running statistics), on STE-fake-quantized kernels. BN
    gamma/beta and (per frontend_trainable) the frontend are excluded
    from optimizer updates like the reference's layer-level freeze.

    act_fq=True additionally fake-quantizes what PTQ actually quantizes
    (round-5 uplift past the reference's weights-only recipe): the model
    input (the entry QUANTIZE), every hookable ReLU6 output
    (fake_quant.activation_fake_quant hook), and the logits — per-tensor
    asymmetric STE (fake_quant.fake_quantize_act).

    Returns:
        step(state, x, y, rng) -> (state, metrics).
    """
    from birdnet_stm32_tpu.quant.fake_quant import (
        activation_fake_quant,
        fake_quantize_act,
    )

    def step(state: TrainState, x, y, rng):
        rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            q_params = quantize_params(params, num_bits=num_bits, per_channel=per_channel, ste=True)
            variables = {"params": q_params, "batch_stats": state.batch_stats}
            if act_fq:
                with activation_fake_quant(num_bits):
                    logits = model.apply(
                        variables, fake_quantize_act(x, num_bits), train=True,
                        freeze_bn=True, rngs={"dropout": rng},
                    )
                logits = fake_quantize_act(logits, num_bits)
            else:
                logits = model.apply(
                    variables, x, train=True, freeze_bn=True,
                    rngs={"dropout": rng},
                )
            loss = loss_fn(logits, y)
            if kernel_l2 > 0:
                loss = loss + conv_kernel_l2(params, kernel_l2)
            return loss

        loss, grads = jax.value_and_grad(compute_loss)(state.params)
        # Freeze what reference QAT keeps fixed: every BN's gamma/beta and
        # (per frontend_trainable) the frontend subtree.
        keep = freeze_mask(state.params, frontend_trainable=frontend_trainable,
                           freeze_bn=True)
        grads = jax.tree_util.tree_map(lambda g, k: g * k, grads, keep)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        # Mask updates too: decoupled weight decay would still move frozen
        # parameters.
        updates = jax.tree_util.tree_map(lambda u, k: u * k, updates, keep)
        params = optax.apply_updates(state.params, updates)
        params = _project_nonneg_mel_mixer(params)
        new_state = state.replace(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss, "grad_norm": optax.global_norm(grads)}

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())
    rep, data = replicated(mesh), batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def run_qat(
    run_dir,
    train_batches,
    val_batches,
    out_dir=None,
    epochs: int = 5,
    steps_per_epoch: int = 100,
    learning_rate: float = 1e-5,
    multilabel: bool = False,
    mesh: Mesh | None = None,
    num_classes: int | None = None,
    seed: int = 0,
    batcher=None,
    monitor: str = "val_loss",
    act_fq: bool = False,
):
    """QAT fine-tuning orchestration (reference training/qat.py:171-306).

    Loads the best checkpoint from `run_dir`, verifies the class count
    against the data (reference qat.py:228-234), fine-tunes with the STE
    fake-quant step at a low LR with augmentation-free batches, and saves
    the result to `<run_dir>_qat` (or `out_dir`).

    Args:
        run_dir: Trained checkpoint directory.
        train_batches: Infinite (waveform [B, T], labels [B, C]) iterator,
            built WITHOUT mixup/SpecAugment (qat policy).
        val_batches: Zero-arg callable of a finite iterable of the same.
        num_classes: Expected class count from the dataset (checked).
        batcher: Optional device transform for the train feed — the CLI
            passes an augmentation-free int16-dequantizing batcher so QAT
            keeps the half-bandwidth feed (at flagship geometry the
            float32 stream is 2.7 GB/epoch of H2D, the dominant QAT cost
            on bandwidth-limited links). None = plain feature extraction.

    Returns:
        (best variables, history).
    """
    from pathlib import Path

    from birdnet_stm32_tpu.training.checkpoint import load_checkpoint
    from birdnet_stm32_tpu.training.trainer import train_model
    from birdnet_stm32_tpu.utils.logging import info

    run_dir = Path(run_dir)
    model, variables, cfg = load_checkpoint(run_dir, class_activation="none")
    if num_classes is not None and num_classes != cfg.num_classes:
        raise ValueError(
            f"QAT dataset has {num_classes} classes but the checkpoint was "
            f"trained with {cfg.num_classes}; QAT must use the same class set."
        )
    out_dir = Path(out_dir) if out_dir else run_dir.with_name(run_dir.name + "_qat")
    info("qat", f"fine-tuning {run_dir} -> {out_dir} (lr={learning_rate}, "
                f"{epochs}x{steps_per_epoch} steps, BN frozen)")
    return train_model(
        model, variables, cfg, train_batches, val_batches, out_dir,
        epochs=epochs, steps_per_epoch=steps_per_epoch,
        learning_rate=learning_rate, multilabel=multilabel,
        mesh=mesh, seed=seed, qat=True, qat_act=act_fq, batcher=batcher,
        monitor=monitor,
    )
