"""pjit-compiled train/eval/infer steps over a data-parallel mesh.

Replaces the reference's single-device `model.fit` hot loop
(training/trainer.py:176-185) with an explicitly sharded, donated,
XLA-compiled step: parameters/optimizer state replicated, batch sharded on
the `data` mesh axis, gradient all-reduce inserted by GSPMD over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import Mesh

from birdnet_stm32_tpu.parallel.mesh import batch_sharding, replicated


class TrainState(struct.PyTreeNode):
    """Carried training state: step, params, BN stats, optimizer state."""

    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation) -> "TrainState":
        params = variables["params"]
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=tx.init(params),
        )

    def variables(self) -> dict:
        out = {"params": self.params}
        if self.batch_stats:
            out["batch_stats"] = self.batch_stats
        return out


def _project_nonneg_mel_mixer(params):
    """Keras NonNeg-constraint parity for the hybrid mel mixer
    (reference models/frontend.py:121-129): clamp after each update."""
    fe = params.get("audio_frontend")
    if isinstance(fe, dict) and "mel_mixer" in fe:
        fe = dict(fe)
        fe["mel_mixer"] = jnp.maximum(fe["mel_mixer"], 0.0)
        params = dict(params)
        params["audio_frontend"] = fe
    return params


def conv_kernel_l2(params, coeff: float):
    """Keras-parity L2 kernel regularization: coeff * sum ||K||^2 over
    EXACTLY the kernels the reference regularizes — the stage blocks'
    depthwise (depthwise_regularizer, dscnn.py:59 / blocks.py:105),
    pointwise (dscnn.py:71), expand (blocks.py:93), and project
    (blocks.py:121) convs. Stem, emb, SE dense ('stageN_seM_expand' /
    'stageN_irM_se_expand' must NOT match the expand pattern), attention
    score, frontend, and the head carry no regularizer there."""
    import re

    block_kernel = re.compile(r"stage\d+_(ir|ds)\d+_(dw|pw|expand|project)$")
    total = 0.0
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        last = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if last == "kernel" and block_kernel.fullmatch(top):
            total = total + jnp.sum(jnp.square(leaf))
    return coeff * total


def freeze_mask(params, frontend_trainable: bool = True, freeze_bn: bool = False):
    """Boolean keep-mask over a param tree for frozen-subtree training.

    frontend_trainable=False zeroes the frontend subtree (reference builds
    those sublayers with trainable=False); freeze_bn=True zeroes every
    BN's gamma/beta (QAT: the reference sets trainable=False on the whole
    BatchNormalization layer, qat.py:142-158). Apply to both gradients and
    optimizer updates — decoupled weight decay moves params otherwise.
    """
    def mask(path, _):
        top = path[0].key if hasattr(path[0], "key") else str(path[0])
        if not frontend_trainable and top == "audio_frontend":
            return False
        if freeze_bn:
            for p in path:
                k = p.key if hasattr(p, "key") else str(p)
                if k.endswith("_bn") or k == "bn":
                    return False
        return True

    return jax.tree_util.tree_map_with_path(mask, params)


def frontend_freeze_mask(params, trainable: bool):
    """Back-compat wrapper over freeze_mask (frontend subtree only)."""
    return freeze_mask(params, frontend_trainable=trainable)


def make_train_step(
    model,
    tx: optax.GradientTransformation,
    loss_fn: Callable[[jax.Array, jax.Array], jax.Array],
    mesh: Mesh | None = None,
    frontend_trainable: bool = True,
    donate: bool = True,
    kernel_l2: float = 1e-4,
    compute_dtype: Any = None,
):
    """Build the jitted data-parallel training step.

    Args:
        model: DSCNN built with class_activation='none' (logit outputs).
        tx: optax optimizer.
        loss_fn: (logits, labels) -> scalar.
        mesh: Data-parallel mesh; None = single device.
        frontend_trainable: If False, audio_frontend gradients are zeroed.
        donate: Donate the state buffers (halves HBM traffic per step).
        kernel_l2: L2 coefficient on backbone conv kernels (reference
            default 1e-4; 0 disables).
        compute_dtype: Mixed precision (reference cli/train.py:299-301):
            e.g. jnp.bfloat16 runs the forward/backward in bf16 on the MXU
            while master params, the loss, the L2 term, and the optimizer
            stay float32 (the cast is in-graph, so gradients flow back to
            the f32 masters). None = full float32.

    Returns:
        step(state, x, y, rng) -> (state, metrics dict).
    """

    def _cast(tree, dtype):
        return jax.tree_util.tree_map(
            lambda a: a.astype(dtype)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree)

    def step(state: TrainState, x, y, rng):
        rng = jax.random.fold_in(rng, state.step)

        def compute_loss(params):
            p, bs, xx = params, state.batch_stats, x
            if compute_dtype is not None:
                # Params and inputs cast to bf16; batch_stats stay f32 so
                # the running-average EMA accumulates at full precision
                # (Keras mixed_bfloat16 keeps BN in f32 — an EMA increment
                # below the bf16 ULP would otherwise be dropped and the
                # stats would stall at ~0.4% resolution).
                p, xx = (_cast(t, compute_dtype) for t in (p, xx))
            out, updates = model.apply(
                {"params": p, "batch_stats": bs},
                xx, train=True, rngs={"dropout": rng}, mutable=["batch_stats"],
                freeze_frontend_bn=not frontend_trainable,
            )
            new_stats = updates["batch_stats"]
            if compute_dtype is not None:
                out = out.astype(jnp.float32)
                new_stats = _cast(new_stats, jnp.float32)
            loss = loss_fn(out, y)
            if kernel_l2 > 0:
                loss = loss + conv_kernel_l2(params, kernel_l2)
            return loss, (new_stats, out)

        (loss, (new_stats, logits)), grads = jax.value_and_grad(compute_loss, has_aux=True)(state.params)
        if not frontend_trainable:
            keep = frontend_freeze_mask(state.params, frontend_trainable)
            grads = jax.tree_util.tree_map(lambda g, k: g * k, grads, keep)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        if not frontend_trainable:
            # Also mask the updates: decoupled weight decay (adamw) would
            # otherwise still move the frozen frontend parameters.
            updates = jax.tree_util.tree_map(lambda u, k: u * k, updates, keep)
        params = optax.apply_updates(state.params, updates)
        params = _project_nonneg_mel_mixer(params)
        new_state = state.replace(
            step=state.step + 1, params=params, batch_stats=new_stats, opt_state=opt_state
        )
        metrics = {
            "loss": loss,
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    rep = replicated(mesh)
    data = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, data, data, rep),
        out_shardings=(rep, rep),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, loss_fn, mesh: Mesh | None = None, activation: str = "sigmoid"):
    """Jitted eval step: (state, x, y) -> (loss, scores)."""

    def step(state: TrainState, x, y):
        logits = model.apply(state.variables(), x, train=False)
        loss = loss_fn(logits, y)
        scores = jax.nn.sigmoid(logits) if activation == "sigmoid" else jax.nn.softmax(logits, axis=-1)
        return loss, scores

    if mesh is None:
        return jax.jit(step)
    rep, data = replicated(mesh), batch_sharding(mesh)
    return jax.jit(step, in_shardings=(rep, data, data), out_shardings=(rep, data))


def make_infer_fn(model, variables, mesh: Mesh | None = None, dtype=None):
    """Jitted batched inference: x -> scores, batch sharded over the mesh.

    dtype=jnp.bfloat16 casts the input to bf16 (variables are expected
    pre-cast by the caller); scores return float32.
    """

    @partial(jax.jit, static_argnames=())
    def infer(v, x):
        if dtype is not None:
            return model.apply(v, x.astype(dtype), train=False).astype(jnp.float32)
        return model.apply(v, x, train=False)

    if mesh is None:
        return lambda x: infer(variables, x)

    rep, data = replicated(mesh), batch_sharding(mesh)
    infer_sharded = jax.jit(infer, in_shardings=(rep, data), out_shardings=data)
    v = jax.device_put(variables, rep)
    return lambda x: infer_sharded(v, x)
