"""Training loop: optax AdamW + warmup-cosine, sharded train step, Orbax.

Reproduces the reference recipe (configs/deepseek_vl/...py:26-40,181-207):
AdamW lr 1e-4 betas (0.9, 0.999) wd 0.01, grad-clip 1.0, LinearLR warmup
over 3% of training then cosine to 0, bf16 compute.  DeepSpeed ZeRO-2 /
NCCL DDP are replaced by a jitted step over a ``Mesh('data','model')``
with XLA-inserted collectives; optimizer state lives sharded with its
parameters.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from flmm_tpu.parallel import mesh as mesh_lib


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    lr: float = 1e-4
    betas: tuple = (0.9, 0.999)
    weight_decay: float = 0.01
    max_grad_norm: float = 1.0
    warmup_ratio: float = 0.03
    total_steps: int = 10000
    warmup_start_factor: float = 1e-5


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    warmup_steps = max(1, int(cfg.warmup_ratio * cfg.total_steps))
    warmup = optax.linear_schedule(
        cfg.lr * cfg.warmup_start_factor, cfg.lr, warmup_steps
    )
    cosine = optax.cosine_decay_schedule(
        cfg.lr, max(1, cfg.total_steps - warmup_steps)
    )
    return optax.join_schedules([warmup, cosine], [warmup_steps])


def _trainable_mask(params) -> Any:
    """False for leaves that are frozen buffers in the reference: SAM's
    ``pe_gaussian`` random-Fourier matrix is a register_buffer (reference
    segment_anything prompt_encoder.py:181), so AdamW must neither update
    nor weight-decay it (its gradient is already stopped at use;
    models/sam/prompt_encoder._pe_encode)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: (
            "freeze" if "pe_gaussian" in jax.tree_util.keystr(path)
            else "train"
        ),
        params,
    )


def make_optimizer(cfg: OptimConfig) -> optax.GradientTransformation:
    return optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.multi_transform(
            {
                "train": optax.adamw(
                    make_schedule(cfg), b1=cfg.betas[0], b2=cfg.betas[1],
                    weight_decay=cfg.weight_decay,
                ),
                "freeze": optax.set_to_zero(),
            },
            _trainable_mask,
        ),
    )


def init_state(trainable: Any, opt: optax.GradientTransformation) -> dict:
    return {
        "step": jnp.zeros((), jnp.int32),
        "params": trainable,
        "opt_state": opt.init(trainable),
    }


def make_train_step(
    loss_fn: Callable,
    opt: optax.GradientTransformation,
) -> Callable:
    """Build a pure ``(state, frozen, batch) -> (state, metrics)`` step.

    ``loss_fn(params, batch) -> (loss, metrics)`` with
    ``params = {'frozen':..., 'trainable':...}``.
    """

    def step(state, frozen, batch):
        def lf(trainable):
            return loss_fn({"frozen": frozen, "trainable": trainable}, batch)

        (loss, metrics), grads = jax.value_and_grad(lf, has_aux=True)(
            state["params"]
        )
        updates, opt_state = opt.update(
            grads, state["opt_state"], state["params"]
        )
        params = optax.apply_updates(state["params"], updates)
        new_state = {
            "step": state["step"] + 1,
            "params": params,
            "opt_state": opt_state,
        }
        metrics = dict(metrics)
        metrics["grad_norm"] = optax.global_norm(grads)
        return new_state, metrics

    return step


def jit_train_step(
    loss_fn: Callable,
    opt: optax.GradientTransformation,
    mesh,
    state: Any,
    frozen: Any,
    batch_example: Any,
    frozen_mode: str = "tp",
) -> Callable:
    """jit the train step with explicit shardings over the mesh.

    ``frozen_mode``: 'tp' (megatron column sharding) or 'fsdp'
    (layer-stack weight sharding); must match how the frozen tree was
    device_put.
    """
    step = make_train_step(loss_fn, opt)
    state_sh = {
        "step": mesh_lib.replicated(mesh, state["step"]),
        "params": mesh_lib.replicated(mesh, state["params"]),
        "opt_state": mesh_lib.replicated(mesh, state["opt_state"]),
    }
    frozen_sh = mesh_lib.param_shardings(mesh, frozen, mode=frozen_mode)
    batch_sh = mesh_lib.batch_shardings(mesh, batch_example)
    return jax.jit(
        step,
        in_shardings=(state_sh, frozen_sh, batch_sh),
        donate_argnums=(0,),
    )
