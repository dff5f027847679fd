"""Orbax checkpointing of trainable state only.

Mirrors the reference's trainable-only checkpoints: ``CustomRunner.
save_checkpoint`` persists just ``requires_grad`` params + optimizer +
scheduler (flmm/runner.py:131-172) and ``SAMWrapper.state_dict`` drops the
frozen SAM image encoder (mask_refiner.py:126-128).  Frozen weights are
re-materialised from the upstream HF/SAM checkpoints at load time.
"""

from __future__ import annotations

import logging
import pathlib
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


def save(path: str | pathlib.Path, state: Any) -> None:
    path = pathlib.Path(path).absolute()
    if path.exists():
        # overwrite rather than crash: re-running into an existing workdir
        # (or resuming past a previously-saved step) is routine -- but a
        # job mispointed at an old workdir destroys good checkpoints, so
        # make the deletion visible
        logger.warning("checkpoint %s exists; overwriting", path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def restore(path: str | pathlib.Path, template: Any) -> Any:
    """Restore into the structure/shardings of ``template``."""
    path = pathlib.Path(path).absolute()
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, abstract)


def restore_trainable(path: str | pathlib.Path, cfg, trainable: Any) -> Any:
    """Restore the trainable tree from either checkpoint flavour.

    Dispatches on the path: a torch file suffix (``.pth``/``.bin``/
    ``.pt``/``.safetensors``) goes through the released-F-LMM-checkpoint
    bridge (:func:`flmm_tpu.convert.load.reference_trained`, the exact
    ``requires_grad`` set the reference runner saves, flmm/runner.py:
    131-139); anything else is an Orbax train-state directory saved by
    our own trainer.  Shared by the eval/demo/CoT CLIs so ``--trained``
    accepts a released checkpoint directly."""
    import jax.numpy as jnp

    if str(path).endswith((".pth", ".bin", ".pt", ".safetensors")):
        from flmm_tpu.convert import load as conv

        return jax.tree.map(jnp.asarray, conv.reference_trained(str(path), cfg))
    from flmm_tpu.train import loop as train_loop

    opt = train_loop.make_optimizer(train_loop.OptimConfig())
    state = train_loop.init_state(trainable, opt)
    return restore(path, state)["params"]


def latest(dirpath: str | pathlib.Path) -> pathlib.Path | None:
    """Find the newest ``step_*`` checkpoint in a directory (auto-resume,
    reference flmm/runner.py:25-29)."""
    d = pathlib.Path(dirpath)
    if not d.exists():
        return None
    steps = sorted(
        (p for p in d.iterdir() if p.name.startswith("step_")),
        key=lambda p: int(p.name.split("_")[1]),
    )
    return steps[-1] if steps else None
