"""Device mesh and sharding rules.

Replaces the reference's NCCL/DeepSpeed/accelerate layer (SURVEY.md
section 2.6) with a single ``Mesh(('data', 'model'))``:

* batches shard over 'data' (== DDP / accelerate split_between_processes);
* the frozen decoder and SAM encoder weights shard over 'model'
  (megatron-style: attention heads and FFN columns) so 7B-class LMMs fit
  per-chip HBM on small slices;
* optimizer state shards with its parameters (== ZeRO-2's effect, obtained
  structurally via pjit rather than a runtime).

XLA inserts the grad psum / all-gathers; there is no hand-written
collective in the training path.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None, n_model: int = 1, devices=None
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model <= n, (n_data, n_model, n)
    arr = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(arr, ("data", "model"))


# ---------------------------------------------------------------------------
# Sharding rules: map param-tree paths to PartitionSpecs.
# ---------------------------------------------------------------------------

_DECODER_RULES = {
    # stacked decoder layers: (L, in, out)
    "wq": P(None, None, "model"),
    "wk": P(None, None, "model"),
    "wv": P(None, None, "model"),
    "wo": P(None, "model", None),
    "w_gate": P(None, None, "model"),
    "w_up": P(None, None, "model"),
    "w_down": P(None, "model", None),
    "bq": P(None, "model"),
    "bk": P(None, "model"),
    "bv": P(None, "model"),
    "embed": P(None, None),
    "lm_head": P(None, "model"),
}

# MoE decoders (Mixtral): experts shard over the model axis -- expert
# parallelism; the dense-compute MoE contracts locally per expert shard and
# XLA reduces the gated sum.
_MOE_RULES = {
    "w_gate": P(None, "model", None, None),
    "w_up": P(None, "model", None, None),
    "w_down": P(None, "model", None, None),
    "router": P(None, None, None),
}

_SAM_ENC_RULES = {
    # per-block linears: (in, out)
    "wqkv": P(None, "model"),
    "wo": P("model", None),
    "w1": P(None, "model"),
    "w2": P("model", None),
    "b1": P("model",),
    "bqkv": P("model",),
}


def _spec_for(path: tuple, leaf: Any) -> P:
    names = [p.key for p in path if hasattr(p, "key")]
    in_decoder = "llm" in names
    in_sam_enc = "sam_encoder" in names
    key = names[-1] if names else ""
    if in_decoder and key in _MOE_RULES and getattr(leaf, "ndim", 0) == len(
            _MOE_RULES[key]):
        return _MOE_RULES[key]
    if in_decoder and key in _DECODER_RULES and getattr(
            leaf, "ndim", 0) == len(_DECODER_RULES[key]):
        return _DECODER_RULES[key]
    if in_sam_enc and key in _SAM_ENC_RULES:
        spec = _SAM_ENC_RULES[key]
        if getattr(leaf, "ndim", 0) == len(spec):
            return spec
    return P()  # replicate


def _fsdp_spec_for(path: tuple, leaf: Any, n_model: int = 1) -> P:
    """FSDP/ZeRO-3-style: shard the stacked layer axis of decoder weights
    over 'model' -- each device stores 1/n of every layer stack and XLA
    all-gathers the active layer inside the scan.  Memory-optimal for
    fitting 7B-class frozen decoders on small slices."""
    names = [p.key for p in path if hasattr(p, "key")]
    key = names[-1] if names else ""
    if "llm" in names and key in (
            "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down",
            "ln1", "ln2", "bq", "bk", "bv", "router"):
        nd = getattr(leaf, "ndim", 0)
        if nd >= 2 and leaf.shape[0] % n_model == 0:
            return P(*(["model"] + [None] * (nd - 1)))
    if key in ("embed", "lm_head") and getattr(leaf, "ndim", 0) == 2 \
            and leaf.shape[1] % n_model == 0:
        return P(None, "model")
    return P()


def param_shardings(mesh: Mesh, params: Any, mode: str = "tp") -> Any:
    """NamedShardings for a model param tree (frozen or full).

    mode='tp': megatron-style head/FFN column sharding (compute-parallel).
    mode='fsdp': layer-stack sharding (weight-memory-parallel, ZeRO-3-like).
    """
    if mode == "tp":
        spec_fn = _spec_for
    else:
        n_model = mesh.shape["model"]
        spec_fn = lambda path, leaf: _fsdp_spec_for(path, leaf, n_model)
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, spec_fn(path, leaf)), params
    )


def batch_shardings(mesh: Mesh, batch: Any) -> Any:
    """Shard every batch leaf over 'data' on axis 0."""
    return jax.tree_util.tree_map(
        lambda x: NamedSharding(mesh, P("data", *([None] * (x.ndim - 1)))),
        batch,
    )


def replicated(mesh: Mesh, tree: Any) -> Any:
    return jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), tree
    )
