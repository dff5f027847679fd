"""Isolate the per-piece cost of the SAM encoder block at bs8 ViT-L
geometry: fused_ln_qkv / fused_proj_ln_mlp / fused_ln_mlp vs their XLA
equivalents, plus the window core alone."""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from scripts.kernel_bench import timeit_fetch  # noqa: E402


def main():
    from flmm_tpu.models.sam.common import layer_norm, mlp_block
    from flmm_tpu.ops.fused_block import (
        fused_ln_mlp, fused_ln_qkv, fused_proj_ln_mlp,
    )

    N, C, F = 8 * 64 * 64, 1024, 4096
    key = jax.random.key(0)
    x = jax.random.normal(key, (N, C), jnp.bfloat16)
    attn = jax.random.normal(jax.random.fold_in(key, 1), (N, C), jnp.bfloat16)
    p = {
        "ln_w": jnp.ones((C,), jnp.bfloat16),
        "ln_b": jnp.zeros((C,), jnp.bfloat16),
        "wqkv": jax.random.normal(jax.random.fold_in(key, 2), (C, 3 * C),
                                  jnp.bfloat16) * 0.02,
        "bqkv": jnp.zeros((3 * C,), jnp.bfloat16),
        "wo": jax.random.normal(jax.random.fold_in(key, 3), (C, C),
                                jnp.bfloat16) * 0.02,
        "bo": jnp.zeros((C,), jnp.bfloat16),
        "w1": jax.random.normal(jax.random.fold_in(key, 4), (C, F),
                                jnp.bfloat16) * 0.02,
        "b1": jnp.zeros((F,), jnp.bfloat16),
        "w2": jax.random.normal(jax.random.fold_in(key, 5), (F, C),
                                jnp.bfloat16) * 0.02,
        "b2": jnp.zeros((C,), jnp.bfloat16),
    }

    cases = {
        "ln_qkv_fused": lambda x, p: fused_ln_qkv(
            x, p["ln_w"], p["ln_b"], p["wqkv"], p["bqkv"]),
        "ln_qkv_xla": lambda x, p: layer_norm(
            x, p["ln_w"], p["ln_b"], 1e-6) @ p["wqkv"] + p["bqkv"],
        "proj_ln_mlp_fused": lambda x, p: fused_proj_ln_mlp(
            x, attn, p["wo"], p["bo"], p["ln_w"], p["ln_b"],
            p["w1"], p["b1"], p["w2"], p["b2"]),
        "proj_ln_mlp_xla": lambda x, p: (
            lambda xr: xr + mlp_block(
                layer_norm(xr, p["ln_w"], p["ln_b"], 1e-6),
                {"w1": p["w1"], "b1": p["b1"], "w2": p["w2"], "b2": p["b2"]})
        )(x + attn @ p["wo"] + p["bo"]),
        "ln_mlp_fused": lambda x, p: fused_ln_mlp(
            x, p["ln_w"], p["ln_b"], p["w1"], p["b1"], p["w2"], p["b2"]),
        "ln_mlp_xla": lambda x, p: x + mlp_block(
            layer_norm(x, p["ln_w"], p["ln_b"], 1e-6),
            {"w1": p["w1"], "b1": p["b1"], "w2": p["w2"], "b2": p["b2"]}),
    }
    for name, fn in cases.items():
        try:
            ms = timeit_fetch(fn, x, p, iters=10)
            print(json.dumps({"op": name, "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": name,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)


if __name__ == "__main__":
    main()
