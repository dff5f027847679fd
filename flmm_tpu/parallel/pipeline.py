"""Pipeline parallelism for the frozen decoder (GPipe schedule).

The reference scales the frozen LMM with DeepSpeed ZeRO over NCCL; the
TPU-native alternative for models whose layer stack outgrows one chip's
HBM is pipeline parallelism over the ICI ring: shard the *layer* axis of
the scan-stacked decoder weights over a mesh axis, split the batch into
microbatches, and stream activations stage-to-stage with ``ppermute``
(the scaling-book recipe — XLA turns each hop into a single ICI send).

Schedule: classic GPipe.  With ``n_stages`` stages and ``M`` microbatches
the loop runs ``M + n_stages - 1`` ticks; at tick ``t`` stage ``s``
processes microbatch ``t - s`` (bubble ticks compute on garbage and are
masked out when results are stored).  The captured attention maps stay
resident on the stage that produced them (output sharded over the layer
axis); the layer-weighted hidden sum rides the pipeline alongside the
residual stream, so it is complete when a microbatch exits the last
stage.

The decoder never trains in F-LMM (reference frozen_llava.py:104-108), so
the forward-only schedule is the whole story — no backward interleave
needed.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flmm_tpu.models.llm import decoder as dec


def _index_mb(tree, i, m):
    """Microbatch ``i`` (clamped to [0, m)) of every leaf's leading axis."""
    i = jnp.clip(i, 0, m - 1)
    return jax.tree.map(
        lambda a: jax.lax.dynamic_index_in_dim(a, i, 0, keepdims=False), tree)


def pipeline_forward_capture(
    params,
    cfg: dec.DecoderConfig,
    inputs_embeds: jnp.ndarray,
    attention_mask: jnp.ndarray,
    img_start: int,
    n_img: int,
    *,
    mesh: Mesh,
    axis: str = "model",
    n_microbatches: int = 2,
    merge_matrix: jnp.ndarray | None = None,
    merge: str = "mean",
    layer_weights: jnp.ndarray | None = None,
    position_ids: jnp.ndarray | None = None,
) -> dict:
    """``decoder.forward_capture`` under a GPipe pipeline over ``axis``.

    Requirements: ``cfg.num_layers`` divisible by the stage count,
    batch divisible by ``n_microbatches``.  Returns the same dict as
    ``forward_capture`` (``attn`` arrives sharded over layers on the
    stage axis; ``hidden``/``last_hidden`` replicated).
    """
    B, S, D = inputs_embeds.shape
    L = cfg.num_layers
    n_stages = mesh.shape[axis]
    M = n_microbatches
    assert L % n_stages == 0, (L, n_stages)
    assert B % M == 0, (B, M)
    mb = B // M

    h = inputs_embeds.astype(cfg.dtype)
    if cfg.embed_scale:
        h = h * jnp.asarray(jnp.sqrt(float(cfg.hidden_size)), cfg.dtype)

    if position_ids is None:
        position_ids = jnp.broadcast_to(jnp.arange(S)[None], (B, S))
    aux = dec.capture_aux(cfg, attention_mask, position_ids, S, merge_matrix)

    if layer_weights is None:
        layer_weights = jnp.zeros((L,), jnp.float32)
    scan_weights = layer_weights.at[L - 1].set(0.0)

    flash_ok = dec.flash_capture_ok(cfg, merge_matrix, merge, S, img_start,
                                    n_img)

    def split(tree):
        return jax.tree.map(
            lambda a: a.reshape(M, mb, *a.shape[1:]), tree)

    embeds_mb = split(h)          # (M, mb, S, D)
    aux_mb = split(aux)           # each leaf (M, mb, ...)

    layer_spec = jax.tree.map(lambda _: P(axis), params["layers"])
    rep = jax.tree.map(lambda _: P(), (embeds_mb, aux_mb))

    def stage_fn(local_layers, weights, embeds_mb, aux_mb):
        sidx = jax.lax.axis_index(axis)
        T = M + n_stages - 1
        # weights arrive replicated and are sliced per stage: sharding a
        # (tiny) jit-trace constant over the stage axis miscompiles on
        # jax 0.9 (the constant is folded with the wrong layout)
        local_w = jax.lax.dynamic_slice_in_dim(
            weights, sidx * (L // n_stages), L // n_stages)

        def run_stack(h_in, acc_in, aux_t):
            def body(carry, xs):
                h, acc = carry
                lp, w_l = xs
                h, acc, side = dec.layer_step(
                    lp, w_l, h, acc, aux_t, cfg, img_start, n_img, merge,
                    flash_ok)
                return (h, acc), side
            (h_out, acc_out), sides = jax.lax.scan(
                body, (h_in, acc_in), (local_layers, local_w))
            return h_out, acc_out, sides  # sides (L_local, mb, ...)

        # per-layer captured side shape (f32 on every capture path)
        kdim = merge_matrix.shape[-1] if merge_matrix is not None else S
        side_shape = (L // n_stages, mb, cfg.num_heads, kdim, n_img)

        # the carries are device-varying from tick 1 on; typing the zero
        # inits as varying keeps the vma checker (and XLA) honest
        def vary(x):
            return jax.lax.pcast(x, (axis,), to="varying")

        state_h = vary(jnp.zeros((mb, S, D), cfg.dtype))
        state_acc = vary(jnp.zeros((mb, S, D), jnp.float32))
        sides_buf = vary(jnp.zeros((M, *side_shape), jnp.float32))
        out_h = vary(jnp.zeros((M, mb, S, D), cfg.dtype))
        out_acc = vary(jnp.zeros((M, mb, S, D), jnp.float32))

        def tick(carry, t):
            state_h, state_acc, sides_buf, out_h, out_acc = carry
            mb_i = t - sidx
            # stage 0 injects a fresh microbatch each tick
            inj = _index_mb(embeds_mb, t, M)
            h_in = jnp.where(sidx == 0, inj, state_h)
            acc_in = jnp.where(sidx == 0,
                               jnp.zeros_like(state_acc), state_acc)
            aux_t = _index_mb(aux_mb, mb_i, M)
            h_out, acc_out, sides = run_stack(h_in, acc_in, aux_t)

            ok = (mb_i >= 0) & (mb_i < M)
            j = jnp.clip(mb_i, 0, M - 1)
            sides_buf = sides_buf.at[j].set(
                jnp.where(ok, sides, sides_buf[j]))
            last = ok & (sidx == n_stages - 1)
            out_h = out_h.at[j].set(jnp.where(last, h_out, out_h[j]))
            out_acc = out_acc.at[j].set(jnp.where(last, acc_out, out_acc[j]))

            # stream to the next stage (one ICI hop on hardware)
            perm = [(i, i + 1) for i in range(n_stages - 1)]
            nxt_h = jax.lax.ppermute(h_out, axis, perm)
            nxt_acc = jax.lax.ppermute(acc_out, axis, perm)
            return (nxt_h, nxt_acc, sides_buf, out_h, out_acc), None

        carry = (state_h, state_acc, sides_buf, out_h, out_acc)
        carry, _ = jax.lax.scan(tick, carry, jnp.arange(T))
        _, _, sides_buf, out_h, out_acc = carry

        # stack per-stage output buffers; the caller reads the last stage's
        # (avoids replication bookkeeping across the collective)
        return sides_buf, out_h[None], out_acc[None]

    sides, out_h, out_acc = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(layer_spec, P(), *rep),
        out_specs=(P(None, axis), P(axis), P(axis)),
        check_vma=True,
    )(params["layers"], scan_weights, embeds_mb, aux_mb)

    # (M, L, mb, ...) -> (B, L, ...); stream buffers: last stage only
    sides = jnp.moveaxis(sides, 2, 1).reshape(B, L, *sides.shape[3:])
    h_final = out_h[-1].reshape(B, S, D)
    acc = out_acc[-1].reshape(B, S, D)

    last_hidden = dec.rms_norm(
        h_final, params["final_norm"], cfg.rms_eps, cfg.gemma_norm)
    hidden = acc + layer_weights[L - 1] * jax.lax.stop_gradient(
        last_hidden).astype(jnp.float32)
    return {"attn": sides, "hidden": hidden, "last_hidden": last_hidden}
