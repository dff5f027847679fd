"""Microbenchmark for the SAM encoder Pallas kernels and encoder stages.

Times each window/global attention variant plus the full encoder on the
current backend (bs8 SAM ViT-L geometry by default) so kernel work can be
measured, not guessed.  Usage::

    python scripts/kernel_bench.py [--bs 8] \\
        [--what window,global,encoder,wb,gb,boundary,tower,decoder,heads,window_path,rtt]

Prints one JSON line per measurement: {"op", "variant", "ms"}.
"""

from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters: int = 10, warmup: int = 2) -> float:
    """Time ``fn(*args)`` by chaining ``iters`` calls in ONE jitted graph.

    The relay backend can return from ``block_until_ready`` before compute
    finishes, so host-side loops under-measure.  Each iteration perturbs
    the first argument with a data-dependent epsilon from the previous
    output (CSE/elision-proof), and a scalar checksum is fetched at the
    end to serialise on true completion.
    """
    import numpy as np

    @jax.jit
    def many(*args):
        first, rest = args[0], args[1:]

        def body(_, x):
            out = fn(x, *rest)
            eps = jnp.sum(out[..., :1]).astype(first.dtype) * 1e-30
            return x + eps

        final = jax.lax.fori_loop(0, iters, body, first)
        return jnp.sum(fn(final, *rest))

    for _ in range(warmup):
        float(np.asarray(many(*args)))
    t0 = time.perf_counter()
    float(np.asarray(many(*args)))
    total = time.perf_counter() - t0
    return total / (iters + 1) * 1e3


def timeit_fetch(fn, x, *rest, iters: int = 5, warmup: int = 2) -> float:
    """bench.py-style timing for big subgraphs: one compile, distinct
    inputs per iteration (the relay memoizes identical dispatches), a
    scalar checksum fetched per iteration to serialise on completion."""
    import numpy as np

    jfn = jax.jit(lambda x, *r: jnp.sum(fn(x, *r)[..., :1]))
    xs = [x + 0.001 * (i + 1) for i in range(warmup + iters)]
    for xi in xs[:warmup]:
        float(np.asarray(jfn(xi, *rest)))
    t0 = time.perf_counter()
    for xi in xs[warmup:]:
        float(np.asarray(jfn(xi, *rest)))
    return (time.perf_counter() - t0) / iters * 1e3


def _kernel_fn(sam_flash, stem: str, name: str):
    """Resolve a kernel variant: production kernels live in ops.sam_flash,
    superseded bake-off variants in ops.sam_flash_experiments."""
    attr = stem + ("" if name == "v1" else f"_{name}")
    if hasattr(sam_flash, attr):
        return getattr(sam_flash, attr)
    from flmm_tpu.ops import sam_flash_experiments
    return getattr(sam_flash_experiments, attr)


def bench_window(bs: int, variants: list[str]):
    from flmm_tpu.ops import sam_flash

    side, hd, nh = 14, 64, 16
    grid, ws = 64, 14
    nw_per_img = ((grid + ws - 1) // ws) ** 2  # 25
    G = bs * nw_per_img * nh
    T = side * side
    key = jax.random.key(0)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (G, T, hd),
                                 jnp.bfloat16) for i in range(3))
    rh = jax.random.normal(jax.random.fold_in(key, 3), (2 * side - 1, hd),
                           jnp.bfloat16) * 0.02
    rw = jax.random.normal(jax.random.fold_in(key, 4), (2 * side - 1, hd),
                           jnp.bfloat16) * 0.02
    ref = None
    for name in variants:
        fn = _kernel_fn(sam_flash, "sam_window_attention", name)
        jfn = jax.jit(lambda q, k, v, f=fn: f(q, k, v, rh, rw, side))
        try:
            ms = timeit(jfn, q, k, v)
            out = np.asarray(jfn(q, k, v), np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            print(json.dumps({"op": "window", "variant": name,
                              "ms": round(ms, 2), "max_err_vs_v1": err}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"op": "window", "variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


def bench_global(bs: int, variants: list[str]):
    from flmm_tpu.ops import sam_flash

    side, hd, nh = 64, 64, 16
    G = bs * nh
    S = side * side
    key = jax.random.key(1)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i), (G, S, hd),
                                 jnp.bfloat16) for i in range(3))
    rh = jax.random.normal(jax.random.fold_in(key, 3), (2 * side - 1, hd),
                           jnp.bfloat16) * 0.02
    rw = jax.random.normal(jax.random.fold_in(key, 4), (2 * side - 1, hd),
                           jnp.bfloat16) * 0.02
    ref = None
    for name in variants:
        fn = _kernel_fn(sam_flash, "sam_global_attention", name)
        jfn = jax.jit(lambda q, k, v, f=fn: f(q, k, v, rh, rw, side))
        try:
            ms = timeit(jfn, q, k, v, iters=5)
            out = np.asarray(jfn(q, k, v), np.float32)
            if ref is None:
                ref = out
            err = float(np.max(np.abs(out - ref)))
            print(json.dumps({"op": "global", "variant": name,
                              "ms": round(ms, 2), "max_err_vs_v1": err}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"op": "global", "variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


def bench_encoder(bs: int, window_kernel: str, global_kernel: str):
    import dataclasses

    from flmm_tpu.configs.deepseek_vl import sam_vit_l
    from flmm_tpu.models.sam import image_encoder

    cfg = sam_vit_l().encoder
    cfg = dataclasses.replace(cfg, window_kernel=window_kernel,
                              global_kernel=global_kernel)
    params = image_encoder.init_params(cfg, jax.random.key(0))
    pixels = jax.random.normal(jax.random.key(1),
                               (bs, cfg.img_size, cfg.img_size, 3),
                               jnp.bfloat16)
    fn = lambda px, p: image_encoder.forward(p, cfg, px)
    ms = timeit_fetch(fn, pixels, params, iters=5)
    print(json.dumps({"op": "encoder", "variant":
                      f"w={window_kernel},g={global_kernel}",
                      "ms": round(ms, 2)}), flush=True)


def bench_wb(bs: int, depth: int = 12):
    """Window-only depth-limited SAM-L encoder: production flash path
    (v9 + three-kernel skeleton) vs the whole-block window path
    (ops/window_block.py).  Per-layer in-situ cost = ms / depth; also
    prints output agreement between the two paths."""
    import dataclasses

    import numpy as np

    from flmm_tpu.configs.deepseek_vl import sam_vit_l
    from flmm_tpu.models.sam import image_encoder

    base = sam_vit_l().encoder
    outs = {}
    # NB: window_block_fused defaults ON in sam_vit_l() since round 3;
    # the flash baseline must force it off or both variants are the
    # same path (betrayed by corr == 1.0 exactly).
    for name, over in (
            ("flash", {"window_block_fused": False}),
            ("whole_block", {"window_block_fused": True})):
        cfg = dataclasses.replace(base, depth=depth,
                                  global_attn_indexes=(), **over)
        params = image_encoder.init_params(cfg, jax.random.key(0))
        pixels = jax.random.normal(
            jax.random.key(1), (bs, cfg.img_size, cfg.img_size, 3),
            jnp.bfloat16) * 0.5
        fn = lambda px, p, c=cfg: image_encoder.forward(p, c, px)
        try:
            ms = timeit_fetch(fn, pixels, params, iters=5)
            outs[name] = np.asarray(jax.jit(fn)(pixels, params), np.float32)
            print(json.dumps({"op": "wb", "variant": name, "depth": depth,
                              "ms": round(ms, 2),
                              "ms_per_layer": round(ms / depth, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"op": "wb", "variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    if len(outs) == 2:
        a, b = outs["flash"], outs["whole_block"]
        corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        print(json.dumps({"op": "wb", "variant": "agreement",
                          "corr": round(corr, 6),
                          "max_abs_diff": float(np.max(np.abs(a - b))),
                          "scale": float(np.std(a))}), flush=True)


def bench_gb(bs: int, depth: int = 4):
    """Global-only depth-limited SAM-L encoder: dense XLA global blocks vs
    the whole-block fused global path (ops/global_block.py).  Per-layer
    in-situ cost = ms / depth; also prints output agreement."""
    import dataclasses

    import numpy as np

    from flmm_tpu.configs.deepseek_vl import sam_vit_l
    from flmm_tpu.models.sam import image_encoder

    base = sam_vit_l().encoder
    outs = {}
    for name, fused in (("dense", False), ("whole_block", True)):
        # the forward gate requires BOTH flags: use_wb (window_block_fused
        # + window-count + backend) arms the whole-block machinery, and
        # global_block_fused selects the fused global path within it
        cfg = dataclasses.replace(
            base, depth=depth, global_attn_indexes=tuple(range(depth)),
            window_block_fused=fused, global_block_fused=fused)
        params = image_encoder.init_params(cfg, jax.random.key(0))
        pixels = jax.random.normal(
            jax.random.key(1), (bs, cfg.img_size, cfg.img_size, 3),
            jnp.bfloat16) * 0.5
        fn = lambda px, p, c=cfg: image_encoder.forward(p, c, px)
        try:
            ms = timeit_fetch(fn, pixels, params, iters=5)
            outs[name] = np.asarray(jax.jit(fn)(pixels, params), np.float32)
            print(json.dumps({"op": "gb", "variant": name, "depth": depth,
                              "bs": bs, "ms": round(ms, 2),
                              "ms_per_layer": round(ms / depth, 2)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"op": "gb", "variant": name,
                              "error": f"{type(e).__name__}: {e}"[:300]}),
                  flush=True)
    if len(outs) == 2:
        a, b = outs["dense"], outs["whole_block"]
        corr = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
        print(json.dumps({"op": "gb", "variant": "agreement",
                          "corr": round(corr, 6),
                          "max_abs_diff": float(np.max(np.abs(a - b))),
                          "scale": float(np.std(a))}), flush=True)


def bench_boundary(bs: int):
    """Cost of one dewindowize+windowize round-trip at ViT-L 1024 geometry
    (the spatial<->window-major relayout the encoder pays around every
    global layer: 4 pairs per image).  In-graph chained, value-preserving
    (the chain carry is the relayouted tensor itself)."""
    from flmm_tpu.models.sam import image_encoder as enc

    C, ws, side = 1024, 14, 64
    x = jax.random.normal(jax.random.key(0), (bs, side, side, C),
                          jnp.bfloat16)

    def pair(x):
        xw, geom = enc._windowize(x, ws)
        return enc._dewindowize(xw + 0.0, geom, ws)

    ms = timeit(pair, x, iters=20)
    print(json.dumps({"op": "boundary", "variant": "xla dewin+win pair",
                      "bs": bs, "ms": round(ms, 3)}), flush=True)

    from flmm_tpu.ops import boundary as bnd

    def pair_pl(x):
        xw, geom = bnd.windowize(x, ws)
        return bnd.dewindowize(xw + 0.0, geom, ws)

    import numpy as np
    a = np.asarray(jax.jit(pair)(x), np.float32)
    b = np.asarray(jax.jit(pair_pl)(x), np.float32)
    ms = timeit(pair_pl, x, iters=20)
    print(json.dumps({"op": "boundary", "variant": "pallas dewin+win pair",
                      "bs": bs, "ms": round(ms, 3),
                      "max_abs_diff": float(np.max(np.abs(a - b)))}),
          flush=True)


def bench_tower(bs: int):
    """SigLIP-L/384 tower (the deepseek flagship's vision tower) total and
    attention-subgraph time, in-graph chained."""
    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.models.vision import vit

    cfg = deepseek_vl_1_3b().vision
    params = vit.init_params(cfg, jax.random.key(0))
    pixels = jax.random.normal(jax.random.key(1),
                               (bs, cfg.image_size, cfg.image_size, 3),
                               jnp.bfloat16)
    fn = lambda px, p: vit.forward(p, cfg, px)
    ms = timeit_fetch(fn, pixels, params, iters=5)
    print(json.dumps({"op": "tower", "variant": "total",
                      "ms": round(ms, 2)}), flush=True)

    # attention subgraph alone at tower geometry (S=729)
    S, nh, hd = cfg.seq_len, cfg.num_heads, cfg.head_dim
    key = jax.random.key(2)
    q, k, v = (jax.random.normal(jax.random.fold_in(key, i),
                                 (bs, nh, S, hd), jnp.bfloat16)
               for i in range(3))

    def attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32)
        p = jax.nn.softmax(s / jnp.sqrt(float(hd)), axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)

    ms = timeit_fetch(attn, q, k, v, iters=5)
    print(json.dumps({"op": "tower_attn", "variant": "xla",
                      "ms": round(ms, 2)}), flush=True)
    # padded to a 128-multiple sequence: does alignment change XLA's rate?
    Sp = (S + 127) // 128 * 128
    qp, kp, vp = (jnp.pad(t, ((0, 0), (0, 0), (0, Sp - S), (0, 0)))
                  for t in (q, k, v))
    ms = timeit_fetch(attn, qp, kp, vp, iters=5)
    print(json.dumps({"op": "tower_attn", "variant": "xla_pad128",
                      "ms": round(ms, 2)}), flush=True)


def bench_decoder(bs: int, seq_len: int = 672):
    """Frozen 1.3B decoder forward with capture-merge at bench geometry,
    XLA capture path (raw prompt layout) AND the flash-capture kernel
    (128-aligned layout, S=768/img_start=128)."""
    import dataclasses

    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.models.llm import decoder

    cfg_full = deepseek_vl_1_3b()
    M = 8

    def run_one(cfg, S, img_start, label):
        params = decoder.init_params(cfg, jax.random.key(0))
        key = jax.random.key(1)
        h = jax.random.normal(key, (bs, S, cfg.hidden_size), cfg.dtype)
        mask = jnp.ones((bs, S), bool)
        pos = jnp.broadcast_to(jnp.arange(S), (bs, S))
        merge = jax.nn.one_hot(
            jnp.arange(S) % M, M, dtype=jnp.float32) / (S / M)
        merge = jnp.broadcast_to(merge, (bs, S, M))

        def fn(h, p):
            out = decoder.forward_capture(
                p, cfg, h, mask, img_start=img_start,
                n_img=cfg_full.num_img_tokens,
                merge_matrix=merge, merge="mean", position_ids=pos)
            return out["attn"]

        try:
            ms = timeit_fetch(fn, h, params, iters=5)
            print(json.dumps({"op": "decoder", "variant": label,
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": "decoder", "variant": label,
                              "error": f"{type(e).__name__}: {e}"[:160]}),
                  flush=True)

    run_one(cfg_full.llm, seq_len, cfg_full.img_start,
            f"xla S={seq_len}")
    aligned = dataclasses.replace(cfg_full.llm, use_flash_capture=False)
    run_one(aligned, 768, 128, "xla S=768 aligned")
    flash = dataclasses.replace(cfg_full.llm, use_flash_capture=True)
    run_one(flash, 768, 128, "flash S=768 aligned")


def bench_window_path(bs: int):
    """Window-attention SUB-PATH comparison from the (B, H, W, 3C) qkv
    tensor: XLA partition/head-transposes + v9 kernel vs the spatial v10
    kernel (BlockSpec partition, in-kernel head slicing)."""
    from flmm_tpu.ops import sam_flash

    grid_hw, side, nh, hd = 64, 14, 16, 64
    C = nh * hd
    key = jax.random.key(0)
    qkv = jax.random.normal(key, (bs, grid_hw, grid_hw, 3 * C),
                            jnp.bfloat16) * 0.3
    rh = jax.random.normal(jax.random.fold_in(key, 1),
                           (2 * side - 1, hd), jnp.bfloat16) * 0.02
    rw = jax.random.normal(jax.random.fold_in(key, 2),
                           (2 * side - 1, hd), jnp.bfloat16) * 0.02

    def v9_path(qkv):
        B, H, W, C3 = qkv.shape
        ws = side
        pad_h = (ws - H % ws) % ws
        pad_w = (ws - W % ws) % ws
        qkvp = jnp.pad(qkv, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        Hp, Wp = H + pad_h, W + pad_w
        qkvw = qkvp.reshape(B, Hp // ws, ws, Wp // ws, ws, 3 * C)
        qkvw = qkvw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, 3 * C)
        nw = qkvw.shape[0]
        q, k, v = jnp.split(qkvw, 3, axis=-1)

        def heads(t):
            return t.reshape(nw, ws * ws, nh, hd).transpose(
                0, 2, 1, 3).reshape(nw * nh, ws * ws, hd)

        out = sam_flash.sam_window_attention_v9(
            heads(q), heads(k), heads(v), rh, rw, ws)
        out = out.reshape(nw, nh, ws * ws, hd).transpose(0, 2, 1, 3)
        out = out.reshape(B, Hp // ws, Wp // ws, ws, ws, C)
        out = out.transpose(0, 1, 3, 2, 4, 5).reshape(B, Hp, Wp, C)
        return out[:, :H, :W]

    from flmm_tpu.ops import sam_flash_experiments as sfx
    perm = sfx.qkv_head_major_perm(nh, hd)

    def v10_path(qkv):
        B, H, W, C3 = qkv.shape
        ws = side
        Hp = (H + ws - 1) // ws * ws
        # head-major relayout rides the (cheap) pad; in the encoder the
        # wqkv columns are permuted instead, making this free
        qkvp = jnp.pad(qkv[..., perm],
                       ((0, 0), (0, Hp - H), (0, Hp - W), (0, 0)))
        out = sfx.sam_window_attention_v10(qkvp, rh, rw, ws, H)
        return out[:, :H, :W]

    for name, fn in (("v9_path", v9_path), ("v10_path", v10_path)):
        try:
            ms = timeit(jax.jit(fn), qkv)
            print(json.dumps({"op": "window_path", "variant": name,
                              "ms": round(ms, 2)}), flush=True)
        except Exception as e:
            print(json.dumps({"op": "window_path", "variant": name,
                              "error": f"{type(e).__name__}: {e}"[:200]}),
                  flush=True)


def bench_heads(bs: int):
    """U-Net + SAM prompt/mask-decoder heads at bench geometry (the
    ~5% tail of the pipeline): coarse maps -> UNet -> refine."""
    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.models.frozen import deepseek_vl as model
    from flmm_tpu.models.frozen.grounding import heads_forward
    from flmm_tpu.data.synthetic import synthetic_batch

    cfg = deepseek_vl_1_3b()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(
        cfg, batch_size=bs, seq_len=672, max_masks=8,
        text_tokens_per_mask=12))
    M = 8
    g = cfg.clip_shape
    maps = jax.random.normal(
        jax.random.key(1), (bs * M, g, g, cfg.unet.in_channels),
        jnp.float32) * 0.1
    hidden = jax.random.normal(
        jax.random.key(2), (bs, 672, cfg.llm.hidden_size), jnp.float32)

    def fn(maps, params, batch):
        out = heads_forward(params, cfg, maps, hidden, batch)
        return out["sam_logits"]

    ms = timeit_fetch(fn, maps, params, batch, iters=5)
    print(json.dumps({"op": "heads", "variant": "unet+sam",
                      "ms": round(ms, 2)}), flush=True)


def bench_rtt():
    """Fetch round-trip floor: a trivial op timed the same way."""
    x = jnp.ones((8, 8), jnp.float32)
    ms = timeit_fetch(lambda x: x * 2.0, x, iters=10)
    print(json.dumps({"op": "rtt_floor", "ms": round(ms, 2)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--what", default="window,global")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--window-variants", default="v1,v6,v7")
    ap.add_argument("--global-variants", default="v3,v6")
    ap.add_argument("--window-kernel", default="v6")
    ap.add_argument("--global-kernel", default="v6")
    args = ap.parse_args()
    what = args.what.split(",")
    if "window" in what:
        bench_window(args.bs, args.window_variants.split(","))
    if "global" in what:
        bench_global(args.bs, args.global_variants.split(","))
    if "encoder" in what:
        bench_encoder(args.bs, args.window_kernel, args.global_kernel)
    if "wb" in what:
        bench_wb(args.bs, depth=args.depth)
    if "gb" in what:
        bench_gb(args.bs, depth=min(args.depth, 6))
    if "boundary" in what:
        bench_boundary(args.bs)
    if "tower" in what:
        bench_tower(args.bs)
    if "decoder" in what:
        bench_decoder(args.bs)
    if "window_path" in what:
        bench_window_path(args.bs)
    if "heads" in what:
        bench_heads(args.bs)
    if "rtt" in what:
        bench_rtt()


if __name__ == "__main__":
    main()
