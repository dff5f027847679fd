"""Gradient + optimizer-step parity vs torch autograd (VERDICT r4 item 2).

Training from scratch means gradient correctness IS the product: a
BCE+Dice sign or reduction slip would pass every forward-parity test and
silently cap cIoU.  These tests transcribe the reference training step in
torch (losses flmm/models/frozen_llava.py:70-85,167-217; refine chain
flmm/models/mask_head/mask_refiner.py:71-124; trainable text path
frozen_llava.py:35-42,92-94,134-139) at tiny-spatial / full-channel
dimensions, load IDENTICAL weights and batches on both sides, and compare
``d(loss)/d(every trainable tensor)`` elementwise, plus one AdamW +
grad-clip update against optax.

Weight-layout note: the checkpoint converters
(convert/sam_weights.py, convert/load.unet_params) are pure relayouts
(transpose / flip / concat), so running the TORCH GRADIENTS through the
same converters yields the gradients in our param-tree layout -- no
per-tensor mapping table needed.

Tolerances: everything runs in f32 on CPU; the two frameworks reduce in
different orders, so per-tensor max relative error is compared against
5e-4 (attention/softmax chains) and 1e-5 (pure loss reductions).
"""

from __future__ import annotations

import pathlib
import sys

import numpy as np
import pytest
import torch
import torch.nn.functional as tF

import jax
import jax.numpy as jnp

from tests.conftest import reference_available

SCRIPTS = pathlib.Path(__file__).resolve().parent.parent / "scripts"
if str(SCRIPTS) not in sys.path:
    sys.path.insert(0, str(SCRIPTS))


# --------------------------------------------------------------------
# torch transcription of the reference loss semantics
# --------------------------------------------------------------------

def mmdet_bce(pred: torch.Tensor, tgt: torch.Tensor) -> torch.Tensor:
    """mmdet CrossEntropyLoss(use_sigmoid=True, reduction='mean') with
    avg_factor = pred.numel() (reference frozen_llava.py:75-78)."""
    return tF.binary_cross_entropy_with_logits(
        pred.reshape(-1), tgt.reshape(-1), reduction="mean")


def mmdet_naive_dice(pred: torch.Tensor, tgt: torch.Tensor,
                     eps: float = 1.0) -> torch.Tensor:
    """mmdet DiceLoss(naive_dice=True, activate=True, eps=1.0) with
    avg_factor = mask count (reference frozen_llava.py:71-74; config
    configs/deepseek_vl/...refcoco_png.py:78-85)."""
    m = pred.shape[0]
    p = pred.sigmoid().reshape(m, -1)
    t = tgt.reshape(m, -1)
    num = 2.0 * (p * t).sum(-1)
    den = p.sum(-1) + t.sum(-1)
    return (1.0 - (num + eps) / (den + eps)).mean()


def reference_compute_loss(per_sample):
    """frozen_llava.py:167-217: accumulate both heads' losses over samples
    weighted by mask count, divide by the total mask count.

    ``per_sample``: list of dicts with cropped 'coarse'/'gt_coarse' and
    'sam'/'gt_sam' tensors of shape (m_s, h, w).
    """
    cnt = 0
    acc = {k: 0.0 for k in ("loss_mask", "loss_dice",
                            "sam_loss_mask", "sam_loss_dice")}
    for s in per_sample:
        m = s["coarse"].shape[0]
        cnt += m
        acc["loss_dice"] = acc["loss_dice"] + m * mmdet_naive_dice(
            s["coarse"], s["gt_coarse"])
        acc["loss_mask"] = acc["loss_mask"] + m * mmdet_bce(
            s["coarse"], s["gt_coarse"])
        acc["sam_loss_dice"] = acc["sam_loss_dice"] + m * mmdet_naive_dice(
            s["sam"], s["gt_sam"])
        acc["sam_loss_mask"] = acc["sam_loss_mask"] + m * mmdet_bce(
            s["sam"], s["gt_sam"])
    return {k: v / cnt for k, v in acc.items()}


def rel_err(got: np.ndarray, want: np.ndarray) -> float:
    got = np.asarray(got, np.float64)
    want = np.asarray(want, np.float64)
    scale = max(np.abs(want).max(), 1e-8)
    return float(np.abs(got - want).max() / scale)


def tree_rel_errs(got_tree, want_tree, skip=()):
    """Leaf-wise max relative error; returns {path: err}.

    The per-leaf scale is floored at 1e-3 of the largest gradient in the
    whole tree: some tensors' true gradients are ~0 (e.g. attention
    key-projection biases -- softmax is shift-invariant per query, so a
    key bias shifts every score of a query equally and cancels), where
    both frameworks produce pure rounding noise and a per-tensor relative
    error is meaningless."""
    flat_g = jax.tree_util.tree_flatten_with_path(got_tree)[0]
    flat_w = jax.tree_util.tree_flatten_with_path(want_tree)[0]
    assert len(flat_g) == len(flat_w)
    gmax = max(float(np.abs(np.asarray(w)).max()) for _, w in flat_w)
    errs = {}
    for (pg, g), (pw, w) in zip(flat_g, flat_w):
        path = jax.tree_util.keystr(pg)
        assert path == jax.tree_util.keystr(pw)
        if any(s in path for s in skip):
            continue
        g = np.asarray(g, np.float64)
        w = np.asarray(w, np.float64)
        scale = max(np.abs(w).max(), 1e-3 * gmax, 1e-8)
        errs[path] = float(np.abs(g - w).max() / scale)
    return errs


# --------------------------------------------------------------------
# 1. loss value + d(loss)/d(logits) parity
# --------------------------------------------------------------------

def test_loss_grad_parity_vs_torch_transcription():
    """grounding_losses (padded frame + weight maps) vs the reference's
    per-sample cropped-tensor loop: loss values AND input gradients must
    match, including heterogeneous mask counts (sample weighting by mask
    count == flat averaging over valid masks) and zero gradient on padded
    pixels/masks."""
    from flmm_tpu.models.frozen.base import grounding_losses

    rng = np.random.default_rng(0)
    B, M, Hc, Wc, P = 2, 3, 14, 17, 20
    m_counts = [3, 1]
    crops = [(2, 3, 10, 14), (0, 5, 8, 11)]   # y0, x0, h, w (coarse)
    sam_valid = [(20, 16), (14, 20)]          # (h, w) in the SAM frame

    coarse = rng.standard_normal((B, M, Hc, Wc)).astype(np.float32)
    sam = rng.standard_normal((B, M, P, P)).astype(np.float32)
    gt_coarse = (rng.random((B, M, Hc, Wc)) > 0.6).astype(np.float32)
    gt_sam = (rng.random((B, M, P, P)) > 0.6).astype(np.float32)

    cw = np.zeros((B, Hc, Wc), np.float32)
    sw = np.zeros((B, P, P), np.float32)
    mv = np.zeros((B, M), bool)
    for b, ((y0, x0, h, w), (sh, sv)) in enumerate(zip(crops, sam_valid)):
        cw[b, y0:y0 + h, x0:x0 + w] = 1.0
        sw[b, :sh, :sv] = 1.0
        mv[b, :m_counts[b]] = True

    # ---- ours: padded frames, traced ----
    def jax_loss(cl, sl):
        out = grounding_losses(
            cl, jnp.asarray(gt_coarse), jnp.asarray(cw),
            sl, jnp.asarray(gt_sam), jnp.asarray(sw), jnp.asarray(mv))
        return out["loss"], out

    (loss, out), (g_c, g_s) = jax.value_and_grad(
        jax_loss, argnums=(0, 1), has_aux=True)(
        jnp.asarray(coarse), jnp.asarray(sam))

    # ---- torch: reference per-sample cropped loop ----
    tc = torch.tensor(coarse, requires_grad=True)
    ts = torch.tensor(sam, requires_grad=True)
    per_sample = []
    for b, ((y0, x0, h, w), (sh, sv)) in enumerate(zip(crops, sam_valid)):
        m = m_counts[b]
        per_sample.append({
            "coarse": tc[b, :m, y0:y0 + h, x0:x0 + w],
            "gt_coarse": torch.tensor(
                gt_coarse[b, :m, y0:y0 + h, x0:x0 + w]),
            "sam": ts[b, :m, :sh, :sv],
            "gt_sam": torch.tensor(gt_sam[b, :m, :sh, :sv]),
        })
    want = reference_compute_loss(per_sample)
    total = sum(want.values())
    total.backward()

    for k in ("loss_mask", "loss_dice", "sam_loss_mask", "sam_loss_dice"):
        assert rel_err(np.asarray(out[k]), want[k].item()) < 1e-5, k
    assert rel_err(np.asarray(g_c), tc.grad.numpy()) < 1e-5
    assert rel_err(np.asarray(g_s), ts.grad.numpy()) < 1e-5
    # padded pixels and invalid mask rows must receive exactly zero grad
    assert np.all(np.asarray(g_c)[:, :, :, :][~(
        (cw[:, None] * mv[:, :, None, None]) > 0)] == 0.0)


# --------------------------------------------------------------------
# 2. U-Net head gradients at full head dims
# --------------------------------------------------------------------

def test_unet_grad_parity_vs_torch():
    """d(BCE+Dice)/d(every U-Net tensor) vs torch autograd through the
    mmseg-spec oracle (scripts/parity_sam_full.MMsegUNetOracle) at the
    real head architecture (in 384 = 24 layers x 16 heads, base 64,
    4 stages) on a small spatial input."""
    from parity_sam_full import MMsegUNetOracle

    from flmm_tpu.convert.load import unet_params
    from flmm_tpu.models.mask_head import unet as unet_mod

    torch.manual_seed(0)
    oracle = MMsegUNetOracle(in_channels=384, base=64)
    M, h, w = 2, 13, 17
    rng = np.random.default_rng(1)
    x = rng.random((M, 384, h, w)).astype(np.float32) * 0.1

    cfg = unet_mod.UNetConfig(in_channels=384)
    params = unet_params(oracle.state_dict(), cfg, prefix="")

    # torch forward + loss
    tx = torch.tensor(x)
    logits_t = oracle(tx)[:, 0]
    gt = torch.tensor(
        (rng.random(tuple(logits_t.shape)) > 0.5).astype(np.float32))
    loss_t = mmdet_bce(logits_t, gt) + mmdet_naive_dice(logits_t, gt)
    loss_t.backward()

    def jax_loss(p):
        logits = unet_mod.forward(p, cfg, jnp.asarray(x.transpose(0, 2, 3, 1)))
        g = jnp.asarray(gt.numpy())
        from flmm_tpu.ops import losses as L
        return (L.sigmoid_bce(logits, g)
                + L.naive_dice(logits, g))

    loss_j, grads = jax.value_and_grad(jax_loss)(params)
    assert rel_err(np.asarray(loss_j), loss_t.item()) < 1e-5

    grad_sd = {k: p.grad for k, p in oracle.named_parameters()}
    want = unet_params(grad_sd, cfg, prefix="")
    # mmseg ConvModule has NO conv bias under GroupNorm (bias='auto');
    # the converter zero-fills those slots -- skip them (our tree trains
    # an extra bias the reference does not have; it is zero when loading
    # reference checkpoints)
    errs = tree_rel_errs(grads, want, skip=("['b']",))
    bad = {k: v for k, v in errs.items() if v > 5e-4}
    assert not bad, bad


# --------------------------------------------------------------------
# 3. SAM head chain: text_layer_weights -> text_proj -> prompt encoder
#    -> mask decoder gradients at full channel dims
# --------------------------------------------------------------------

@pytest.mark.skipif(not reference_available(), reason="reference not mounted")
def test_sam_head_chain_grad_parity_vs_torch():
    """Given identical (frozen image embedding, dense-prompt logits,
    boxes, frozen per-layer hidden states), compare d(loss)/d of:
    text_layer_weights, text_proj, every prompt-encoder tensor, every
    mask-decoder tensor, and the dense-prompt input (the gradient seam
    back into the U-Net) against torch autograd through the reference
    ``segment_anything`` modules (mask_refiner.py:92-124 transcription,
    text path frozen_llava.py:35-42,92-94,134-139).

    Full channel dims (embed 256, mlp 2048, heads 8), reduced spatial
    grid (16x16 image embedding) so the test stays CI-sized."""
    sys.path.insert(0, "/root/reference")
    import types as _types

    def _stub(name, **attrs):
        mod = _types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        sys.modules.setdefault(name, mod)
        return mod

    tv = _stub("torchvision")
    tv.__path__ = []
    _stub("torchvision.ops")
    _stub("torchvision.ops.boxes", batched_nms=None, box_area=None)
    _stub("torchvision.transforms")
    _stub("torchvision.transforms.functional", resize=None, to_pil_image=None)
    _stub("cv2")
    from segment_anything.modeling.prompt_encoder import PromptEncoder
    from segment_anything.modeling.mask_decoder import MaskDecoder
    from segment_anything.modeling.transformer import TwoWayTransformer

    from flmm_tpu.convert import sam_weights
    from flmm_tpu.models.sam import mask_decoder as dec_mod
    from flmm_tpu.models.sam import prompt_encoder as prompt_mod
    from flmm_tpu.ops import losses as L

    torch.manual_seed(0)
    S, IMG, D, D_llm, Lh, Ttok = 16, 256, 256, 64, 4, 6
    pe = PromptEncoder(embed_dim=D, image_embedding_size=(S, S),
                       input_image_size=(IMG, IMG), mask_in_chans=16)
    dec = MaskDecoder(
        num_multimask_outputs=3,
        transformer=TwoWayTransformer(depth=2, embedding_dim=D,
                                      mlp_dim=2048, num_heads=8),
        transformer_dim=D, iou_head_depth=3, iou_head_hidden_dim=D)
    text_proj = torch.nn.Linear(D_llm, D)
    tlw = torch.nn.Parameter(torch.randn(Lh) * 0.2)

    rng = np.random.default_rng(2)
    hidden = rng.standard_normal((Lh, Ttok, D_llm)).astype(np.float32) * 0.5
    emb = rng.standard_normal((1, D, S, S)).astype(np.float32) * 0.2
    M = 2
    token_lists = [[0, 1, 2], [4]]
    boxes = np.array([[12.0, 40.0, 150.0, 230.0],
                      [0.0, 0.0, 256.0, 256.0]], np.float32)
    dense_in = rng.standard_normal((M, 1, 4 * S, 4 * S)).astype(np.float32)
    gt = (rng.random((M, 4 * S, 4 * S)) > 0.6).astype(np.float32)

    # ---- torch: reference per-mask loop ----
    t_hidden = torch.tensor(hidden)
    t_dense_in = torch.tensor(dense_in, requires_grad=True)
    w = torch.softmax(tlw, 0)
    hmix = (t_hidden * w.view(-1, 1, 1)).sum(0)           # (Ttok, D_llm)
    lows = []
    for m in range(M):
        text = text_proj(hmix[token_lists[m]])            # (t_m, D)
        sp, dn = pe(points=None,
                    boxes=torch.tensor(boxes[m:m + 1]),
                    masks=t_dense_in[m:m + 1])
        sp = torch.cat([sp, text[None]], dim=1)
        low, _iou = dec(
            image_embeddings=torch.tensor(emb), image_pe=pe.get_dense_pe(),
            sparse_prompt_embeddings=sp, dense_prompt_embeddings=dn,
            multimask_output=False)
        lows.append(low[0, 0])
    low_t = torch.stack(lows)
    loss_t = mmdet_bce(low_t, torch.tensor(gt)) + mmdet_naive_dice(
        low_t, torch.tensor(gt))
    loss_t.backward()

    # ---- ours: one batched decoder call with padded text ----
    pcfg = prompt_mod.PromptEncoderConfig(
        image_embedding_size=S, input_image_size=IMG)
    dcfg = dec_mod.MaskDecoderConfig()
    T = max(len(t) for t in token_lists)
    text_idx = np.zeros((M, T), np.int32)
    text_valid = np.zeros((M, T), bool)
    for m, toks in enumerate(token_lists):
        text_idx[m, :len(toks)] = toks
        text_valid[m, :len(toks)] = True

    trainable = {
        "prompt": sam_weights.prompt_encoder_params(pe.state_dict(), pcfg,
                                                    prefix=""),
        "decoder": sam_weights.mask_decoder_params(dec.state_dict(), dcfg,
                                                   prefix=""),
        "tp_w": jnp.asarray(text_proj.weight.detach().numpy().T),
        "tp_b": jnp.asarray(text_proj.bias.detach().numpy()),
        "tlw": jnp.asarray(tlw.detach().numpy()),
    }
    j_hidden = jnp.asarray(hidden)
    j_emb = jnp.asarray(emb[0].transpose(1, 2, 0))

    def jax_loss(tr, dense_logits):
        lw = jax.nn.softmax(tr["tlw"])
        hm = (j_hidden * lw[:, None, None]).sum(0)
        text = hm[jnp.asarray(text_idx)] @ tr["tp_w"] + tr["tp_b"]
        text = text * jnp.asarray(text_valid)[..., None]
        sparse_box = prompt_mod.embed_boxes(tr["prompt"], pcfg,
                                            jnp.asarray(boxes))
        sparse = jnp.concatenate([sparse_box, text], axis=1)
        valid = jnp.concatenate(
            [jnp.ones((M, 2), bool), jnp.asarray(text_valid)], axis=1)
        dense = prompt_mod.embed_masks(
            tr["prompt"], pcfg, dense_logits.transpose(0, 2, 3, 1))
        ipe = prompt_mod.dense_pe(tr["prompt"], pcfg)
        masks, _iou = dec_mod.forward(
            tr["decoder"], dcfg, j_emb, ipe, sparse, dense,
            sparse_valid=valid)
        low = masks[:, 0]
        g = jnp.asarray(gt)
        return L.sigmoid_bce(low, g) + L.naive_dice(low, g)

    loss_j, (grads, g_dense) = jax.value_and_grad(jax_loss, argnums=(0, 1))(
        trainable, jnp.asarray(dense_in))
    assert rel_err(np.asarray(loss_j), loss_t.item()) < 1e-4

    def grad_sd(module):
        """state-dict-shaped gradients: buffers and never-used params
        (grad None) become zeros so the converter relayout applies."""
        params = dict(module.named_parameters())
        out = {}
        for k, v in module.state_dict().items():
            p = params.get(k)
            out[k] = (p.grad if p is not None and p.grad is not None
                      else torch.zeros_like(v))
        return out

    want = {
        "prompt": sam_weights.prompt_encoder_params(grad_sd(pe), pcfg,
                                                    prefix=""),
        "decoder": sam_weights.mask_decoder_params(grad_sd(dec), dcfg,
                                                   prefix=""),
        "tp_w": text_proj.weight.grad.numpy().T,
        "tp_b": text_proj.bias.grad.numpy(),
        "tlw": tlw.grad.numpy(),
    }
    # pe_gaussian is a frozen buffer on the torch side (register_buffer:
    # no grad is ever defined for it) -- exclude it from the comparison
    # rather than asserting our (real) gradient against torch's zeros
    grads["prompt"]["pe_gaussian"] = jnp.zeros_like(
        grads["prompt"]["pe_gaussian"])

    errs = tree_rel_errs(grads, want)
    bad = {k: v for k, v in errs.items() if v > 5e-4}
    assert not bad, bad
    assert rel_err(np.asarray(g_dense), t_dense_in.grad.numpy()) < 5e-4


# --------------------------------------------------------------------
# 4. optimizer: grad-clip + AdamW step + schedule parity
# --------------------------------------------------------------------

def test_adamw_clip_step_parity_vs_torch():
    """clip_by_global_norm(1.0) + AdamW update (train/loop.make_optimizer)
    vs torch clip_grad_norm_ + torch.optim.AdamW over 3 steps with the
    reference hyperparameters (configs/deepseek_vl/...py:26-40,181-188:
    lr 1e-4, betas (0.9, 0.999), wd 0.01, max_norm 1.0)."""
    from flmm_tpu.train import loop as train_loop

    rng = np.random.default_rng(3)
    shapes = {"w": (4, 3), "b": (5,), "t": (2, 2, 3)}
    params0 = {k: rng.standard_normal(s).astype(np.float32)
               for k, s in shapes.items()}
    grads_per_step = [
        {k: (rng.standard_normal(s) * (4.0 if i == 0 else 0.2)).astype(
            np.float32) for k, s in shapes.items()}
        for i in range(3)
    ]  # first step has norm >> 1 so the clip path is actually exercised

    cfg = train_loop.OptimConfig(total_steps=100)
    sched = train_loop.make_schedule(cfg)
    opt = train_loop.make_optimizer(cfg)
    jp = jax.tree.map(jnp.asarray, params0)
    state = opt.init(jp)

    tp = {k: torch.nn.Parameter(torch.tensor(v))
          for k, v in params0.items()}
    # torch optim with per-step lr set to our schedule's value
    topt = torch.optim.AdamW(tp.values(), lr=1.0, betas=cfg.betas,
                             weight_decay=cfg.weight_decay, eps=1e-8)

    for i, g in enumerate(grads_per_step):
        jg = jax.tree.map(jnp.asarray, g)
        updates, state = opt.update(jg, state, jp)
        jp = jax.tree.map(lambda p, u: p + u, jp, updates)

        for k, p in tp.items():
            p.grad = torch.tensor(g[k])
        torch.nn.utils.clip_grad_norm_(tp.values(), cfg.max_grad_norm)
        for group in topt.param_groups:
            group["lr"] = float(sched(i))
        topt.step()

        for k in shapes:
            assert rel_err(np.asarray(jp[k]), tp[k].detach().numpy()) < 1e-5, (
                i, k)


def test_schedule_matches_mmengine_formulas():
    """make_schedule vs closed-form mmengine LinearLR(start_factor=1e-5)
    + CosineAnnealingLR(eta_min=0) (reference configs .py:192-207)."""
    from flmm_tpu.train import loop as train_loop

    cfg = train_loop.OptimConfig(lr=1e-4, total_steps=1000,
                                 warmup_ratio=0.03)
    sched = train_loop.make_schedule(cfg)
    W = int(0.03 * 1000)
    for step in [0, 10, W, W + 1, 400, 999]:
        if step <= W:
            want = cfg.lr * (1e-5 + (1 - 1e-5) * step / W)
        else:
            t = (step - W) / (1000 - W)
            want = cfg.lr * 0.5 * (1 + np.cos(np.pi * t))
        got = float(sched(step))
        assert abs(got - want) <= 0.02 * cfg.lr + 1e-12, (step, got, want)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
