"""Offline fixtures for CLI subprocess smoke tests.

The eval/demo/CoT CLIs take real checkpoint + tokenizer + dataset paths
(the reference runs them against released assets).  This module
fabricates the complete on-disk world at tiny dimensions so the scripts
can run end-to-end as subprocesses (VERDICT r3 item 7: the arg-wiring
layer was the only untested code): a WordLevel tokenizer loadable via
``AutoTokenizer``, a DeepSeek-VL-layout HF checkpoint matching the
``tiny`` preset, a SAM encoder ``.pth`` in the official key layout, and
RefCOCO / PNG / Visual-CoT dataset trees in the reference formats.
"""

from __future__ import annotations

import json
import pathlib
import pickle

import numpy as np


def make_tokenizer(dirpath: pathlib.Path) -> pathlib.Path:
    """Fast WordLevel tokenizer dir loadable by AutoTokenizer (offline).

    ``<image_placeholder>`` is an added special token so it encodes to a
    single id, matching DeepSeek-VL's real tokenizer.  All ids stay well
    below the tiny preset's vocab_size=256.
    """
    from tokenizers import Tokenizer, models, pre_tokenizers

    words = ("a dog the cat left right on sits near lake please segment "
             "image is what in this you are able to briefly answer "
             "question describe find object most relevant first think "
             "which whole region that might help and of with user "
             "assistant").split()
    vocab = {"<unk>": 0, "<s>": 1, "</s>": 2}
    for w in words:
        vocab.setdefault(w, len(vocab))
    vocab.setdefault(".", len(vocab))
    vocab.setdefault(",", len(vocab))
    vocab.setdefault(":", len(vocab))
    vocab.setdefault("?", len(vocab))
    tok = Tokenizer(models.WordLevel(vocab, unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(["<image_placeholder>"])
    dirpath.mkdir(parents=True, exist_ok=True)
    tok.save(str(dirpath / "tokenizer.json"))
    (dirpath / "tokenizer_config.json").write_text(json.dumps({
        "tokenizer_class": "PreTrainedTokenizerFast",
        "bos_token": "<s>", "eos_token": "</s>", "unk_token": "<unk>",
        "model_max_length": 4096}))
    return dirpath


def make_deepseek_checkpoint(dirpath: pathlib.Path, cfg) -> pathlib.Path:
    """deepseek-vl-chat on-disk layout at the ``tiny`` preset dims:
    ``language_model.*`` HF Llama keys, ``vision_model.vision_tower.*``
    timm SigLIP keys, ``aligner.layers.*`` (convert/load.py:88-109)."""
    import sys

    import torch
    from transformers import LlamaConfig, LlamaForCausalLM

    scripts = pathlib.Path(__file__).resolve().parent.parent / "scripts"
    if str(scripts) not in sys.path:
        sys.path.insert(0, str(scripts))
    from parity_full_size import TimmViTOracle

    torch.manual_seed(0)
    d, v = cfg.llm, cfg.vision
    lm = LlamaForCausalLM(LlamaConfig(
        vocab_size=d.vocab_size, hidden_size=d.hidden_size,
        num_hidden_layers=d.num_layers, num_attention_heads=d.num_heads,
        num_key_value_heads=d.num_kv_heads, head_dim=d.head_dim,
        intermediate_size=d.intermediate_size, rope_theta=d.rope_theta,
        rms_norm_eps=d.rms_eps, tie_word_embeddings=False)).eval()
    vit = TimmViTOracle(dim=v.hidden_size, depth=v.num_layers,
                        heads=v.num_heads, mlp=v.mlp_dim,
                        patch=v.patch_size, img=v.image_size).eval()
    al0 = torch.nn.Linear(v.hidden_size, d.hidden_size)
    al2 = torch.nn.Linear(d.hidden_size, d.hidden_size)
    sd = {}
    for k, t in lm.state_dict().items():
        sd["language_model." + k] = t
    for k, t in vit.timm_state_dict().items():
        sd["vision_model.vision_tower." + k] = t
    sd["aligner.layers.0.weight"] = al0.weight
    sd["aligner.layers.0.bias"] = al0.bias
    sd["aligner.layers.2.weight"] = al2.weight
    sd["aligner.layers.2.bias"] = al2.bias
    dirpath.mkdir(parents=True, exist_ok=True)
    torch.save({k: t.detach().clone() for k, t in sd.items()},
               dirpath / "pytorch_model.bin")
    return dirpath


def make_sam_checkpoint(path: pathlib.Path, enc_cfg) -> pathlib.Path:
    """Official-layout SAM ``.pth`` (``image_encoder.*`` keys) fabricated
    from our native init at the tiny geometry (same inverse-layout trick
    as tests/test_sam.py's reduced-resolution test)."""
    import jax
    import torch

    from flmm_tpu.models.sam import image_encoder as se

    native = se.init_params(enc_cfg, jax.random.key(0))
    rng = np.random.default_rng(3)
    sd = {}

    def put(name, arr):
        sd["image_encoder." + name] = torch.from_numpy(
            np.ascontiguousarray(np.asarray(arr, np.float32)))

    put("pos_embed", np.asarray(native["pos_embed"])[None])
    put("patch_embed.proj.weight",
        np.asarray(native["patch_kernel"]).transpose(3, 2, 0, 1))
    put("patch_embed.proj.bias", native["patch_bias"])
    for j in (0, 1):
        put(f"neck.{2 * j}.weight",
            np.asarray(native[f"neck{j}_kernel"]).transpose(3, 2, 0, 1))
        put(f"neck.{2 * j + 1}.weight", native[f"neck{j}_ln_w"])
        put(f"neck.{2 * j + 1}.bias", native[f"neck{j}_ln_b"])
    for i, bp in enumerate(native["blocks"]):
        b = f"blocks.{i}."
        put(b + "norm1.weight", bp["ln1_w"])
        put(b + "norm1.bias", bp["ln1_b"])
        put(b + "norm2.weight", bp["ln2_w"])
        put(b + "norm2.bias", bp["ln2_b"])
        put(b + "attn.qkv.weight", np.asarray(bp["wqkv"]).T)
        put(b + "attn.qkv.bias", bp["bqkv"])
        put(b + "attn.proj.weight", np.asarray(bp["wo"]).T)
        put(b + "attn.proj.bias", bp["bo"])
        put(b + "mlp.lin1.weight", np.asarray(bp["mlp"]["w1"]).T)
        put(b + "mlp.lin1.bias", bp["mlp"]["b1"])
        put(b + "mlp.lin2.weight", np.asarray(bp["mlp"]["w2"]).T)
        put(b + "mlp.lin2.bias", bp["mlp"]["b2"])
        put(b + "attn.rel_pos_h",
            rng.standard_normal(bp["rel_pos_h"].shape) * 0.1)
        put(b + "attn.rel_pos_w",
            rng.standard_normal(bp["rel_pos_w"].shape) * 0.1)
    import torch as _t

    path.parent.mkdir(parents=True, exist_ok=True)
    _t.save(sd, path)
    return path


def _poly_box(x0, y0, x1, y1):
    return [[x0, y0, x1, y0, x1, y1, x0, y1]]


def make_refcoco_root(root: pathlib.Path) -> pathlib.Path:
    """The eval_refcoco.py --data-root layout: refcoco{,+,g}/ with
    instances.json + refs pickles covering every split the script
    iterates, and a shared train2014/ image dir."""
    from PIL import Image

    img_dir = root / "train2014"
    img_dir.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", (40, 30), (10, 200, 90)).save(img_dir / "1.jpg")
    inst = {
        "images": [{"id": 1, "file_name": "1.jpg",
                    "height": 30, "width": 40}],
        "annotations": [
            {"id": 11, "image_id": 1,
             "segmentation": _poly_box(2, 2, 18, 24)},
            {"id": 12, "image_id": 1,
             "segmentation": _poly_box(22, 4, 38, 28)},
        ],
    }
    for name, split_file, splits in (
            ("refcoco", "refs(unc).p", ("val", "testA", "testB")),
            ("refcoco+", "refs(unc).p", ("val", "testA", "testB")),
            ("refcocog", "refs(umd).p", ("val", "test"))):
        d = root / name
        d.mkdir(parents=True, exist_ok=True)
        refs = [{"image_id": 1, "ann_id": 11 + (i % 2), "split": s,
                 "sentences": [{"sent": "the left dog"}]}
                for i, s in enumerate(splits)]
        (d / split_file).write_bytes(pickle.dumps(refs))
        (d / "instances.json").write_text(json.dumps(inst))
    return root


def make_png_root(root: pathlib.Path) -> pathlib.Path:
    """The eval_png.py --data-root layout: annotations/png_coco_val2017
    .json + panoptic_val2017{.json,/} + val2017/ images."""
    from PIL import Image

    from flmm_tpu.data.panoptic import id2rgb

    ann = root / "annotations"
    (ann / "panoptic_val2017").mkdir(parents=True, exist_ok=True)
    (root / "val2017").mkdir(parents=True, exist_ok=True)
    segm = np.zeros((40, 50), np.uint32)
    segm[5:20, 5:25] = 7
    segm[25:35, 30:45] = 9
    Image.fromarray(id2rgb(segm)).save(
        ann / "panoptic_val2017" / "000001.png")
    Image.new("RGB", (50, 40), (120, 30, 60)).save(
        root / "val2017" / "000001.jpg")
    (ann / "panoptic_val2017.json").write_text(json.dumps({
        "images": [{"id": 1, "file_name": "000001.jpg",
                    "height": 40, "width": 50}],
        "annotations": [{"image_id": 1, "file_name": "000001.png",
                         "segments_info": [{"id": 7, "category_id": 1},
                                           {"id": 9, "category_id": 2}]}],
        "categories": [{"id": 1, "isthing": 1}, {"id": 2, "isthing": 0}],
    }))
    (ann / "png_coco_val2017.json").write_text(json.dumps([{
        "image_id": "1",
        "segments": [
            {"utterance": "a dog", "segment_ids": ["7"], "plural": False},
            {"utterance": "sits near", "segment_ids": [], "plural": False},
            {"utterance": "the lake", "segment_ids": ["9"],
             "plural": False},
        ],
    }]))
    return root


def make_cot_benchmark(root: pathlib.Path) -> tuple:
    """Visual-CoT benchmark dir (one .json of conversations) + image
    root, the layout visual_cot_inference.py globs."""
    from PIL import Image

    bench = root / "bench"
    images = root / "images"
    bench.mkdir(parents=True, exist_ok=True)
    images.mkdir(parents=True, exist_ok=True)
    Image.new("RGB", (64, 48), (200, 40, 90)).save(images / "cot1.jpg")
    (bench / "toy.json").write_text(json.dumps([{
        "image": ["cot1.jpg"],
        "conversations": [
            {"from": "human", "value": "<image>what is the object?"},
            {"from": "gpt", "value": "a dog"},
        ],
    }]))
    return bench, images
