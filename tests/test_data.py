"""Data pipeline tests: tokenization streams, PNG/RefCOCO readers, collate,
and an end-to-end real-data-shaped batch through the tiny model."""

import json
import pickle

import numpy as np
import pytest
from PIL import Image

from flmm_tpu.data import tokenization as tok
from flmm_tpu.data.collate import BatchSpec, build_batch
from flmm_tpu.data.panoptic import id2rgb, rgb2id
from flmm_tpu.data.png import PNGDataset
from flmm_tpu.data.processors import ProcessorConfig
from flmm_tpu.data.refcoco import RefCocoDataset, refcoco_to_sample


IMAGE_TOKEN_ID = 5


class FakeTokenizer:
    """Whitespace tokenizer with a dedicated image-placeholder token."""

    def encode(self, text, add_special_tokens=False):
        ids = [1] if add_special_tokens else []
        buf = text
        while "<image_placeholder>" in buf:
            pre, buf = buf.split("<image_placeholder>", 1)
            ids += self._words(pre)
            ids.append(IMAGE_TOKEN_ID)
        ids += self._words(buf)
        return ids

    @staticmethod
    def _words(text):
        return [10 + (hash(w) % 200) for w in text.split()]


def prompt_spec(n_img):
    return tok.PromptSpec(
        template=tok.TEMPLATES["deepseek"],
        prompt="<image_placeholder>" * n_img + " describe the image",
    )


class TestTokenization:
    def test_image_block_location(self):
        ids = tok.encode_prompt(FakeTokenizer(), prompt_spec(8))
        start, n = tok.find_image_block(ids, IMAGE_TOKEN_ID)
        assert n == 8
        assert ids[start - 1] != IMAGE_TOKEN_ID

    def test_caption_stream_alignment(self):
        t = FakeTokenizer()
        segs = [
            {"utterance": "a dog", "has_mask": True},
            {"utterance": "runs on", "has_mask": False},
            {"utterance": "green grass", "has_mask": True},
        ]
        s = tok.caption_stream(t, segs, prompt_len=4)
        assert s["num_masks"] == 2
        mask_ids = s["mask_ids"]
        assert mask_ids[:4] == [-1] * 4
        assert mask_ids[4:6] == [0, 0]
        assert mask_ids[6:8] == [-1, -1]
        assert mask_ids[8:10] == [1, 1]
        assert s["spans"] == [(4, 6), (8, 10)]
        assert len(mask_ids) == 4 + len(s["caption_ids"])


@pytest.fixture()
def png_fixture(tmp_path):
    # segment map: two segments (ids 7, 9) on a 40x50 canvas
    segm = np.zeros((40, 50), np.uint32)
    segm[5:20, 5:25] = 7
    segm[25:35, 30:45] = 9
    png_dir = tmp_path / "panoptic"
    png_dir.mkdir()
    Image.fromarray(id2rgb(segm)).save(png_dir / "000001.png")

    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (50, 40), (120, 30, 60)).save(img_dir / "000001.jpg")

    pan_json = {
        "images": [{"id": 1, "file_name": "000001.jpg",
                    "height": 40, "width": 50}],
        "annotations": [{
            "image_id": 1, "file_name": "000001.png",
            "segments_info": [
                {"id": 7, "category_id": 1},
                {"id": 9, "category_id": 2},
            ],
        }],
        "categories": [
            {"id": 1, "isthing": 1}, {"id": 2, "isthing": 0},
        ],
    }
    narr = [{
        "image_id": "1",
        "segments": [
            {"utterance": "a dog", "segment_ids": ["7"], "plural": False},
            {"utterance": "sits near", "segment_ids": [], "plural": False},
            {"utterance": "the lake", "segment_ids": ["9"], "plural": False},
        ],
    }]
    (tmp_path / "pan.json").write_text(json.dumps(pan_json))
    (tmp_path / "narr.json").write_text(json.dumps(narr))
    return tmp_path


def test_rgb_roundtrip():
    ids = np.array([[0, 7], [300, 70000]], np.uint32)
    np.testing.assert_array_equal(rgb2id(id2rgb(ids)), ids)


def test_png_dataset(png_fixture):
    ds = PNGDataset(
        json_file=str(png_fixture / "narr.json"),
        panoptic_json_file=str(png_fixture / "pan.json"),
        panoptic_png_path=str(png_fixture / "panoptic"),
        image_path=str(png_fixture / "images"),
        tokenizer=FakeTokenizer(),
        prompt_spec=prompt_spec(16),
        image_token_id=IMAGE_TOKEN_ID,
    )
    s = ds[0]
    assert s["num_img_tokens"] == 16
    assert s["masks"].shape == (2, 40, 50)
    assert s["masks"][0].sum() == 15 * 20
    assert s["masks"][1].sum() == 10 * 15
    assert len(s["input_ids"]) == len(s["mask_ids"])
    assert (s["mask_ids"] == 0).sum() == 2  # 'a dog'
    assert (s["mask_ids"] == 1).sum() == 2  # 'the lake'
    assert s["mask_infos"][0]["isthing"] and not s["mask_infos"][1]["isthing"]


@pytest.fixture()
def refcoco_fixture(tmp_path):
    refs = [
        {"image_id": 1, "ann_id": 11, "split": "train",
         "sentences": [{"sent": "left dog"}, {"sent": "dog on left"}]},
        {"image_id": 1, "ann_id": 12, "split": "train",
         "sentences": [{"sent": "right cat"}]},
        {"image_id": 1, "ann_id": 12, "split": "val",
         "sentences": [{"sent": "the cat"}]},
    ]
    inst = {
        "images": [{"id": 1, "file_name": "1.jpg", "height": 30, "width": 40}],
        "annotations": [
            {"id": 11, "image_id": 1,
             "segmentation": [[2, 2, 18, 2, 18, 24, 2, 24]]},
            {"id": 12, "image_id": 1,
             "segmentation": [[22, 4, 38, 4, 38, 28, 22, 28]]},
        ],
    }
    (tmp_path / "refs.p").write_bytes(pickle.dumps(refs))
    (tmp_path / "instances.json").write_text(json.dumps(inst))
    img_dir = tmp_path / "images"
    img_dir.mkdir()
    Image.new("RGB", (40, 30), (10, 200, 90)).save(img_dir / "1.jpg")
    return tmp_path


def test_refcoco_dataset_concat_and_split(refcoco_fixture):
    ds = RefCocoDataset(
        ann_file=str(refcoco_fixture / "instances.json"),
        split_file=str(refcoco_fixture / "refs.p"),
        image_path=str(refcoco_fixture / "images"),
        split="train",
    )
    assert len(ds) == 1
    item = ds[0]
    assert len(item["expressions"]) == 3
    assert item["masks"].shape == (3, 30, 40)
    assert item["masks"][0].sum() > 0

    t = FakeTokenizer()
    spec = prompt_spec(8)
    concat = refcoco_to_sample(item, t, spec, IMAGE_TOKEN_ID, concat=True)
    assert len(concat) == 1
    assert concat[0]["masks"].shape[0] == 3
    assert len(concat[0]["spans"]) == 3
    split = refcoco_to_sample(item, t, spec, IMAGE_TOKEN_ID, concat=False)
    assert len(split) == 3
    assert all(s["masks"].shape[0] == 1 for s in split)


def test_collate_and_model_consume(png_fixture):
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.models.frozen import deepseek_vl as model

    ds = PNGDataset(
        json_file=str(png_fixture / "narr.json"),
        panoptic_json_file=str(png_fixture / "pan.json"),
        panoptic_png_path=str(png_fixture / "panoptic"),
        image_path=str(png_fixture / "images"),
        tokenizer=FakeTokenizer(),
        prompt_spec=prompt_spec(64),
        image_token_id=IMAGE_TOKEN_ID,
    )
    s = ds[0]
    spec = BatchSpec(
        seq_len=96, max_masks=3, text_per_mask=4, coarse_hw=(16, 16),
        sam_size=128, prompt_size=32,
        processor=ProcessorConfig(size=64),
    )
    batch = build_batch([s, s], spec)
    assert batch["input_ids"].shape == (2, 96)
    assert batch["mask_valid"].sum() == 4
    # GT landed inside the valid regions
    assert (batch["gt_coarse"] * batch["coarse_weight"][:, None]).sum() == \
        batch["gt_coarse"].sum()
    assert (batch["gt_sam"] * batch["sam_weight"][:, None]).sum() == \
        batch["gt_sam"].sum()

    cfg = tiny(img_start=s["img_start"])
    params = model.init_params(cfg, jax.random.key(0))
    mb = {k: jnp.asarray(v) if k != "geom" else
          {g: jnp.asarray(a) for g, a in v.items()}
          for k, v in batch.items() if k != "infos"}
    loss, metrics = model.loss_fn(params, cfg, mb)
    assert np.isfinite(float(loss))


def test_video_frame_sampling(tmp_path):
    from flmm_tpu.data.video import (
        load_frames_from_dir, process_video, sample_indices,
    )
    from flmm_tpu.data.processors import ProcessorConfig, square_pad_preprocess

    assert sample_indices(100, 4) == [0, 33, 66, 99]
    assert sample_indices(3, 8) == [0, 1, 2]
    for i in range(6):
        Image.new("RGB", (20, 16), (i * 40, 0, 0)).save(
            tmp_path / f"f{i:03d}.png")
    frames = load_frames_from_dir(str(tmp_path), n_frames=3)
    assert len(frames) == 3
    out = process_video(
        frames, lambda im: square_pad_preprocess(im, ProcessorConfig(size=32)),
        n_frames=2)
    assert out["pixel_values"].shape == (2, 32, 32, 3)


def test_io_open_any_local(tmp_path):
    from flmm_tpu.data.io import exists, open_any, read_bytes

    p = tmp_path / "x.bin"
    p.write_bytes(b"hello")
    assert read_bytes(str(p)) == b"hello"
    assert exists(str(p)) and not exists(str(tmp_path / "nope"))
    with open_any(f"file://{p}") as f:
        assert f.read() == b"hello"


class TestPrefetchLoader:
    def test_epoch_sampler_determinism_and_sharding(self):
        from flmm_tpu.data.loader import EpochSampler

        s = EpochSampler(10, seed=3)
        assert s.epoch(0) == s.epoch(0)
        assert s.epoch(0) != s.epoch(1)
        a = EpochSampler(10, seed=3, num_shards=2, shard_id=0).epoch(0)
        b = EpochSampler(10, seed=3, num_shards=2, shard_id=1).epoch(0)
        assert sorted(a + b) == list(range(10))

    def test_prefetch_loader_order_and_content(self):
        import time
        from flmm_tpu.data.loader import EpochSampler, PrefetchLoader

        def sample(i):
            time.sleep(0.002 * (i % 3))  # staggered work
            return i

        loader = PrefetchLoader(
            sample, lambda xs: sorted(xs),
            EpochSampler(17, seed=0, shuffle=True), batch_size=4,
            num_workers=3)
        batches = list(loader.epoch(0))
        assert len(batches) == 4  # drop-last
        seen = [x for b in batches for x in b]
        assert len(set(seen)) == 16

    def test_prefetch_loader_propagates_errors(self):
        from flmm_tpu.data.loader import EpochSampler, PrefetchLoader

        def sample(i):
            if i == 3:
                raise ValueError("boom")
            return i

        loader = PrefetchLoader(sample, list,
                                EpochSampler(8, shuffle=False),
                                batch_size=4, num_workers=2)
        with pytest.raises(ValueError):
            list(loader.epoch(0))


def test_alignment_padding_preserves_outputs(png_fixture):
    """Inserting masked alignment pads before the image block (with explicit
    position ids) must not change model outputs for real tokens."""
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.models.frozen import grounding as model

    ds = PNGDataset(
        json_file=str(png_fixture / "narr.json"),
        panoptic_json_file=str(png_fixture / "pan.json"),
        panoptic_png_path=str(png_fixture / "panoptic"),
        image_path=str(png_fixture / "images"),
        tokenizer=FakeTokenizer(),
        prompt_spec=prompt_spec(64),
        image_token_id=IMAGE_TOKEN_ID,
    )
    s = ds[0]
    base_spec = BatchSpec(seq_len=112, max_masks=3, text_per_mask=4,
                          coarse_hw=(16, 16), sam_size=128, prompt_size=32,
                          processor=ProcessorConfig(size=64))
    import dataclasses
    align_spec = dataclasses.replace(base_spec, align_image_block=16)

    b0 = build_batch([s], base_spec)
    b1 = build_batch([s], align_spec)
    pad = np.argmax(b1["input_ids"][0] == IMAGE_TOKEN_ID) - s["img_start"]
    assert pad > 0 and (s["img_start"] + pad) % 16 == 0
    # positions of real tokens must match the unpadded sequence
    real0 = b0["position_ids"][0][b0["attn_mask"][0]]
    real1 = b1["position_ids"][0][b1["attn_mask"][0]]
    np.testing.assert_array_equal(real0, real1)

    def run(batch, img_start):
        cfg = tiny(img_start=img_start)
        params = model.init_params(cfg, jax.random.key(0))
        mb = {k: jax.tree.map(jnp.asarray, v) for k, v in batch.items()
              if k != "infos"}
        return model.forward(params, cfg, mb)

    o0 = run(b0, s["img_start"])
    o1 = run(b1, s["img_start"] + pad)
    np.testing.assert_allclose(np.asarray(o1["coarse_logits"]),
                               np.asarray(o0["coarse_logits"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(o1["sam_logits"]),
                               np.asarray(o0["sam_logits"]), atol=2e-3)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
