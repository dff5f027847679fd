"""Eval metric + runner tests."""

import pytest
import numpy as np

from flmm_tpu.evalsuite.metrics import (
    PNGAccumulator, RefSegAccumulator, average_accuracy,
)
from flmm_tpu.evalsuite.runner import run_eval, refcoco_score, png_score
from flmm_tpu.data.collate import BatchSpec
from flmm_tpu.data.processors import ProcessorConfig


def test_average_accuracy_is_mean_iou():
    rng = np.random.default_rng(0)
    ious = rng.random(200)
    aa = average_accuracy(ious, n_thresholds=100000)
    assert abs(aa - ious.mean()) < 1e-3


def test_refseg_accumulator_formulas():
    acc = RefSegAccumulator()
    a = np.zeros((4, 4)); a[:2] = 1
    b = np.zeros((4, 4)); b[:, :2] = 1
    acc.add(a, b)          # I=4, U=12, IoU=1/3
    acc.add(a, a)          # I=8, U=8, IoU=1
    r = acc.results()
    assert abs(r["cIoU"] - 100 * 12 / 20) < 1e-6
    assert abs(r["mIoU"] - 100 * (1 / 3 + 1.0) / 2) < 1e-4


def test_png_accumulator_splits():
    acc = PNGAccumulator()
    m = np.ones((4, 4))
    acc.add(m, m, {"isthing": True, "plural": False})
    acc.add(np.zeros((4, 4)), m, {"isthing": False, "plural": True})
    r = acc.results()
    assert abs(r["AA_things"] - 1.0) < 1e-3
    assert r["AA_stuff"] < 1e-3
    assert r["aAcc@0.5"] == 0.5


def test_run_eval_with_mock_predictor():
    """A predictor that returns the GT encoded as logits must score ~100."""
    from tests.test_data import FakeTokenizer, prompt_spec, IMAGE_TOKEN_ID
    from flmm_tpu.data.refcoco import refcoco_to_sample
    from flmm_tpu.data.collate import build_batch, embed_gt_sam
    from PIL import Image

    rng = np.random.default_rng(1)
    samples = []
    for i in range(3):
        oh, ow = int(rng.integers(40, 80)), int(rng.integers(40, 80))
        mask = np.zeros((oh, ow), np.uint8)
        mask[5:oh // 2, 5:ow // 2] = 1
        item = {
            "image": Image.new("RGB", (ow, oh), (50, 80, 110)),
            "expressions": ["the thing"],
            "masks": mask[None],
            "file_name": f"{i}.jpg",
        }
        samples += refcoco_to_sample(item, FakeTokenizer(), prompt_spec(8),
                                     IMAGE_TOKEN_ID, concat=True)

    spec = BatchSpec(seq_len=48, max_masks=2, text_per_mask=4,
                     coarse_hw=(16, 16), sam_size=128, prompt_size=32,
                     processor=ProcessorConfig(size=64))

    def predict(batch):
        # return GT as +-8 logits
        return np.where(batch["gt_sam"] > 0.5, 8.0, -8.0)

    acc = run_eval(samples, predict, spec, batch_size=2,
                   accumulator_factory=RefSegAccumulator,
                   score_fn=refcoco_score)
    r = acc.results()
    assert r["n"] == 3
    assert r["cIoU"] > 85.0, r  # resampling chain keeps IoU high
    assert r["mIoU"] > 85.0, r


def test_sharded_eval_matches_host_terms():
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.data.synthetic import synthetic_batch
    from flmm_tpu.models.frozen import grounding as model
    from flmm_tpu.evalsuite.sharded import (
        batch_iou_terms, finalize, make_sharded_eval_step,
    )
    from flmm_tpu.parallel import mesh as mesh_lib

    cfg = tiny()
    params = model.init_params(cfg, jax.random.key(0))
    batch = jax.tree.map(jnp.asarray, synthetic_batch(cfg, batch_size=8))

    def fwd(p, b):
        return model.forward(p, cfg, b)

    # single device baseline
    out = fwd(params, batch)
    want = {k: float(v) for k, v in batch_iou_terms(
        out["sam_logits"], batch["gt_sam"], batch["sam_weight"],
        batch["mask_valid"]).items()}

    mesh = mesh_lib.make_mesh(n_data=8, n_model=1)
    run = make_sharded_eval_step(fwd, mesh)
    got = {k: float(v) for k, v in run(params, batch).items()}
    for k in want:
        assert abs(got[k] - want[k]) < 1e-2 + 1e-3 * abs(want[k]), (k, got, want)
    r = finalize(run(params, batch))
    assert 0 <= r["cIoU"] <= 100 and r["n"] > 0


def test_registry_batch_builders_uniform_signature():
    """Every family's builder must accept (samples, batch_spec)."""
    from flmm_tpu.registry import FAMILIES, get_batch_builder

    for fam in FAMILIES:
        assert callable(get_batch_builder(fam))
    # family-specific specs bind with overridable defaults
    assert callable(get_batch_builder("llava_next", tile_size=32,
                                      patch_size=8))
    assert callable(get_batch_builder("mgm", crop_size=32, aux_size=64))


def test_get_coarse_hw_per_family():
    from flmm_tpu.registry import get_coarse_hw
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.configs.llava_next import tiny_llava_next
    from flmm_tpu.configs.mgm import tiny_mgm

    assert get_coarse_hw(tiny()) == (16, 16)
    assert get_coarse_hw(tiny_llava_next()) == (16, 16)
    assert get_coarse_hw(tiny_mgm(hd=True)) == (16, 16)
    from flmm_tpu.configs.deepseek_vl import deepseek_vl_1_3b
    from flmm_tpu.configs.llava_next import llava_next_vicuna_7b
    from flmm_tpu.configs.mgm import mgm_vicuna_7b_hd

    assert get_coarse_hw(deepseek_vl_1_3b()) == (64, 64)
    assert get_coarse_hw(llava_next_vicuna_7b()) == (64, 64)
    assert get_coarse_hw(mgm_vicuna_7b_hd()) == (64, 64)


def test_run_eval_seq_len_buckets():
    """Bucketed eval pads each batch to the smallest fitting bucket and
    still scores every sample."""
    from tests.test_data import FakeTokenizer, prompt_spec, IMAGE_TOKEN_ID
    from flmm_tpu.data.refcoco import refcoco_to_sample
    from PIL import Image

    rng = np.random.default_rng(2)
    samples = []
    for i in range(4):
        mask = np.zeros((40, 40), np.uint8)
        mask[5:20, 5:20] = 1
        item = {
            "image": Image.new("RGB", (40, 40), (40, 90, 120)),
            "expressions": [" ".join(["word"] * (2 + 10 * (i % 2)))],
            "masks": mask[None],
            "file_name": f"{i}.jpg",
        }
        samples += refcoco_to_sample(item, FakeTokenizer(), prompt_spec(8),
                                     IMAGE_TOKEN_ID, concat=True)

    spec = BatchSpec(seq_len=64, max_masks=2, text_per_mask=4,
                     coarse_hw=(16, 16), sam_size=128, prompt_size=32,
                     processor=ProcessorConfig(size=64))
    seen_lens = []

    def predict(batch):
        seen_lens.append(batch["input_ids"].shape[1])
        return np.where(batch["gt_sam"] > 0.5, 8.0, -8.0)

    acc = run_eval(samples, predict, spec, batch_size=2,
                   accumulator_factory=RefSegAccumulator,
                   score_fn=refcoco_score, seq_len_buckets=(24, 48))
    assert acc.results()["n"] == 4
    assert set(seen_lens) <= {24, 48} and len(set(seen_lens)) >= 1


def test_run_eval_sharded_matches_host_path():
    """run_eval_sharded is metric-EXACT: data-sharded forward + the
    reference-exact host scorer at original GT resolution must equal the
    single-device host path on the same data -- for the RefCOCO scorer
    and for the PNG scorer incl. per-split metrics (VERDICT r2 item 4)."""
    import jax
    import jax.numpy as jnp
    from flmm_tpu.configs.deepseek_vl import tiny
    from flmm_tpu.data.collate import BatchSpec
    from flmm_tpu.data.processors import ProcessorConfig
    from flmm_tpu.data.synthetic import synthetic_samples
    from flmm_tpu.evalsuite.metrics import PNGAccumulator
    from flmm_tpu.evalsuite.runner import png_score
    from flmm_tpu.evalsuite.sharded import run_eval_sharded
    from flmm_tpu.models.frozen import grounding as model
    from flmm_tpu.models.mask_head.unet import output_hw
    from flmm_tpu.parallel import mesh as mesh_lib

    cfg = tiny()
    params = model.init_params(cfg, jax.random.key(0))
    samples = synthetic_samples(cfg, 5, seed=0)  # 5 % 4 != 0: pad path
    spec = BatchSpec(
        seq_len=max(len(s["input_ids"]) for s in samples) + 16,
        max_masks=2, text_per_mask=8,
        coarse_hw=output_hw(cfg.unet, (cfg.clip_shape, cfg.clip_shape)),
        sam_size=cfg.sam.encoder.img_size, prompt_size=cfg.sam.prompt_size,
        processor=ProcessorConfig(size=cfg.input_size))
    mesh = mesh_lib.make_mesh(n_data=4, n_model=1)

    @jax.jit
    def predict(batch):
        return model.forward(params, cfg, batch)["sam_logits"]

    def predict_np(batch):
        batch = {k: v for k, v in batch.items() if k != "infos"}
        return np.asarray(predict(jax.tree.map(jnp.asarray, batch)))

    # RefCOCO-style default scorer
    out = run_eval_sharded(iter(samples), params,
                           lambda p, b: model.forward(p, cfg, b),
                           spec, batch_size=4, mesh=mesh)
    host = run_eval(iter(samples), predict_np, spec, 4,
                    RefSegAccumulator, refcoco_score).results()
    assert set(out) == set(host) == {"cIoU", "mIoU", "n"}
    n_masks = sum(len(s["spans"]) for s in samples)
    assert out["n"] == host["n"] == min(n_masks, 2 * 5)
    for k in ("cIoU", "mIoU"):
        assert abs(out[k] - host[k]) < 1e-4, (k, out, host)

    # PNG scorer: per-split metrics survive the sharded path
    outp = run_eval_sharded(iter(samples), params,
                            lambda p, b: model.forward(p, cfg, b),
                            spec, batch_size=4, mesh=mesh,
                            accumulator_factory=PNGAccumulator,
                            score_fn=png_score)
    hostp = run_eval(iter(samples), predict_np, spec, 4,
                     PNGAccumulator, png_score).results()
    assert set(outp) == set(hostp)
    assert any("thing" in k for k in outp), outp
    for k in hostp:
        assert abs(outp[k] - hostp[k]) < 1e-4, (k, outp, hostp)

# heavy (jit compiles / torch oracles) -- excluded from the fast path
# (pytest -m "not slow"; see README Testing strategy)
pytestmark = pytest.mark.slow
