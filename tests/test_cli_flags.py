"""CLI observability flags: --profile, --nonfinite-guard, metrics file.

Pins VERDICT round-1 item 6: the diagnostics infrastructure must be
reachable from scripts/train.py, not tested dead code.
"""

import json
import subprocess
import sys

import pytest

from tests.conftest import REPO


@pytest.mark.slow
def test_train_cli_diagnostics_flags(tmp_path):
    wd = tmp_path / "wd"
    proc = subprocess.run(
        [sys.executable, "scripts/train.py", "--family", "deepseek_vl",
         "--preset", "tiny", "--synthetic", "--steps", "4",
         "--batch-size", "2", "--log-interval", "2", "--profile", "1",
         "--nonfinite-guard", "--work-dir", str(wd)],
        cwd=str(REPO), capture_output=True, text=True, timeout=1800,
        env={"PATH": "/usr/bin:/bin", "HOME": "/root",
             "JAX_PLATFORMS": "cpu"},
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    # metrics JSONL written
    lines = (wd / "metrics.jsonl").read_text().strip().splitlines()
    recs = [json.loads(ln) for ln in lines]
    assert recs and {"step", "loss", "sec_per_step"} <= set(recs[0])
    # xplane trace captured
    assert any((wd / "xplane").rglob("*.xplane.pb")), list(
        (wd / "xplane").rglob("*"))
    # checkpoint saved
    assert (wd / "step_4").exists()


CLI_ENV = {"PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu"}


@pytest.fixture(scope="module")
def cli_world(tmp_path_factory):
    """Complete offline on-disk world for the eval/demo/CoT CLIs at tiny
    dims: tokenizer + deepseek-layout checkpoint + SAM .pth + datasets."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from flmm_tpu.configs.deepseek_vl import tiny
    from tests import cli_fixtures as fx

    root = tmp_path_factory.mktemp("cli_world")
    cfg = tiny()
    return {
        "tokenizer": str(fx.make_tokenizer(root / "tok")),
        "checkpoint": str(fx.make_deepseek_checkpoint(root / "ckpt", cfg)),
        "sam": str(fx.make_sam_checkpoint(root / "sam.pth",
                                          cfg.sam.encoder)),
        "refcoco": str(fx.make_refcoco_root(root / "coco")),
        "png": str(fx.make_png_root(root / "png")),
        "cot": fx.make_cot_benchmark(root / "cot"),
        "root": root,
    }


def _run(args, timeout=1500):
    proc = subprocess.run([sys.executable] + args, cwd=str(REPO),
                          capture_output=True, text=True, timeout=timeout,
                          env=CLI_ENV)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    return proc


@pytest.mark.slow
def test_eval_refcoco_cli_smoke(cli_world):
    proc = _run([
        "scripts/eval_refcoco.py", "--family", "deepseek_vl",
        "--preset", "tiny", "--checkpoint", cli_world["checkpoint"],
        "--sam-checkpoint", cli_world["sam"],
        "--tokenizer", cli_world["tokenizer"],
        "--data-root", cli_world["refcoco"],
        "--batch-size", "2", "--seq-len", "96", "--max-masks", "2",
        "--debug"])
    # last print is the aggregated per-split JSON
    results = json.loads(proc.stdout[proc.stdout.index('{\n'):])
    assert "refcoco/val" in results and "refcocog/test" in results
    for split in results.values():
        assert {"cIoU", "mIoU", "n"} <= set(split) and split["n"] >= 1


@pytest.mark.slow
def test_eval_png_cli_smoke(cli_world):
    proc = _run([
        "scripts/eval_png.py", "--family", "deepseek_vl",
        "--preset", "tiny", "--checkpoint", cli_world["checkpoint"],
        "--sam-checkpoint", cli_world["sam"],
        "--tokenizer", cli_world["tokenizer"],
        "--data-root", cli_world["png"],
        "--batch-size", "2", "--seq-len", "96", "--max-masks", "4",
        "--debug"])
    # the final print is indent=2 JSON (multi-line)
    start = proc.stdout.rindex('\n{') + 1 if '\n{' in proc.stdout else 0
    metrics = json.loads(proc.stdout[start:])
    assert "AA" in metrics and "aAcc@0.5" in metrics


@pytest.mark.slow
def test_grounded_conversation_cli_smoke(cli_world, tmp_path):
    from PIL import Image

    img = tmp_path / "demo.jpg"
    Image.new("RGB", (64, 48), (30, 90, 180)).save(img)
    out = tmp_path / "out.png"
    proc = _run([
        "scripts/demo/grounded_conversation.py", "--family", "deepseek_vl",
        "--preset", "tiny", "--checkpoint", cli_world["checkpoint"],
        "--sam-checkpoint", cli_world["sam"],
        "--tokenizer", cli_world["tokenizer"],
        "--image", str(img), "--text", "find the dog",
        "--max-new-tokens", "4", "--out", str(out)])
    # a random-weight tiny model may answer without any noun phrase; the
    # smoke asserts the wiring either grounded+saved or said so
    assert out.exists() or "no noun phrases" in proc.stdout


@pytest.mark.slow
def test_visual_cot_cli_smoke(cli_world, tmp_path):
    bench, images = cli_world["cot"]
    out = tmp_path / "cot_out"
    proc = _run([
        "scripts/visual_cot/visual_cot_inference.py",
        "--family", "deepseek_vl", "--preset", "tiny", "--version", "v1",
        "--checkpoint", cli_world["checkpoint"],
        "--sam-checkpoint", cli_world["sam"],
        "--tokenizer", cli_world["tokenizer"],
        "--benchmark-dir", str(bench), "--image-root", str(images),
        "--out", str(out), "--max-new-tokens", "4", "--limit", "1"])
    results = json.loads((out / "toy.json").read_text())
    assert results and {"question", "thought", "bbox", "answer"} <= set(
        results[0])


@pytest.mark.slow
def test_grounded_conversation_interactive_smoke(cli_world, tmp_path):
    """--interactive: two stdin turns with per-chunk confirmation
    (reference grounded_conversation.py:48) and conversation memory
    (frozen_deepseek_vl.py:492-512) -- driven over a pipe."""
    from PIL import Image

    img = tmp_path / "demo.jpg"
    Image.new("RGB", (64, 48), (30, 90, 180)).save(img)
    out = tmp_path / "chat.png"
    # answer 'y' to every per-chunk prompt; two questions then EOF
    stdin = "what do you see\ny\ny\ny\ny\nand where is it\ny\ny\ny\ny\n"
    proc = subprocess.run(
        [sys.executable, "scripts/demo/grounded_conversation.py",
         "--family", "deepseek_vl", "--preset", "tiny",
         "--checkpoint", cli_world["checkpoint"],
         "--sam-checkpoint", cli_world["sam"],
         "--tokenizer", cli_world["tokenizer"],
         "--image", str(img), "--interactive",
         "--max-new-tokens", "4", "--out", str(out)],
        cwd=str(REPO), capture_output=True, text=True, timeout=1500,
        input=stdin, env=CLI_ENV)
    assert proc.returncode == 0, (proc.stdout[-2000:], proc.stderr[-4000:])
    # at least two turns answered (the history thread exercised: answers
    # past the first carry the conversation memory); the random tiny
    # model's noun chunks are unpredictable, so extra scripted lines may
    # become further questions -- that only adds turns
    assert proc.stdout.count("Answer:") >= 2, proc.stdout[-2000:]
    assert "Ground " in proc.stdout, proc.stdout[-2000:]
