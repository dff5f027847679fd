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
