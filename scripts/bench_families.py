#!/usr/bin/env python
"""Collect the per-family throughput matrix into BENCH_FAMILIES.json.

Runs ``bench.py`` (same driver contract) once per flagship preset at
reference-exact SAM-1024 and records img/s + the serving mode that fits
one 16 GB v5e chip.  7B/8B decoders do not fit in bf16 at batch >= 2
(13.6 GB weights; measured OOM), so those rows also record the int8
W8A8 serving point (BENCH_QUANT_LLM=1; llm.decoder.quantize_params).

Usage: python scripts/bench_families.py [--families a,b,c] [--out f]
Each run is a subprocess so OOM fall-through cannot poison the next
family's device state.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).resolve().parent.parent

# family -> list of (tag, extra env) serving points to try in order;
# the first successful row per family is the headline
PLAN = {
    "deepseek_vl": [("bf16", {})],
    "mgm": [("bf16", {})],
    "llava": [("bf16_bs1", {"BENCH_BS": "1"}),
              ("int8_llm", {"BENCH_QUANT_LLM": "1", "BENCH_BS": "4,2,1"})],
    "llava_next": [("int8_llm", {"BENCH_QUANT_LLM": "1",
                                 "BENCH_BS": "4,2,1"}),
                   ("bf16_bs1", {"BENCH_BS": "1"})],
    "hpt": [("int8_llm", {"BENCH_QUANT_LLM": "1", "BENCH_BS": "4,2,1"})],
}


def run_one(family: str, tag: str, extra: dict, sam_size: int,
            timeout: int) -> dict:
    env = dict(os.environ, BENCH_FAMILY=family,
               BENCH_SAM_SIZE=str(sam_size), **extra)
    try:
        proc = subprocess.run(
            [sys.executable, "bench.py"], cwd=str(REPO), env=env,
            capture_output=True, text=True, timeout=timeout)
    except subprocess.TimeoutExpired:
        return {"family": family, "mode": tag, "error": "timeout"}
    line = next((ln for ln in proc.stdout.splitlines()[::-1]
                 if ln.startswith("{")), None)
    if proc.returncode != 0 or line is None:
        return {"family": family, "mode": tag,
                "error": (proc.stderr.strip().splitlines() or ["?"])[-1][:200]}
    out = json.loads(line)
    out.update({"family": family, "mode": tag})
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", default=",".join(PLAN))
    ap.add_argument("--sam-size", type=int, default=1024)
    ap.add_argument("--timeout", type=int, default=4200)
    ap.add_argument("--out", default=str(REPO / "BENCH_FAMILIES.json"))
    args = ap.parse_args()

    out_path = pathlib.Path(args.out)
    results = (json.loads(out_path.read_text())
               if out_path.exists() else {"sam_size": args.sam_size,
                                          "rows": []})
    for family in args.families.split(","):
        for tag, extra in PLAN[family]:
            print(f"== {family} [{tag}] ==", flush=True)
            row = run_one(family, tag, extra, args.sam_size, args.timeout)
            print(json.dumps(row), flush=True)
            results["rows"] = [r for r in results["rows"]
                               if not (r.get("family") == family
                                       and r.get("mode") == tag)]
            results["rows"].append(row)
            out_path.write_text(json.dumps(results, indent=1))
            if "error" not in row:
                break  # headline point found for this family


if __name__ == "__main__":
    main()
