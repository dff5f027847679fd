#!/usr/bin/env python
"""Re-measure the reduced-resolution SAM schedule under one clock.

VERDICT r3 item 1: the README schedule table mixed round-2 numbers
(768/640, per-iter-fetch clock, pre-window-block kernels) with round-3
numbers (1024/448, chained clock).  This driver measures every
(sam_size, batch_size) point in ONE process with the current kernels and
the chained steady-state clock (bench.run), so the table is internally
comparable.  Run on the real chip, nothing else touching the relay:

    JAX_PLATFORMS=axon python scripts/schedule_bench.py \
        [--sizes 1024 768 640 448] [--batch-sizes 4 8] [--iters 6]

One JSON line per point; a final summary line with the best bs per size.
"""

from __future__ import annotations

import argparse
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1024, 768, 640, 448])
    ap.add_argument("--batch-sizes", type=int, nargs="*", default=[4, 8])
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--family", default="deepseek_vl")
    args = ap.parse_args()

    import bench

    os.environ["BENCH_FAMILY"] = args.family
    os.environ["BENCH_ITERS"] = str(args.iters)
    results = {}
    for size in args.sizes:
        os.environ["BENCH_SAM_SIZE"] = str(size)
        best = 0.0
        for bs in args.batch_sizes:
            t0 = time.perf_counter()
            try:
                ips = bench.run(bs, iters=args.iters)
            except Exception as e:
                print(json.dumps({"sam_size": size, "bs": bs,
                                  "error": f"{type(e).__name__}: {e}"[:300]}),
                      flush=True)
                continue
            print(json.dumps({
                "sam_size": size, "bs": bs, "img_per_s": round(ips, 3),
                "wall_incl_compile_s": round(time.perf_counter() - t0, 1),
            }), flush=True)
            best = max(best, ips)
        results[str(size)] = round(best, 3)
    print(json.dumps({"schedule_best_img_per_s": results,
                      "clock": "chained steady-state (bench.run)",
                      "iters": args.iters}))


if __name__ == "__main__":
    main()
