"""Benchmark: YOLOv5s@640 batched streaming inference throughput on one TPU
chip.

Prints ONE JSON line:
  {"metric": "yolov5s_640_images_per_sec", "value": N, "unit": "img/s",
   "vs_baseline": N}

vs_baseline is measured / (3 x A100 images/sec): the BASELINE.json north star
is ">3x A100 images/sec on one v5e chip". The reference publishes no numbers
(BASELINE.md), so the A100 anchor is the public ultralytics YOLOv5s@640
PyTorch FP16 batch-32 figure (~900 img/s on A100); vs_baseline >= 1.0 meets
the target.

The measured program is the full device-side inference path per image:
normalize (uint8 -> bf16/255) + forward + fused candidate-before-decode
postprocess + NMS. The measurement protocol (dispatch amortization,
anti-hoisting perturbation, readback barrier) is the shared harness in
vision_kit_tpu/utils/stream_bench.py.
"""

from __future__ import annotations

import json
import subprocess
import sys
import time

A100_IMAGES_PER_SEC = 900.0  # public ultralytics anchor (see docstring)
TARGET = 3.0 * A100_IMAGES_PER_SEC

BATCH = 128
CHUNK = 16   # micro-batches per dispatch
ITERS = 2    # timed dispatches

# Hang guard: the remote-TPU backend init blocks UNINTERRUPTIBLY (native
# connect-retry loop, immune to SIGINT) when the tunnel is down, so a bare
# run would hang the driver forever. The measurement itself therefore runs
# in a killable child (`--inner`); the parent bounds it generously (healthy
# runs need ~6 min handshake + remote compile on a cold cache), retries
# once, and fails loud with a JSON error line if the tunnel never answers.
import os

INNER_TIMEOUT_S = int(os.environ.get("VK_BENCH_INNER_TIMEOUT_S", 1500))
INNER_ATTEMPTS = int(os.environ.get("VK_BENCH_INNER_ATTEMPTS", 2))
RETRY_SLEEP_S = int(os.environ.get("VK_BENCH_RETRY_SLEEP_S", 90))


def guarded_main() -> int:
    for attempt in range(INNER_ATTEMPTS):
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--inner"],
                timeout=INNER_TIMEOUT_S, capture_output=True, text=True,
            )
        except subprocess.TimeoutExpired:
            r = None
        if r is not None and r.returncode == 0:
            # forward the child's JSON line (last line that parses)
            for line in reversed(r.stdout.strip().splitlines()):
                try:
                    json.loads(line)
                except ValueError:
                    continue
                print(line)
                return 0
        if r is not None:
            sys.stderr.write(r.stderr[-2000:])
        if attempt + 1 < INNER_ATTEMPTS:
            time.sleep(RETRY_SLEEP_S)
    print(json.dumps({
        "metric": "yolov5s_640_images_per_sec", "value": None,
        "unit": "img/s", "vs_baseline": None,
        "error": "bench did not complete (TPU tunnel down or compile "
                 f"exceeded {INNER_ATTEMPTS}x{INNER_TIMEOUT_S}s)",
    }))
    return 2


def main():
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.utils.stream_bench import run_detector_bench

    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    print(json.dumps(run_detector_bench(
        model, "yolov5s_640_images_per_sec", batch=BATCH, chunk=CHUNK,
        iters=ITERS, target=TARGET,
    )))


if __name__ == "__main__":
    if "--inner" in sys.argv[1:]:
        main()
    else:
        sys.exit(guarded_main())
