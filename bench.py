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
normalize (uint8 -> bf16/255) + forward + decode + fixed-shape NMS. A
lax.scan runs CHUNK micro-batches per dispatch with a perturbed input each
step (so XLA cannot hoist any per-image work out of the loop) — this
amortizes the per-dispatch host round-trip of the tunneled test harness,
which is a harness artifact, not device time. Completion is forced by a
single device->host readback of the accumulated valid-detection count
(block_until_ready does not block over the axon tunnel).
"""

from __future__ import annotations

import json
import time

import numpy as np

A100_IMAGES_PER_SEC = 900.0  # public ultralytics anchor (see docstring)
TARGET = 3.0 * A100_IMAGES_PER_SEC

BATCH = 128
CHUNK = 16   # micro-batches per dispatch
ITERS = 2    # timed dispatches


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess_raw

    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    @jax.jit
    def infer_stream(images_u8, acc0):
        def step(carry, k):
            # per-step perturbation: content differs every iteration, so the
            # normalize/forward/NMS chain is not loop-invariant
            x_u8 = images_u8 + k.astype(jnp.uint8)
            x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
            _, raws = model.apply(variables, x, training=False)
            dets, valid = postprocess_raw(
                raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
                max_det=300, max_cand=512, approx_topk=True,
            )
            carry = carry + jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
                dets[:, 0, 0].astype(jnp.int32)
            )
            return carry, ()

        acc, _ = jax.lax.scan(step, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8)
    )

    # warmup / compile
    acc = infer_stream(images, jnp.zeros((), jnp.int32))
    _ = int(acc)

    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(ITERS):
        acc = infer_stream(images, acc)
    _ = int(acc)  # single readback; waits for every dispatched program
    dt = time.perf_counter() - t0

    images_per_sec = BATCH * CHUNK * ITERS / dt
    print(json.dumps({
        "metric": "yolov5s_640_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(images_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
