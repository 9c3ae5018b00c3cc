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
    from vision_kit_tpu.utils.stream_bench import measure_streaming

    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    def step(x_u8):
        x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        _, raws = model.apply(variables, x, training=False)
        dets, valid = postprocess_raw(
            raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32)
        )

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8)
    )
    images_per_sec = measure_streaming(step, images, CHUNK, ITERS)
    print(json.dumps({
        "metric": "yolov5s_640_images_per_sec",
        "value": round(images_per_sec, 2),
        "unit": "img/s",
        "vs_baseline": round(images_per_sec / TARGET, 3),
    }))


if __name__ == "__main__":
    main()
