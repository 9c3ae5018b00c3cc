"""In-scan stage split: forward-only vs +fused postprocess vs eval-style
postprocess, measured the same way bench.py measures (scan-amortized, one
readback), so numbers are dispatch-free marginals."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, CHUNK, ITERS = 128, 8, 2


def run(mode):
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess, postprocess_raw

    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    @jax.jit
    def stream(images_u8, acc0):
        def step(carry, k):
            x = (images_u8 + k.astype(jnp.uint8)).astype(jnp.bfloat16) \
                * jnp.bfloat16(1.0 / 255.0)
            decoded, raws = model.apply(variables, x, training=False)
            if mode == "forward":
                out = jnp.sum(raws[0][..., 0].astype(jnp.float32))
            elif mode == "fused":
                dets, valid = postprocess_raw(
                    raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
                    max_det=300, max_cand=512, approx_topk=True)
                out = jnp.sum(valid) + jnp.sum(dets[:, 0, 0])
            elif mode == "decoded":
                dets, valid = postprocess(
                    decoded, conf_thres=0.25, iou_thres=0.45,
                    max_det=300, max_cand=512)
                out = jnp.sum(valid) + jnp.sum(dets[:, 0, 0])
            elif mode == "eval":
                dets, valid = postprocess(
                    decoded, conf_thres=0.001, iou_thres=0.6,
                    multi_label=True, max_det=300, max_cand=2048)
                out = jnp.sum(valid) + jnp.sum(dets[:, 0, 0])
            elif mode == "eval_fast":
                dets, valid = postprocess(
                    decoded, conf_thres=0.001, iou_thres=0.6,
                    multi_label=True, max_det=300, max_cand=2048,
                    multi_label_top=20)
                out = jnp.sum(valid) + jnp.sum(dets[:, 0, 0])
            return carry + out.astype(jnp.float32), ()

        acc, _ = jax.lax.scan(step, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8))
    _ = float(stream(images, jnp.zeros((), jnp.float32)))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(ITERS):
        acc = stream(images, acc)
    _ = float(acc)
    dt = time.perf_counter() - t0
    ms = dt / (ITERS * CHUNK) * 1e3
    print(json.dumps({"mode": mode, "ms_per_128": round(ms, 2),
                      "img_per_sec": round(BATCH * CHUNK * ITERS / dt, 1)}),
          flush=True)


def main():
    for mode in sys.argv[1:] or ("forward", "fused", "decoded", "eval"):
        run(mode)


if __name__ == "__main__":
    main()
