"""Sweep (BATCH, CHUNK, max_cand) for the streaming inference bench."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run(batch, chunk, iters, max_cand):
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess

    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )

    @jax.jit
    def infer_stream(images_u8, acc0):
        def step(carry, k):
            x_u8 = images_u8 + k.astype(jnp.uint8)
            x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
            decoded, _ = model.apply(variables, x, training=False)
            dets, valid = postprocess(
                decoded, conf_thres=0.25, iou_thres=0.45,
                max_det=300, max_cand=max_cand, approx_topk=True,
            )
            carry = carry + jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
                dets[:, 0, 0].astype(jnp.int32)
            )
            return carry, ()

        acc, _ = jax.lax.scan(step, acc0, jnp.arange(chunk, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    )
    acc = infer_stream(images, jnp.zeros((), jnp.int32))
    _ = int(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        acc = infer_stream(images, acc)
    _ = int(acc)
    dt = time.perf_counter() - t0
    return batch * chunk * iters / dt


CONFIGS = (
    (128, 8, 4, 1024),
    (256, 4, 4, 1024),
    (256, 8, 2, 1024),
    (128, 8, 4, 512),
    (64, 16, 4, 1024),
)


def main():
    sel = [int(a) for a in sys.argv[1:]] or range(len(CONFIGS))
    for batch, chunk, iters, max_cand in (CONFIGS[i] for i in sel):
        try:
            ips = run(batch, chunk, iters, max_cand)
            print(json.dumps({
                "batch": batch, "chunk": chunk, "max_cand": max_cand,
                "img_per_sec": round(ips, 1),
            }), flush=True)
        except Exception as e:
            print(json.dumps({
                "batch": batch, "chunk": chunk, "max_cand": max_cand,
                "error": str(e)[:200],
            }), flush=True)


if __name__ == "__main__":
    main()
