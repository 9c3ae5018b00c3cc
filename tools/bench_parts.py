"""Breakdown benchmark: forward vs decode vs NMS cost on the real chip."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, arg, iters=10):
    import jax

    jax.block_until_ready(fn(arg))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = fn(arg)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess

    size = 640
    results = {}
    for batch in (64, 128):
        model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)),
            training=False,
        )

        @jax.jit
        def fwd_raw(images):
            out, _ = model.apply(
                variables, images, training=True, mutable=["batch_stats"]
            )
            return out

        @jax.jit
        def fwd_decode(images):
            decoded, _ = model.apply(variables, images, training=False)
            return decoded

        @jax.jit
        def fwd_full(images):
            decoded, _ = model.apply(variables, images, training=False)
            return postprocess(
                decoded.astype(jnp.float32), conf_thres=0.25, iou_thres=0.45,
                max_det=300, max_cand=1024,
            )

        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(0, 1, (batch, size, size, 3)).astype(np.float32)
        )
        t_raw = timeit(fwd_raw, images)
        t_dec = timeit(fwd_decode, images)
        t_full = timeit(fwd_full, images)
        results[batch] = dict(
            raw_ms=t_raw * 1e3, decode_ms=t_dec * 1e3, full_ms=t_full * 1e3,
            raw_ips=batch / t_raw, decode_ips=batch / t_dec,
            full_ips=batch / t_full,
        )
        print(batch, json.dumps({k: round(v, 2) for k, v in results[batch].items()}), flush=True)


if __name__ == "__main__":
    main()
