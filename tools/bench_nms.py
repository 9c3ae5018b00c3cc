"""NMS-only microbenchmark: max_cand sweep + suppression variants."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.ops.nms import postprocess

    b, n, nc = 128, 25200, 80
    rng = np.random.default_rng(0)
    preds = np.zeros((b, n, 5 + nc), np.float32)
    preds[..., 0] = rng.uniform(0, 640, (b, n))
    preds[..., 1] = rng.uniform(0, 640, (b, n))
    preds[..., 2] = rng.uniform(5, 120, (b, n))
    preds[..., 3] = rng.uniform(5, 120, (b, n))
    preds[..., 4] = rng.uniform(0, 1, (b, n))
    preds[..., 5:] = rng.uniform(0, 1, (b, n, nc))
    preds = jnp.asarray(preds)

    for max_cand in (256, 512, 1024, 2048):
        fn = jax.jit(lambda p, mc=max_cand: postprocess(
            p, conf_thres=0.25, iou_thres=0.45, max_det=300, max_cand=mc))
        jax.block_until_ready(fn(preds))
        t0 = time.perf_counter()
        for _ in range(10):
            out = fn(preds)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 10
        print(f"max_cand={max_cand}: {dt*1e3:.2f} ms/batch "
              f"({b/dt:.0f} img/s NMS-only)", flush=True)


if __name__ == "__main__":
    main()
