"""Breakdown benchmark: forward vs decode vs NMS cost on the real chip."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, arg, iters=10):
    """block_until_ready is a no-op over the axon tunnel; chain a device-side
    scalar across iterations and read it back once to force completion."""
    import jax
    import jax.numpy as jnp

    def scalarize(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves)

    float(scalarize(fn(arg)))  # warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + scalarize(fn(arg))
    _ = float(acc)
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
