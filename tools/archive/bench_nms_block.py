"""Block-size sweep for the blocked exact-greedy NMS keep-mask
(_greedy_keep_blocked) at serving shapes (B=128, K=512), scan-amortized.
Bigger blocks = fewer sequential chunk steps but larger per-chunk IoU work
and a longer within-chunk fixed point."""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, K = 128, 512
CHUNK, ITERS = 16, 2


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.ops.nms import _greedy_keep_blocked

    rng = np.random.default_rng(0)
    x1y1 = rng.uniform(0, 600, (B, K, 2))
    wh = rng.uniform(10, 150, (B, K, 2))
    boxes = jnp.asarray(
        np.concatenate([x1y1, x1y1 + wh], -1), jnp.float32)
    valid = jnp.ones((B, K), bool)

    for block in (64, 128, 256, 512):
        @jax.jit
        def stream(bx, acc0, blk=block):
            def body(carry, t):
                bxp = bx + t.astype(jnp.float32)
                keep = jax.vmap(
                    lambda bb, v: _greedy_keep_blocked(
                        bb, v, 0.45, block=blk)
                )(bxp, valid)
                return carry + jnp.sum(keep.astype(jnp.int32)), ()

            acc, _ = jax.lax.scan(
                body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
            return acc

        acc = stream(boxes, jnp.zeros((), jnp.int32))
        _ = int(acc)
        t0 = time.perf_counter()
        acc = stream(boxes, jnp.zeros((), jnp.int32))
        for _ in range(ITERS - 1):
            acc = stream(boxes, acc)
        _ = int(acc)
        dt = (time.perf_counter() - t0) / (CHUNK * ITERS)
        print(f"block={block}: {dt * 1e3:.3f} ms per (B={B}, K={K})",
              flush=True)


if __name__ == "__main__":
    main()
