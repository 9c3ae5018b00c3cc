"""Micro-benchmarks for inference hot spots on the real chip:
stem conv (3-ch, MXU-hostile) vs its space-to-depth rewrite, top_k cost in
candidate selection, and the NMS greedy scan."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=10):
    import jax
    import jax.numpy as jnp

    def scal(out):
        leaves = jax.tree_util.tree_leaves(out)
        return sum(jnp.sum(x[..., :1].astype(jnp.float32)) for x in leaves)

    float(scal(fn(*args)))
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.float32)
    for _ in range(iters):
        acc = acc + scal(fn(*args))
    _ = float(acc)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    B = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (B, 640, 640, 3)).astype(np.float32)
                    ).astype(jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 0.1, (6, 6, 3, 32)).astype(np.float32)
                    ).astype(jnp.bfloat16)

    @jax.jit
    def stem(x):
        return jax.lax.conv_general_dilated(
            x, w, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # space-to-depth rewrite: x -> (B, 320, 320, 12), w -> (3, 3, 12, 32)
    @jax.jit
    def stem_s2d(x):
        b, h, wd, c = x.shape
        xs = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
        xs = xs.reshape(b, h // 2, wd // 2, 4 * c)
        # phase-major weight layout matching (2, 2, c) flatten above
        ws = w.reshape(3, 2, 3, 2, 3, 32).transpose(0, 2, 1, 3, 4, 5)
        ws = ws.reshape(3, 3, 12, 32)
        return jax.lax.conv_general_dilated(
            xs, ws, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    print(json.dumps({"op": "stem_6x6s2", "ms": round(timeit(stem, x), 3)}), flush=True)
    print(json.dumps({"op": "stem_s2d_3x3", "ms": round(timeit(stem_s2d, x), 3)}), flush=True)
    # numerical equivalence check (up to bf16 rounding)
    a = np.asarray(stem(x[:1]).astype(jnp.float32))
    b = np.asarray(stem_s2d(x[:1]).astype(jnp.float32))
    print(json.dumps({"op": "s2d_maxdiff", "v": float(np.abs(a - b).max())}), flush=True)

    scores = jnp.asarray(rng.uniform(0, 1, (B, 25200)).astype(np.float32))
    for k in (1024, 512, 300):
        t = timeit(jax.jit(lambda s, k=k: jax.lax.top_k(s, k)), scores)
        print(json.dumps({"op": f"top_k_{k}", "ms": round(t, 3)}), flush=True)

    sb = jnp.asarray(rng.uniform(0, 1, (B, 25200)).astype(np.float32)
                     ).astype(jnp.bfloat16)
    t = timeit(jax.jit(lambda s: jax.lax.top_k(s, 1024)), sb)
    print(json.dumps({"op": "top_k_1024_bf16", "ms": round(t, 3)}), flush=True)

    # argsort alternative
    t = timeit(jax.jit(lambda s: jax.lax.sort(s, dimension=1)), scores)
    print(json.dumps({"op": "full_sort", "ms": round(t, 3)}), flush=True)

    # decode+nms split at B=128 (same as bench_parts but isolated pieces)
    from vision_kit_tpu.ops.nms import _greedy_keep_blocked
    boxes = jnp.asarray(rng.uniform(0, 600, (B, 1024, 4)).astype(np.float32))
    valid = jnp.ones((B, 1024), bool)
    t = timeit(jax.jit(jax.vmap(
        lambda bx, v: _greedy_keep_blocked(bx, v, 0.45))), boxes, valid)
    print(json.dumps({"op": "greedy_nms_1024", "ms": round(t, 3)}), flush=True)
    boxes5 = jnp.asarray(rng.uniform(0, 600, (B, 512, 4)).astype(np.float32))
    valid5 = jnp.ones((B, 512), bool)
    t = timeit(jax.jit(jax.vmap(
        lambda bx, v: _greedy_keep_blocked(bx, v, 0.45))), boxes5, valid5)
    print(json.dumps({"op": "greedy_nms_512", "ms": round(t, 3)}), flush=True)


if __name__ == "__main__":
    main()
