"""Microbenchmark: two ways to compute the serving score map from the
255-channel head conv output.

a) split: reshape (B,H,W,255) -> (B,H,W,3,85), slice obj/cls, reduce.
   XLA materializes a full-map relayout copy for the non-lane-aligned split
   (~1.3 ms/batch128, tools/profile_infer.py).
b) slices: per-anchor channel slices straight off the (B,H,W,255) map
   (obj at 4+85a, cls at 5+85a : 85(a+1)), reduce each, stack. No (3,85)
   split anywhere.

Both end in the same approx_top_k + xywh gather so the comparison is
end-to-end for the selection stage.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

B, NY, NX, CIN = 128, 80, 80, 128
NA, NO = 3, 85
CHUNK, ITERS = 8, 2


def run(mode: str):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, NY, NX, CIN)) * 0.1, jnp.bfloat16)
    w = jnp.asarray(
        rng.standard_normal((1, 1, CIN, NA * NO)) * 0.05, jnp.bfloat16)

    def step(xp):
        y = lax.conv_general_dilated(
            xp, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )                                            # (B, NY, NX, 255)
        if mode == "split":
            r = y.reshape(B, NY, NX, NA, NO)
            obj = r[..., 4]                          # (B, NY, NX, NA)
            best = jnp.max(r[..., 5:], axis=-1)
            xywh = r[..., :4].reshape(B, -1, 4)
        else:
            objs, bests, xywhs = [], [], []
            for a in range(NA):
                base = a * NO
                objs.append(y[..., base + 4])
                bests.append(jnp.max(y[..., base + 5:base + NO], axis=-1))
                xywhs.append(y[..., base:base + 4])
            obj = jnp.stack(objs, axis=-1)           # (B, NY, NX, NA)
            best = jnp.stack(bests, axis=-1)
            xywh = jnp.stack(xywhs, axis=-2).reshape(B, -1, 4)
        score = jax.nn.sigmoid(obj.astype(jnp.float32)) * jax.nn.sigmoid(
            best.astype(jnp.float32))
        flat = score.reshape(B, -1)
        top_s, top_i = jax.lax.approx_max_k(flat, 512, recall_target=0.95)
        sel = jnp.take_along_axis(xywh, top_i[..., None], axis=1)
        return jnp.sum(top_s) + jnp.sum(sel.astype(jnp.float32)[:, 0, 0])

    @jax.jit
    def stream(xp, acc0):
        def body(carry, t):
            return carry + step(xp + t.astype(xp.dtype) * 0.001), ()

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    acc = stream(x, jnp.zeros((), jnp.float32))
    _ = float(acc)
    t0 = time.perf_counter()
    acc = stream(x, jnp.zeros((), jnp.float32))
    for _ in range(ITERS - 1):
        acc = stream(x, acc)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / (CHUNK * ITERS)
    print(f"{mode}: {dt * 1e3:.3f} ms/step", flush=True)
    return dt


if __name__ == "__main__":
    t_split = run("split")
    t_slices = run("slices")
    print(f"slices speedup over split: {t_split / t_slices:.3f}x")
