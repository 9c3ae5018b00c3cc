"""Microbenchmark: head conv 255-ch (85/anchor) vs lane-padded 384-ch
(128/anchor) followed by the serving score reduction.

The (…, 3, 85) channel split forces XLA to relayout the whole P3 map
(~1.3 ms/batch128, tools/profile_infer.py). Padding each anchor's field dim
to 128 lanes makes the split layout-free but the 1x1 conv 50% wider. This
measures which wins end-to-end on the real chip.
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


def run(no_pad: int):
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.standard_normal((B, NY, NX, CIN)) * 0.1, jnp.bfloat16
    )
    w = jnp.asarray(
        rng.standard_normal((1, 1, CIN, NA * NO)) * 0.05, jnp.bfloat16
    )
    if no_pad != NO:
        wr = w.reshape(1, 1, CIN, NA, NO)
        wr = jnp.pad(wr, ((0, 0),) * 4 + ((0, no_pad - NO),))
        w2 = wr.reshape(1, 1, CIN, NA * no_pad)
    else:
        w2 = w

    def step(xp):
        y = lax.conv_general_dilated(
            xp, w2, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        r = y.reshape(B, NY, NX, NA, no_pad)
        cls = r[..., 5:NO]
        obj = r[..., 4]
        best = jnp.max(cls, axis=-1)
        score = jax.nn.sigmoid(obj.astype(jnp.float32)) * jax.nn.sigmoid(
            best.astype(jnp.float32)
        )
        flat = score.reshape(B, -1)
        top_s, top_i = jax.lax.approx_max_k(flat, 512, recall_target=0.95)
        xywh = r[..., :4].reshape(B, -1, 4)
        sel = jnp.take_along_axis(xywh, top_i[..., None], axis=1)
        return jnp.sum(top_s) + jnp.sum(sel.astype(jnp.float32)[:, 0, 0])

    @jax.jit
    def stream(xp, acc0):
        def body(carry, k):
            return carry + step(xp + k.astype(xp.dtype) * 0.001), ()

        acc, _ = jax.lax.scan(
            body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    acc = stream(x, jnp.zeros((), jnp.float32))
    _ = float(acc)
    t0 = time.perf_counter()
    acc = stream(x, jnp.zeros((), jnp.float32))
    for _ in range(ITERS - 1):
        acc = stream(x, acc)
    _ = float(acc)
    dt = (time.perf_counter() - t0) / (CHUNK * ITERS)
    print(f"no_pad={no_pad}: {dt * 1e3:.3f} ms/step")
    return dt


if __name__ == "__main__":
    t85 = run(85)
    t128 = run(128)
    print(f"pad-to-128 speedup: {t85 / t128:.3f}x")
