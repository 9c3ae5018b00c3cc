"""Microbenchmark: is s8 x s8 -> s32 conv faster than bf16 on this TPU?

Times a stack of representative YOLOv5s convs (640-input shapes) in bf16 vs
int8 (weights and activations quantized, int32 accumulation) to decide
whether a quantized serving path is worth building. Uses the streaming
protocol from utils/stream_bench.py (scan-amortized, single readback).
"""

from __future__ import annotations

import time

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# (batch, h, w, cin, cout, k, stride) — mid-network v5s shapes where the
# FLOPs live
SHAPES = [
    (32, 80, 80, 128, 128, 3, 1),
    (32, 40, 40, 256, 256, 3, 1),
    (32, 20, 20, 512, 512, 3, 1),
]
CHUNK = 8
ITERS = 3


def conv(x, w, stride, acc_dtype):
    return lax.conv_general_dilated(
        x, w, (stride, stride), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_dtype,
    )


def bench(dtype_name: str):
    rng = np.random.default_rng(0)
    xs, ws = [], []
    for (b, h, w, cin, cout, k, s) in SHAPES:
        if dtype_name == "bf16":
            x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.bfloat16)
            wt = jnp.asarray(
                rng.standard_normal((k, k, cin, cout)) * 0.05, jnp.bfloat16
            )
        else:
            x = jnp.asarray(
                rng.integers(-127, 127, (b, h, w, cin)), jnp.int8
            )
            wt = jnp.asarray(
                rng.integers(-127, 127, (k, k, cin, cout)), jnp.int8
            )
        xs.append(x)
        ws.append(wt)

    acc_dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.int32

    @jax.jit
    def stream(xs, acc0):
        def body(carry, t):
            tot = carry
            for (x, wt, (b, h, w_, cin, cout, k, s)) in zip(xs, ws, SHAPES):
                xp = x + t.astype(x.dtype)
                y = conv(xp, wt, s, acc_dtype)
                tot = tot + jnp.sum(y[:1, :1, :1, :1].astype(jnp.float32))
            return tot, ()

        acc, _ = lax.scan(body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    acc = stream(xs, jnp.zeros((), jnp.float32))
    _ = float(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = stream(xs, jnp.zeros((), jnp.float32))
    for _ in range(ITERS - 1):
        acc = stream(xs, acc)
    _ = float(acc)
    dt = time.perf_counter() - t0

    flops = sum(
        2 * b * (h // s) * (w_ // s) * cin * cout * k * k
        for (b, h, w_, cin, cout, k, s) in SHAPES
    ) * CHUNK * ITERS
    print(f"{dtype_name}: {dt * 1e3 / (CHUNK * ITERS):.3f} ms/step, "
          f"{flops / dt / 1e12:.1f} T(FL)OP/s")
    return dt


if __name__ == "__main__":
    t_bf16 = bench("bf16")
    t_int8 = bench("int8")
    print(f"int8 speedup over bf16: {t_bf16 / t_int8:.2f}x")
