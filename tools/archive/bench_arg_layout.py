"""Microbench: does pre-laying-out the weight buffers recover the
weights-as-arguments protocol cost? (round 4)

Switching the streamed bench from closure-literal weights to argument
weights cost ~3.5% on v5s (3979 -> 3840 img/s). Hypothesis: with literal
weights XLA bakes the conv kernels in their tiled MXU layouts at compile
time; as arguments they arrive in the default row-major layout and the
program relayouts them (or compiles worse). Test: compile the same step
with `Format(Layout.AUTO)` on the weights argument, `jax.device_put` the
params into the compiled program's chosen input formats ONCE, and stream.

  python tools/archive/bench_arg_layout.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))))

import numpy as np

BATCH, CHUNK, ITERS, SIZE = 128, 16, 2, 640


def main():
    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()

    import jax
    import jax.numpy as jnp
    from jax.experimental.layout import Format, Layout

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess_raw

    print("device:", jax.devices()[0].platform, flush=True)

    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, SIZE, SIZE, 3)), training=False
    )
    anchors_px = model.anchors_px

    def step(variables, x_u8):
        _, raws = model.apply(variables, x_u8, training=False)
        dets, valid = postprocess_raw(
            raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32)
        )

    def stream_fn(variables, imgs, acc0):
        def body(carry, k):
            x = imgs + k.astype(jnp.uint8)
            return carry + step(variables, x), ()

        acc, _ = jax.lax.scan(
            body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, SIZE, SIZE, 3), dtype=np.uint8))

    def measure(fn, variables, tag):
        acc = fn(variables, images, jnp.zeros((), jnp.int32))
        _ = int(acc)
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.int32)
        for _ in range(ITERS):
            acc = fn(variables, images, acc)
        _ = int(acc)
        ips = BATCH * CHUNK * ITERS / (time.perf_counter() - t0)
        print(f"{tag}: {ips:.1f} img/s", flush=True)
        return ips

    # (a) plain argument protocol (current bench.py)
    measure(jax.jit(stream_fn), variables, "args/default-layout")

    # (b) AUTO layouts on the weights, params device_put once
    auto = jax.tree_util.tree_map(
        lambda _: Format(Layout.AUTO), variables)
    jitted = jax.jit(stream_fn, in_shardings=(
        auto, Format(Layout.AUTO), Format(Layout.AUTO)))
    compiled = jitted.lower(
        jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), variables),
        jax.ShapeDtypeStruct(images.shape, images.dtype),
        jax.ShapeDtypeStruct((), jnp.int32),
    ).compile()
    fmt_vars, fmt_imgs, fmt_acc = compiled.input_formats[0]
    v_put = jax.device_put(variables, fmt_vars)
    imgs_put = jax.device_put(images, fmt_imgs)

    def run_compiled(variables, imgs, acc0):
        return compiled(variables, imgs, jax.device_put(acc0, fmt_acc))

    acc = run_compiled(v_put, imgs_put, jnp.zeros((), jnp.int32))
    _ = int(acc)
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(ITERS):
        acc = run_compiled(v_put, imgs_put, acc)
    _ = int(acc)
    ips = BATCH * CHUNK * ITERS / (time.perf_counter() - t0)
    print(f"args/auto-layout: {ips:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
