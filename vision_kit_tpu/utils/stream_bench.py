"""Shared scan-amortized streaming benchmark harness.

The tunneled TPU test harness costs ~20 ms per program dispatch and
`block_until_ready` does not block (CLAUDE.md), so throughput measurements
must run CHUNK micro-batches per dispatch inside one `lax.scan` — with the
input perturbed per step so XLA cannot hoist the work — and force
completion with one device->host readback at the end. One implementation,
used by bench.py, tools/bench_v7.py (and the protocol reference for
tools/bench_split.py's mode variants).
"""

from __future__ import annotations

import time


def measure_streaming(step_fn, images_u8, chunk: int, iters: int,
                      params=None) -> float:
    """Measure images/sec of `step_fn(images_u8) -> int32 scalar` (or
    `step_fn(params, images_u8)` when `params` is given).

    step_fn must consume a uint8 image batch and return a small scalar that
    depends on its full computation (the completion token). The harness
    adds the per-step perturbation, the scan, warmup, and the readback.
    Returns images per second.

    Pass model weights via `params`, NOT closed over in step_fn: closure
    constants are serialized as literals inside the unoptimized HLO, and
    the remote-compile tunnel rejects requests past ~300 MB (v5x fp32
    params alone exceed it — HTTP 413).
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def stream(params, imgs, acc0):
        def body(carry, k):
            x = imgs + k.astype(jnp.uint8)   # content differs per step
            out = step_fn(x) if params is None else step_fn(params, x)
            return carry + out, ()

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(chunk, dtype=jnp.int32))
        return acc

    acc = stream(params, images_u8, jnp.zeros((), jnp.int32))
    _ = int(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        acc = stream(params, images_u8, acc)
    _ = int(acc)  # single readback; waits for every dispatched program
    dt = time.perf_counter() - t0
    return images_u8.shape[0] * chunk * iters / dt


def run_detector_bench(model, metric: str, batch: int, chunk: int,
                       iters: int, size: int = 640, target: float | None = None,
                       seed: int = 0) -> dict:
    """End-to-end detector throughput: normalize + forward + fused
    candidate-before-decode postprocess + NMS (the bench.py protocol),
    parameterized by model. Returns the printed-record dict."""
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.ops.nms import postprocess_raw

    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    def step(variables, x_u8):
        # uint8 goes straight into the model; the stem normalizes internally
        # (models/layers.py ConvBnAct) — bit-identical to caller-side
        # normalize, one fewer elementwise pass
        _, raws = model.apply(variables, x_u8, training=False)
        dets, valid = postprocess_raw(
            raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32)
        )

    rng = np.random.default_rng(seed)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    )
    ips = measure_streaming(step, images, chunk, iters, params=variables)
    record = {"metric": metric, "value": round(ips, 2), "unit": "img/s"}
    if target:
        record["vs_baseline"] = round(ips / target, 3)
    return record
