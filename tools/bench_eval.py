"""Validation-epoch device cost: the eval step (EMA forward + eval-protocol
decode + multi-label NMS, conf 0.001 / IoU 0.6 / max_cand 2048 — heavier
than the serving postprocess) on the real chip.

    python tools/bench_eval.py [batch] [v7]

Scan-amortized protocol (utils/stream_bench.py rationale; the tunnel costs
~20 ms/dispatch and block_until_ready is a no-op).
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5, YOLOV7
    from vision_kit_tpu.train.optim import make_optimizer
    from vision_kit_tpu.train.step import create_train_state, make_eval_step

    batch = next((int(a) for a in sys.argv[1:] if a.isdigit()), 64)
    size = 640
    use_v7 = "v7" in sys.argv[1:]
    if use_v7:
        model = YOLOV7(variant="base", num_classes=80, dtype=jnp.bfloat16)
        name = "yolov7b"
    else:
        model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
        name = "yolov5s"
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    hyp = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937,
           "weight_decay": 0.0005, "warmup_epochs": 3.0,
           "warmup_bias_lr": 0.1, "warmup_momentum": 0.8}
    tx = make_optimizer(variables["params"], hyp, 300, 1000)
    state = create_train_state(variables, tx)
    eval_step = make_eval_step(model)

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))

    chunk, iters = 8, 2

    @jax.jit
    def stream(state, imgs, acc0):
        def body(carry, k):
            dets, valid = eval_step(state, imgs + k.astype(jnp.uint8))
            return carry + jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
                dets[:, 0, 0].astype(jnp.int32)), ()

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(chunk, dtype=jnp.int32))
        return acc

    acc = stream(state, images, jnp.zeros((), jnp.int32))
    _ = int(acc)  # compile + warm
    t0 = time.perf_counter()
    acc = jnp.zeros((), jnp.int32)
    for _ in range(iters):
        acc = stream(state, images, acc)
    _ = int(acc)
    dt = time.perf_counter() - t0
    n = batch * chunk * iters
    print(f"eval {name}@{size} b{batch}: {dt / (chunk * iters) * 1e3:.1f} "
          f"ms/batch, {n / dt:.1f} img/s (eval-protocol NMS)")


if __name__ == "__main__":
    main()
