"""Train-step cost split on the real chip: forward+loss, fwd+bwd (dummy
loss), full step (loss+bwd+optimizer+EMA). Scan-amortized like bench.py."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, CHUNK, ITERS = 32, 8, 2


def run(mode):
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.train.losses import YoloLoss
    from vision_kit_tpu.train.optim import make_optimizer
    from vision_kit_tpu.train.step import create_train_state, make_train_step

    hyp = {
        "lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
        "warmup_epochs": 3.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
        "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
        "anchor_t": 4.0, "label_smoothing": 0.0,
    }
    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    loss_fn = YoloLoss(80, model.grid_anchors, hyp)
    tx = make_optimizer(variables["params"], hyp, 300, 1000)
    state = create_train_state(variables, tx)

    rng = np.random.default_rng(0)
    targets = jnp.asarray(np.where(
        np.arange(64)[None, :, None] < 8,
        np.concatenate([
            rng.integers(0, 80, (BATCH, 64, 1)).astype(np.float32),
            rng.uniform(0.2, 0.8, (BATCH, 64, 4)).astype(np.float32),
        ], -1),
        -1.0,
    ).astype(np.float32))
    images = jnp.asarray(
        rng.uniform(0, 1, (BATCH, size, size, 3)).astype(np.float32))

    if mode == "full":
        step = make_train_step(model, loss_fn, tx, donate=False)
        # dispatch-loop timing (not scan-amortized: the jitted step owns its
        # own jit boundary; donate=False so state reuse is fine)
        st = state
        st, m = step(st, {"image": images, "targets": targets})
        float(m["loss"])
        t0 = time.perf_counter()
        for _ in range(CHUNK * ITERS):
            st, m = step(st, {"image": images, "targets": targets})
        float(m["loss"])
        dt = time.perf_counter() - t0
    else:
        if mode == "fwd_only":
            def one(imgs, tg):
                preds, _ = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    imgs, training=True, mutable=["batch_stats"])
                return sum(jnp.sum(p[..., :1].astype(jnp.float32))
                           for p in preds)
        elif mode == "fwd_loss":
            def one(imgs, tg):
                preds, _ = model.apply(
                    {"params": state.params, "batch_stats": state.batch_stats},
                    imgs, training=True, mutable=["batch_stats"])
                total, parts = loss_fn(preds, tg)
                return total
        elif mode == "fwd_bwd_dummy":
            def dummy(params, imgs):
                preds, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, training=True, mutable=["batch_stats"])
                return sum(jnp.sum(p.astype(jnp.float32) ** 2) for p in preds)

            def one(imgs, tg):
                g = jax.grad(dummy)(state.params, imgs)
                return sum(jnp.sum(l[..., :1].astype(jnp.float32))
                           for l in jax.tree_util.tree_leaves(g))
        elif mode == "fwd_bwd_loss":
            def real(params, imgs, tg):
                preds, _ = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    imgs, training=True, mutable=["batch_stats"])
                total, _ = loss_fn(preds, tg)
                return total

            def one(imgs, tg):
                g = jax.grad(real)(state.params, imgs, tg)
                return sum(jnp.sum(l[..., :1].astype(jnp.float32))
                           for l in jax.tree_util.tree_leaves(g))

        @jax.jit
        def stream(imgs, tg, acc0):
            def body(carry, k):
                x = imgs + k.astype(jnp.float32) * 1e-9
                return carry + one(x, tg).astype(jnp.float32), ()
            acc, _ = jax.lax.scan(body, acc0, jnp.arange(CHUNK, dtype=jnp.int32))
            return acc

        float(stream(images, targets, jnp.zeros((), jnp.float32)))
        t0 = time.perf_counter()
        acc = jnp.zeros((), jnp.float32)
        for _ in range(ITERS):
            acc = stream(images, targets, acc)
        float(acc)
        dt = time.perf_counter() - t0

    n = BATCH * CHUNK * ITERS
    print(json.dumps({"mode": mode, "ms_per_32": round(dt / (CHUNK * ITERS) * 1e3, 2),
                      "img_per_sec": round(n / dt, 1)}), flush=True)


def main():
    for mode in sys.argv[1:] or ("fwd_loss", "fwd_bwd_dummy", "fwd_bwd_loss", "full"):
        run(mode)


if __name__ == "__main__":
    main()
