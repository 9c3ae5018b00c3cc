"""Capture a jax.profiler trace of the fused inference step (or, with
--train, the full train step) and print the top XLA ops by device self-time.

Reads the xplane proto with TF's xplane_pb2 (TF is already a dependency via
the jax2tf export path). Only the "XLA Ops" line of the TPU device plane is
aggregated — async copy lines overlap real compute and must not be summed
(DESIGN.md measurement discipline).

Usage: python tools/profile_infer.py [--batch 128] [--chunk 4]
"""

from __future__ import annotations

import argparse
import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def capture(trace_dir: str, batch: int, chunk: int):
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.ops.nms import postprocess_raw

    size = 640
    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    def step(x_u8):
        x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        _, raws = model.apply(variables, x, training=False)
        dets, valid = postprocess_raw(
            raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32)
        )

    @jax.jit
    def stream(imgs, acc0):
        def body(carry, k):
            return carry + step(imgs + k.astype(jnp.uint8)), ()

        acc, _ = jax.lax.scan(body, acc0, jnp.arange(chunk, dtype=jnp.int32))
        return acc

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(
        rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8)
    )
    _ = int(stream(imgs, jnp.zeros((), jnp.int32)))  # compile + warm
    with jax.profiler.trace(trace_dir):
        _ = int(stream(imgs, jnp.zeros((), jnp.int32)))


def capture_train(trace_dir: str, batch: int, chunk: int,
                  device_aug: bool = False):
    import numpy as np

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
    step_fn = make_train_step(model, loss_fn, tx, donate=False,
                              device_aug=device_aug)

    rng = np.random.default_rng(0)
    targets = jnp.asarray(np.where(
        np.arange(64)[None, :, None] < 8,
        np.concatenate([
            rng.integers(0, 80, (batch, 64, 1)).astype(np.float32),
            rng.uniform(0.2, 0.8, (batch, 64, 4)).astype(np.float32),
        ], -1),
        -1.0,
    ).astype(np.float32))
    if device_aug:
        from vision_kit_tpu.data.device_aug import (
            N_PARAMS, N_TILES, P_HSV_H, P_HSV_S, P_HSV_V, P_MIX_JIT,
            P_MIX_OH, P_MIX_OW, P_MIX_W, P_SCALE, P_TX, P_TY, P_XC, P_YC,
        )

        tiles = jnp.asarray(rng.integers(
            0, 255, (batch, N_TILES, size, size, 3), dtype=np.uint8))
        tile_hw = jnp.asarray(np.full((batch, N_TILES, 2), size, np.int32))
        params = np.zeros((batch, N_PARAMS), np.float32)
        params[:, P_XC] = rng.integers(size // 2, 3 * size // 2, batch)
        params[:, P_YC] = rng.integers(size // 2, 3 * size // 2, batch)
        params[:, P_SCALE] = rng.uniform(0.6, 1.4, batch)
        params[:, P_TX] = rng.uniform(-0.1, 0.1, batch) * size
        params[:, P_TY] = rng.uniform(-0.1, 0.1, batch) * size
        params[:, P_HSV_H] = rng.uniform(0.985, 1.015, batch)
        params[:, [P_HSV_S, P_HSV_V]] = rng.uniform(0.6, 1.4, (batch, 2))
        params[:, P_MIX_W] = 0.5
        params[:, P_MIX_JIT] = rng.uniform(1.0, 1.5, batch)
        params[:, P_MIX_OW] = (size * params[:, P_MIX_JIT]).astype(int)
        params[:, P_MIX_OH] = params[:, P_MIX_OW]
        params = jnp.asarray(params)

        base = {"tiles": tiles, "tile_hw": tile_hw, "params": params,
                "targets": targets}

        def perturb(b, k):
            return {**b, "tiles": b["tiles"] + k.astype(jnp.uint8)}
    else:
        images = jnp.asarray(
            rng.integers(0, 255, (batch, size, size, 3), dtype=np.uint8))
        base = {"image": images, "targets": targets}

        def perturb(b, k):
            return {**b, "image": b["image"] + k.astype(jnp.uint8)}

    @jax.jit
    def stream(state, base):
        def body(st, k):
            st2, metrics = step_fn(st, perturb(base, k))
            return st2, metrics["loss"]

        st, losses = jax.lax.scan(
            body, state, jnp.arange(chunk, dtype=jnp.int32)
        )
        return st, losses

    st, losses = stream(state, base)
    _ = float(losses[-1])  # compile + warm
    with jax.profiler.trace(trace_dir):
        st, losses = stream(state, base)
        _ = float(losses[-1])


def summarize(trace_dir: str, top: int = 30):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.xplane.pb")
    )
    assert paths, f"no xplane under {trace_dir}"
    xspace = xplane_pb2.XSpace()
    with open(sorted(paths)[-1], "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "tpu" not in plane.name.lower():
            continue
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            ev_meta = plane.event_metadata
            tot = defaultdict(int)
            n = defaultdict(int)
            total_ps = 0
            for ev in line.events:
                name = ev_meta[ev.metadata_id].name
                tot[name] += ev.duration_ps
                n[name] += 1
                total_ps += ev.duration_ps
            print(f"plane={plane.name}  total XLA-op time "
                  f"{total_ps / 1e9:.3f} ms")
            for name, ps in sorted(tot.items(), key=lambda kv: -kv[1])[:top]:
                print(f"{ps / 1e9:9.3f} ms  {100 * ps / total_ps:5.1f}%  "
                      f"x{n[name]:<4d} {name[:110]}")
            return
    print("no TPU 'XLA Ops' line found; planes:",
          [p.name for p in xspace.planes])


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--chunk", type=int, default=4)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--dir", default="/tmp/vk_profile")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--train", action="store_true",
                    help="profile the full train step instead of inference")
    ap.add_argument("--daug", action="store_true",
                    help="with --train: device-augmentation tiles batch")
    args = ap.parse_args()
    if not args.summarize_only:
        if args.train:
            capture_train(args.dir, args.batch, args.chunk,
                          device_aug=args.daug)
        else:
            capture(args.dir, args.batch, args.chunk)
    summarize(args.dir, args.top)
