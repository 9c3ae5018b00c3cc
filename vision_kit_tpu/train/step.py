"""The pjit'd train/eval steps: pure functions over an explicit TrainState.

TPU-native replacement for the reference's Lightning DetTrainer
(core/train/det_trainer.py): instead of framework hooks mutating a module,
training is one jitted function
    state, batch -> state', metrics
compiled over the device mesh. Params/opt-state/EMA are replicated; the
batch is sharded over the "data" axis, so XLA emits the psum gradient
all-reduce over ICI (the DDP equivalent) inside the same program as the
forward/backward — no separate synchronization phase.

The loss anchors, optimizer schedules (warmup interpolation included), EMA
decay, and grad clipping all live inside the graph; the host loop only feeds
batches and logs metrics.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from vision_kit_tpu.parallel.mesh import (
    batch_sharding,
    replicated_sharding,
    spatial_sharding,
)
from vision_kit_tpu.train.ema import EMAState, ema_init, ema_update
from vision_kit_tpu.train.losses import YoloLoss


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: EMAState
    step: jnp.ndarray


def create_train_state(variables, tx) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        ema=ema_init({"params": params, "batch_stats": batch_stats}),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(model, loss_fn: YoloLoss, tx, mesh=None, donate=True,
                    spatial=False, remat=False, accum_steps: int = 1,
                    device_aug: bool = False, scale_to: int | None = None):
    """Build the jitted train step.

    batch: {"image": (B, H, W, 3) float in [0,1], "targets": (B, M, 5)};
    with device_aug=True instead {"tiles": (B, 5, H, W, 3) uint8,
    "tile_hw": (B, 5, 2) int32, "params": (B, N_PARAMS) float32,
    "targets"} and
    the mosaic/mixup/HSV/flip warp (data/device_aug.py) runs on-device at
    the head of the step, fused into the same XLA program as the model
    (augmentation is computed for the full batch before any accum_steps
    microbatch split — one (B, H, W, 3) float32 intermediate).
    Returns (state', metrics dict).

    spatial=True additionally shards the image height over the "model" mesh
    axis (spatial partitioning): the conv stack runs height-split with XLA
    SPMD halo exchanges, and the loss consumes the re-gathered head maps.
    Requires mesh. Use when the model axis has size > 1.

    Constraint: the deepest feature map (H/32 rows) must keep >= 2 rows per
    model-axis shard, i.e. input H >= 64 * mesh.shape["model"] — below that
    the 3x3-conv halo equals the whole shard and XLA SPMD's halo-exchange
    gradient is wrong (verified: exact parity at >= 2 rows/shard, divergent
    at 1 row/shard).

    scale_to: multi-scale training (ultralytics-style size jitter; the
    reference has none). The host pipeline and the H2D transfer stay at the
    base size — the batch is resized to (scale_to, scale_to) ON DEVICE in
    the model's compute dtype, fused into the same XLA program as the
    forward (normalized targets need no adjustment; the anchors live in
    stride units, so a larger rendering of the same object simply matches
    larger anchors — the reference loss semantics under scale jitter).
    Build one step per size; jit caches each compile.

    accum_steps > 1 enables gradient accumulation (the reference has none —
    PL default 1, SURVEY §2.7): the batch splits into accum_steps
    microbatches run sequentially under lax.scan, activation memory is that
    of ONE microbatch, and the applied gradient is the MEAN over
    microbatches — the same semantics as data-parallel pmean over chips, so
    an accumulated batch matches a larger DP world. BN running stats update
    sequentially per microbatch (same as seeing the micros as consecutive
    steps). Composes with remat and spatial. B must divide by accum_steps.
    """
    assert accum_steps >= 1

    def train_step(state: TrainState, batch):
        if device_aug:
            from vision_kit_tpu.data.device_aug import warp_augment

            # uint8 tiles in, normalized float images out — the model's
            # normalized-float input contract (models/layers.py ConvBnAct);
            # resample matmuls run in the model's compute dtype (bf16 =
            # half the HBM traffic, full MXU rate; see warp_augment)
            imgs = warp_augment(
                batch["tiles"], batch["tile_hw"], batch["params"],
                dtype=getattr(model, "dtype", None) or jnp.float32,
            )
            targets = batch["targets"]
        else:
            imgs, targets = batch["image"], batch["targets"]
        # uint8 batches (4x less H2D) go straight into the model: the stem
        # normalizes after its space-to-depth transpose so the layout move
        # streams u8 bytes and no full-image f32 intermediate materializes
        # (models/layers.py ConvBnAct)

        def maybe_scale(x):
            # multi-scale: device-side bilinear resize in compute dtype.
            # uint8 normalizes here (resize and the 1/255 scale commute);
            # the model then sees its normalized-float input contract.
            if scale_to is None or x.shape[1:3] == (scale_to, scale_to):
                return x
            cdtype = getattr(model, "dtype", None) or jnp.float32
            xf = x.astype(cdtype)
            if x.dtype == jnp.uint8:
                xf = xf * (1.0 / 255.0)
            return jax.image.resize(
                xf, (x.shape[0], scale_to, scale_to, x.shape[3]), "bilinear"
            )

        if accum_steps == 1:
            # (with accumulation the resize runs per microbatch instead —
            # a full-batch scaled intermediate would defeat accumulation's
            # one-microbatch activation budget)
            imgs = maybe_scale(imgs)

        def forward(params, stats, x):
            return model.apply(
                {"params": params, "batch_stats": stats},
                x,
                training=True,
                mutable=["batch_stats"],
            )

        if remat:
            # rematerialization: recompute activations during the backward
            # instead of storing them — ~1/3 more FLOPs for ~half the
            # activation memory; enables larger per-chip batches
            forward = jax.checkpoint(forward)

        def compute_loss(params, stats, x, tgt):
            if spatial:
                x = jax.lax.with_sharding_constraint(
                    x, spatial_sharding(mesh)
                )
            preds, mutated = forward(params, stats, x)
            if spatial:
                # re-gather the (small) head maps to batch-only sharding:
                # the conv stack ran height-split, but the assigner's
                # gather/scatter along grid cells should see whole maps
                # (scatter across a sharded axis is both slower and, on some
                # backends, numerically unstable under SPMD)
                preds = jax.tree_util.tree_map(
                    lambda p: jax.lax.with_sharding_constraint(
                        p, batch_sharding(mesh)
                    ),
                    preds,
                )
            total, parts = loss_fn(preds, tgt)
            return total, (parts, mutated["batch_stats"])

        grad_fn = jax.value_and_grad(compute_loss, has_aux=True)

        if accum_steps == 1:
            (total, (parts, new_stats)), grads = grad_fn(
                state.params, state.batch_stats, imgs, targets
            )
        else:
            b = imgs.shape[0]
            assert b % accum_steps == 0, (
                f"batch {b} not divisible by accum_steps {accum_steps}"
            )
            micro = b // accum_steps
            imgs_m = imgs.reshape(accum_steps, micro, *imgs.shape[1:])
            tgt_m = targets.reshape(accum_steps, micro, *targets.shape[1:])

            def micro_step(carry, mb):
                stats, g_acc, t_acc, p_acc = carry
                x, tgt = mb
                x = maybe_scale(x)  # per-microbatch (see note above)
                if mesh is not None:
                    x = jax.lax.with_sharding_constraint(
                        x,
                        spatial_sharding(mesh) if spatial
                        else batch_sharding(mesh),
                    )
                (total, (parts, stats2)), g = grad_fn(
                    state.params, stats, x, tgt
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
                return (
                    stats2, g_acc,
                    t_acc + total.astype(jnp.float32),
                    p_acc + parts.astype(jnp.float32),
                ), None

            zeros_g = jax.tree_util.tree_map(
                jnp.zeros_like, state.params
            )
            (new_stats, grads, total, parts), _ = jax.lax.scan(
                micro_step,
                (state.batch_stats, zeros_g, jnp.zeros(()),
                 jnp.zeros((3,))),
                (imgs_m, tgt_m),
            )
            inv = 1.0 / accum_steps
            grads = jax.tree_util.tree_map(lambda g: g * inv, grads)
            total = total * inv
            parts = parts * inv

        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = ema_update(
            state.ema, {"params": new_params, "batch_stats": new_stats}
        )
        new_state = TrainState(
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt,
            ema=new_ema,
            step=state.step + 1,
        )
        metrics = {
            "loss": total,
            "loss_box": parts[0],
            "loss_obj": parts[1],
            "loss_cls": parts[2],
            "grad_norm": optax.global_norm(grads),
        }
        return new_state, metrics

    if mesh is None:
        if spatial:
            raise ValueError("spatial=True requires a mesh")
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())

    repl = replicated_sharding(mesh)
    data = spatial_sharding(mesh) if spatial else batch_sharding(mesh)
    if device_aug:
        # tiles/params are batch-sharded (the warp is per-sample); with
        # spatial=True the constraint inside compute_loss re-shards the
        # augmented images over the model axis
        bs = batch_sharding(mesh)
        batch_shardings = {
            "tiles": bs, "tile_hw": bs, "params": bs, "targets": bs,
        }
    else:
        batch_shardings = {"image": data, "targets": batch_sharding(mesh)}
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_shardings),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model, mesh=None, use_ema: bool = True,
                   postprocess_kwargs: dict | None = None, spatial=False):
    """Eval step: forward (EMA weights by default, like the reference's
    validation path det_trainer.py:57-70) + device-side decode & NMS.

    Returns (dets (B, max_det, 6), valid (B, max_det)) per batch.
    """
    from vision_kit_tpu.ops.nms import postprocess

    kwargs = dict(
        conf_thres=0.001, iou_thres=0.6, multi_label=True, max_det=300,
        max_cand=2048,
        # per-anchor top-20 class truncation: identical mAP for any model
        # whose anchors contribute <= 20 classes to the global top-2048
        # (i.e. all of them), ~7x faster eval postprocess. Set to 0 for the
        # exact N*nc expansion.
        multi_label_top=20,
    )
    if postprocess_kwargs:
        kwargs.update(postprocess_kwargs)

    def eval_step(state: TrainState, imgs):
        # uint8 input normalizes inside the stem (see train_step note)
        if spatial:
            imgs = jax.lax.with_sharding_constraint(
                imgs, spatial_sharding(mesh)
            )
        tree = state.ema.tree if use_ema else {
            "params": state.params, "batch_stats": state.batch_stats
        }
        decoded, _ = model.apply(
            {"params": tree["params"], "batch_stats": tree["batch_stats"]},
            imgs,
            training=False,
        )
        return postprocess(decoded, **kwargs)

    if mesh is None:
        if spatial:
            raise ValueError("spatial=True requires a mesh")
        return jax.jit(eval_step)

    repl = replicated_sharding(mesh)
    data = batch_sharding(mesh)
    imgs_sharding = spatial_sharding(mesh) if spatial else data
    return jax.jit(
        eval_step, in_shardings=(repl, imgs_sharding),
        out_shardings=(data, data)
    )
