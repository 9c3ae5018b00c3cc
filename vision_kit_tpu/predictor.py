"""Fused single/batch-image predictor: the whole demo hot path is ONE jitted
XLA program — uint8 image in, final detections out.

TPU-native counterpart of the reference demo path (demo/processing.py +
scripts/demo.py): there, letterbox runs in cv2 on host, the forward on
device, then NMS syncs device->host per image. Here letterbox (resize + pad
+ normalize), forward, sigmoid decode, class-aware NMS, and the rescale of
boxes back to the original frame all fuse under one jit, so the only
transfers are the input image upload and the padded (max_det, 6) result.

One compile per distinct source resolution (cached); webcam/video streams
have a single fixed resolution so this compiles once.
"""

from __future__ import annotations

import time
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from vision_kit_tpu.ops.letterbox import letterbox_device, letterbox_params
from vision_kit_tpu.ops.nms import postprocess, postprocess_raw


class Predictor:
    def __init__(
        self,
        model,
        variables,
        img_size: int | tuple[int, int] = 640,
        conf_thres: float = 0.25,
        iou_thres: float = 0.45,
        max_det: int = 300,
        max_cand: int = 1024,
        multi_label: bool = False,
        approx_topk: bool = True,
        mesh=None,
        spatial: bool = False,
    ):
        """mesh: optional jax.sharding.Mesh for multi-chip serving — batches
        passed to predict_batch are sharded over the "data" axis (weights
        replicate automatically); batch size must be a multiple of the data
        axis. Single-image calls stay single-chip unless spatial=True.

        spatial=True additionally shards the letterboxed image HEIGHT over
        the mesh's "model" axis (spatial partitioning, parallel/mesh.py):
        the conv stack runs height-split with XLA SPMD halo exchanges — the
        multi-chip LATENCY path, cutting single-image time with chips
        instead of batching. Requires the letterboxed H >= 64 * n_model
        (>= 2 rows per shard on the stride-32 map, train/step.py). With
        spatial=True, single-image calls also run on the mesh."""
        self.model = model
        # host-resident weights: jit closures embed them as numpy constants
        # at lowering, which never awaits an async device computation (a
        # device-array constant forces a `_value` host copy mid-lowering —
        # a stall point when init/load was dispatched asynchronously)
        self.variables = jax.device_get(variables)
        self.mesh = mesh
        self.spatial = spatial
        self.img_size = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        if spatial:
            if mesh is None:
                raise ValueError("spatial=True requires a mesh")
            from vision_kit_tpu.parallel.mesh import MODEL_AXIS

            n_model = mesh.shape[MODEL_AXIS]
            if self.img_size[0] < 64 * n_model:
                raise ValueError(
                    f"spatial=True needs img_size H >= {64 * n_model} for "
                    f"{n_model} model shards (>= 2 rows/shard on the "
                    f"stride-32 map); got {self.img_size[0]}"
                )
        self.conf_thres = conf_thres
        self.iou_thres = iou_thres
        self.max_det = max_det
        self.max_cand = max_cand
        self.multi_label = multi_label
        # approx_max_k candidate selection: exact results whenever the
        # conf-gated candidate count <= max_cand (the overwhelmingly common
        # serving case); see ops/nms.py
        self.approx_topk = approx_topk
        self._fns: dict = {}

    def _build(self, src_hw: tuple[int, int], batch: int = 1):
        """Compile the fused program for one (source resolution, batch)."""
        dst = self.img_size
        _, _, ratio, pad = letterbox_params(src_hw, dst)

        anchors_px = getattr(self.model, "anchors_px", None)
        strides = tuple(getattr(self.model, "strides", (8.0, 16.0, 32.0)))
        # eval raws are native (B,ny,nx,na,no) unless the model was built
        # with decode_order="reference" (parity mode)
        anchor_major = getattr(self.model, "decode_order", "native") == "reference" 

        def run(imgs_u8):
            x = jax.vmap(lambda im: letterbox_device(im, dst)[0])(imgs_u8)
            if self.spatial:
                from vision_kit_tpu.parallel.mesh import spatial_sharding

                # height-split conv stack (halo exchanges over ICI); the
                # head maps re-gather implicitly at the postprocess reshapes
                x = jax.lax.with_sharding_constraint(
                    x, spatial_sharding(self.mesh)
                )
            decoded, raws = self.model.apply(self.variables, x, training=False)
            if anchors_px is not None and not self.multi_label:
                # fused serving path: candidate selection on raw head maps,
                # decode only the survivors; the head's full decode is
                # dead-code-eliminated by XLA (ops/nms.py postprocess_raw)
                dets, valid = postprocess_raw(
                    raws, anchors_px, strides=strides,
                    conf_thres=self.conf_thres, iou_thres=self.iou_thres,
                    max_det=self.max_det, max_cand=self.max_cand,
                    approx_topk=self.approx_topk, anchor_major=anchor_major,
                )
            else:
                dets, valid = postprocess(
                    decoded,
                    conf_thres=self.conf_thres,
                    iou_thres=self.iou_thres,
                    multi_label=self.multi_label,
                    max_det=self.max_det,
                    max_cand=self.max_cand,
                    approx_topk=self.approx_topk,
                )
            # rescale to the original frame inside the same program
            boxes = dets[..., :4]
            boxes = (boxes - jnp.array([pad[0], pad[1], pad[0], pad[1]])) / ratio
            h0, w0 = src_hw
            boxes = jnp.clip(
                boxes,
                jnp.array([0.0, 0.0, 0.0, 0.0]),
                jnp.array([w0, h0, w0, h0]),
            )
            dets = jnp.concatenate([boxes, dets[..., 4:]], axis=-1)
            return dets, valid

        if self.mesh is not None and (batch > 1 or self.spatial):
            from vision_kit_tpu.parallel.mesh import (
                DATA_AXIS,
                batch_sharding,
                replicated_sharding,
            )

            # batch dim shards over "data" only when divisible (a spatial
            # single image rides the "model" axis alone; outputs are tiny,
            # replicate them in that case)
            n_data = self.mesh.shape[DATA_AXIS]
            if batch % n_data == 0:
                io = batch_sharding(self.mesh)
            else:
                io = replicated_sharding(self.mesh)
            return jax.jit(run, in_shardings=io, out_shardings=(io, io))
        return jax.jit(run)

    def warmup(self, src_hw: tuple[int, int], batch: int = 1):
        key = (tuple(src_hw), batch)
        fn = self._fns.get(key)
        if fn is None:
            fn = self._fns[key] = self._build(tuple(src_hw), batch)
        dummy = jnp.zeros((batch, *src_hw, 3), jnp.uint8)
        jax.block_until_ready(fn(dummy))
        return fn

    def __call__(self, img_rgb: np.ndarray):
        """img_rgb: HWC uint8. Returns (dets (n, 6) np [xyxy conf cls],
        elapsed_ms)."""
        src_hw = img_rgb.shape[:2]
        key = (src_hw, 1)
        fn = self._fns.get(key)
        if fn is None:
            fn = self.warmup(src_hw)
        t0 = time.perf_counter()
        dets, valid = fn(jnp.asarray(img_rgb)[None])
        dets = np.asarray(dets)[0]
        valid = np.asarray(valid)[0]
        ms = (time.perf_counter() - t0) * 1000
        return dets[valid], ms

    def predict_batch(self, imgs_rgb: np.ndarray):
        """imgs_rgb: (B, H, W, 3) uint8, one source resolution. Returns
        (list of (n_i, 6) arrays, elapsed_ms) — the whole batch is one
        program execution (the batched demo/serving path)."""
        imgs_rgb = np.asarray(imgs_rgb)
        batch, h, w = imgs_rgb.shape[:3]
        key = ((h, w), batch)
        fn = self._fns.get(key)
        if fn is None:
            fn = self.warmup((h, w), batch)
        t0 = time.perf_counter()
        dets, valid = fn(jnp.asarray(imgs_rgb))
        dets = np.asarray(dets)
        valid = np.asarray(valid)
        ms = (time.perf_counter() - t0) * 1000
        return [dets[i][valid[i]] for i in range(batch)], ms


def load_predictor_from_config(cfg, weights: str | None = None, **kwargs):
    """Build model + variables from a config (+ optional .pt/.npz weights)."""
    from vision_kit_tpu.models import build_model

    model = build_model(cfg)
    size = tuple(cfg.model.input_size)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)), training=False
    )
    if weights:
        variables = load_weights(weights, variables)
    return Predictor(model, variables, img_size=size, **kwargs)


def load_weights(path: str, template, partial: bool = False):
    """Load .pt (torch) or .npz/orbax weights into the variables template.

    partial=True applies the reference's shape-checked partial load
    (model_utils.py:126-137 load_ckpt): leaves whose shapes match the
    template are copied, the rest keep the template's (fresh) values — the
    fine-tune path when num_classes differs from the checkpoint."""
    if path.endswith((".pt", ".pth", ".ckpt")):
        from vision_kit_tpu.convert import load_torch_checkpoint, torch_to_flax

        # untyped conversion first: deploy folding below may legitimately
        # reshape the tree before it is checked against the template
        loaded = torch_to_flax(load_torch_checkpoint(path))
    elif path.endswith(".msgpack"):
        from flax import serialization

        with open(path, "rb") as f:
            data = f.read()
        # untyped restore (from_bytes does not check leaf shapes, so it
        # cannot implement partial/fold semantics)
        loaded = serialization.msgpack_restore(data)
    else:
        # orbax checkpoint dir
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        loaded = ckptr.restore(path)  # untyped; structure inspected below
        loaded = _extract_weights_from_train_state(loaded)

    loaded = _maybe_deploy_fold(loaded, template)
    if partial:
        return merge_matching(template, loaded)
    merged, skipped = _merge_counting(template, loaded)
    if skipped:
        raise ValueError(
            f"checkpoint {path} does not cover the model: {skipped} template "
            "leaves missing or shape-mismatched (use partial=True for a "
            "shape-checked partial load)"
        )
    return merged


def _maybe_deploy_fold(loaded, template):
    """Training weights loaded into a DEPLOY-mode template are folded
    automatically, like the reference demo does (scripts/demo.py:32-45:
    v7 `reparameterization` before inference):

    * checkpoint has RepConv branches (`rbr_dense`) but the template wants
      `rbr_reparam` -> fuse the branches (convert.fuse_repconv_params);
    * checkpoint has head Implicit layers (`ia_0`) but the template's head
      doesn't -> fold them into the head convs (convert.reparameterize_v7).

    Without this, v7x (whose deploy tree differs from training ONLY by the
    implicits — its neck has no RepConv) would strict-load training weights
    and silently skip the fold, producing wrong outputs."""
    from typing import Mapping as _Mapping

    if not isinstance(loaded, _Mapping) or "params" not in loaded:
        return loaded
    tparams = template.get("params", {}) if isinstance(template, _Mapping) else {}

    def has_key(node, key):
        if not isinstance(node, _Mapping):
            return False
        if key in node:
            return True
        return any(has_key(v, key) for v in node.values())

    if has_key(loaded["params"], "rbr_dense") and has_key(tparams, "rbr_reparam"):
        from vision_kit_tpu.convert import fuse_repconv_params

        loaded = fuse_repconv_params(loaded)
    lhead = loaded["params"].get("head", {})
    thead = tparams.get("head", {}) if isinstance(tparams, _Mapping) else {}
    if (isinstance(lhead, _Mapping) and "ia_0" in lhead
            and isinstance(thead, _Mapping) and "ia_0" not in thead
            and "m_0" in thead):
        from vision_kit_tpu.convert import reparameterize_v7

        loaded = reparameterize_v7(loaded)
    return loaded


def _extract_weights_from_train_state(restored):
    """A trainer checkpoint (train/step.py TrainState: params / batch_stats /
    opt_state / ema / step) holds more than model weights; loading one into a
    bare-variables template used to fail with an orbax structure mismatch.
    Detect that layout and extract the EMA weights — eval/export uses the EMA
    model like the reference (base_trainer.py:126-133) — falling back to the
    raw params when the EMA was never updated."""
    from typing import Mapping as _Mapping

    if not isinstance(restored, _Mapping) or "params" not in restored:
        return restored
    if not ("ema" in restored and "opt_state" in restored):
        return restored
    ema = restored.get("ema")
    if isinstance(ema, _Mapping) and "tree" in ema:
        updates = np.asarray(ema.get("updates", 0))
        if updates.size == 1 and int(updates) > 0:
            tree = ema["tree"]
            return {"params": tree["params"],
                    "batch_stats": tree.get("batch_stats", {})}
    return {"params": restored["params"],
            "batch_stats": restored.get("batch_stats", {})}


def _merge_counting(template, loaded):
    """merge_matching + how many template leaves the checkpoint missed."""
    import jax

    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    skipped = sum(
        1 for k, v in flat_t.items()
        if getattr(flat_l.get(k), "shape", None) != v.shape
    )
    return merge_matching(template, loaded), skipped


def merge_matching(template, loaded):
    """Copy leaves from `loaded` into `template` where path AND shape match
    (the reference load_ckpt semantics, model_utils.py:126-137)."""
    import jax

    flat_t = dict(jax.tree_util.tree_flatten_with_path(template)[0])
    flat_l = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    kept, skipped = 0, 0
    out = {}
    for k, v in flat_t.items():
        lv = flat_l.get(k)
        if lv is not None and getattr(lv, "shape", None) == v.shape:
            out[k] = jnp.asarray(lv, v.dtype)
            kept += 1
        else:
            out[k] = v
            skipped += 1
    if skipped:
        import logging

        logging.getLogger("vision_kit_tpu").info(
            "partial load: %d leaves copied, %d kept from init", kept, skipped
        )
    treedef = jax.tree_util.tree_structure(template)
    keys = [k for k, _ in jax.tree_util.tree_flatten_with_path(template)[0]]
    return jax.tree_util.tree_unflatten(treedef, [out[k] for k in keys])
