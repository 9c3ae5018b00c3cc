"""YOLO training loss with a fixed-shape anchor assigner.

Behavioral port of the reference YoloLoss (vision_kit/models/losses/yolo.py:
12-137), re-expressed for XLA: the reference's ragged `build_target`
(variable-count matches via boolean indexing) becomes a dense candidate
tensor — every (image, label, anchor, neighbor-offset) tuple is a candidate
row with a validity mask — so every shape is static and the whole loss jits
into one program. Gather/scatter against the prediction grids replaces torch
advanced indexing.

Targets are padded per image to (B, M, 5) rows [cls, cx, cy, w, h]
(normalized cxcywh, cls == -1 marks padding), the standard pad+mask design.

Known intentional divergence: when several candidates land on the same cell,
the reference's `tobj[b,a,gy,gx] = iou` keeps whichever write happens last
(arbitrary); we keep the max IoU (scatter-max), which is deterministic.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vision_kit_tpu.ops.boxes import box_iou_aligned

# neighbor offsets: center, left, top, right, bottom (reference yolo.py:88-93)
_OFFSETS = np.array(
    [[0, 0], [1, 0], [0, 1], [-1, 0], [0, -1]], dtype=np.float32
) * 0.5


def smooth_bce(eps: float = 0.0) -> tuple[float, float]:
    """Label smoothing targets (reference metrics.py:10)."""
    return 1.0 - 0.5 * eps, 0.5 * eps


def bce_with_logits(logits, targets, pos_weight: float = 1.0):
    """Elementwise BCE-with-logits with positive-class weighting, matching
    torch.nn.BCEWithLogitsLoss(pos_weight=...) semantics."""
    log_p = jax.nn.log_sigmoid(logits)
    log_not_p = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * targets * log_p + (1.0 - targets) * log_not_p)


def focal_bce_with_logits(logits, targets, pos_weight: float = 1.0,
                          gamma: float = 1.5, alpha: float = 0.25):
    """Focal-modulated BCE (the reference planned this in its empty
    losses/focals.py stub; `fl_gamma` already exists in the config schema,
    configs/yolov5.yaml:40). Ultralytics FocalLoss semantics: modulate the
    BCE by (1 - p_t)^gamma with alpha class balancing."""
    bce = bce_with_logits(logits, targets, pos_weight)
    p = jax.nn.sigmoid(logits)
    p_t = targets * p + (1.0 - targets) * (1.0 - p)
    alpha_t = targets * alpha + (1.0 - targets) * (1.0 - alpha)
    return bce * alpha_t * (1.0 - p_t) ** gamma


class YoloLoss:
    """Anchor-based YOLO loss (CIoU box + BCE obj + BCE cls).

    Args:
      num_classes: class count.
      anchors: (nl, na, 2) anchors in grid units (head.grid_anchors).
      hyp: dict with box/obj/cls gains, *_pw pos weights, anchor_t,
        label_smoothing (the reference's cfg.hypermeters after
        update_loss_cfg scaling).
    """

    def __init__(self, num_classes: int, anchors: np.ndarray, hyp: dict,
                 layout: str = "auto"):
        self.num_classes = num_classes
        self.anchors = np.asarray(anchors, np.float32)  # (nl, na, 2)
        self.nl = self.anchors.shape[0]
        self.na = self.anchors.shape[1]
        # layout of the incoming raw maps: "anchor_major" (B, na, ny, nx, no)
        # is the reference/torch order; "native" (B, ny, nx, na, no) is the
        # head's untransposed conv output (decode_order="native" training
        # maps) — consuming it directly saves a full-map layout copy per
        # level in forward AND backward. "auto" detects per level from the
        # shape (grids never have na rows in practice).
        assert layout in ("auto", "anchor_major", "native")
        self.layout = layout
        self.hyp = dict(hyp)
        self.balance = (
            [4.0, 1.0, 0.4] if self.nl == 3 else [4.0, 1.0, 0.25, 0.06, 0.02]
        )
        self.cp, self.cn = smooth_bce(self.hyp.get("label_smoothing", 0.0))
        self.gr = 1.0
        self.fl_gamma = float(self.hyp.get("fl_gamma", 0.0))

    def _bce(self, logits, targets, pos_weight):
        if self.fl_gamma > 0:
            return focal_bce_with_logits(
                logits, targets, pos_weight, gamma=self.fl_gamma
            )
        return bce_with_logits(logits, targets, pos_weight)

    def __call__(self, preds: Sequence[jnp.ndarray], targets: jnp.ndarray):
        """Compute the loss.

        Args:
          preds: per-level raw training maps — anchor-major
            (B, na, ny, nx, 5+nc) or native (B, ny, nx, na, 5+nc), per the
            constructor's `layout` (default auto-detected per level).
          targets: (B, M, 5) padded rows [cls, cx, cy, w, h] normalized;
            cls < 0 marks padding.

        Returns (total_loss, parts) where parts is (box, obj, cls) detached
        gains-scaled components; total = (box + obj + cls) * batch_size,
        matching reference yolo.py:71-76.
        """
        bs = preds[0].shape[0]
        loss_box = 0.0
        loss_obj = 0.0
        loss_cls = 0.0
        for i in range(self.nl):
            lb, lo, lc = self._level_loss(
                preds[i], targets, jnp.asarray(self.anchors[i]), i
            )
            loss_box += lb
            loss_obj += lo * self.balance[i]
            loss_cls += lc

        loss_box *= self.hyp["box"]
        loss_obj *= self.hyp["obj"]
        loss_cls *= self.hyp["cls"]
        total = (loss_box + loss_obj + loss_cls) * bs
        parts = jax.lax.stop_gradient(
            jnp.stack([loss_box, loss_obj, loss_cls])
        )
        return total, parts

    def _candidates(self, targets, anchors, ny, nx):
        """Dense candidate construction for one level.

        Returns dict of (B, M, na, 5)-shaped candidate fields + validity.
        """
        b, m, _ = targets.shape
        na = self.na
        cls = targets[..., 0]                      # (B, M)
        label_valid = cls >= 0
        gxy = targets[..., 1:3] * jnp.array([nx, ny], jnp.float32)  # grid xy
        gwh = targets[..., 3:5] * jnp.array([nx, ny], jnp.float32)

        # anchor-ratio filter (reference yolo.py:103-106)
        ratio = gwh[:, :, None, :] / anchors[None, None, :, :]      # (B,M,na,2)
        worst = jnp.max(jnp.maximum(ratio, 1.0 / ratio), axis=-1)   # (B,M,na)
        anchor_ok = worst < self.hyp.get("anchor_t", 4.0)
        match_ok = label_valid[:, :, None] & anchor_ok              # (B,M,na)

        # neighbor-offset validity (reference yolo.py:110-117)
        gx, gy = gxy[..., 0], gxy[..., 1]                           # (B,M)
        gxi = nx - gx
        gyi = ny - gy
        j = (gx % 1.0 < 0.5) & (gx > 1.0)   # left neighbor
        k = (gy % 1.0 < 0.5) & (gy > 1.0)   # top neighbor
        l = (gxi % 1.0 < 0.5) & (gxi > 1.0)  # right neighbor
        mm = (gyi % 1.0 < 0.5) & (gyi > 1.0)  # bottom neighbor
        center = jnp.ones_like(j)
        off_ok = jnp.stack([center, j, k, l, mm], axis=-1)          # (B,M,5)

        valid = match_ok[..., None] & off_ok[:, :, None, :]         # (B,M,na,5)

        offsets = jnp.asarray(_OFFSETS)                             # (5, 2)
        full = (b, m, na, 5, 2)
        cell = jnp.floor(
            jnp.broadcast_to(
                gxy[:, :, None, None, :] - offsets[None, None, None, :, :],
                full,
            )
        )                                                           # (B,M,na,5,2)
        gi = jnp.clip(cell[..., 0], 0, nx - 1).astype(jnp.int32)
        gj = jnp.clip(cell[..., 1], 0, ny - 1).astype(jnp.int32)

        # regression target: xy relative to assigned cell, wh in grid units
        txy = gxy[:, :, None, None, :] - jnp.stack([gi, gj], axis=-1)
        twh = jnp.broadcast_to(gwh[:, :, None, None, :], full)
        return {
            "valid": valid,            # (B, M, na, 5)
            "gi": gi, "gj": gj,        # (B, M, na, 5)
            "txy": txy, "twh": twh,    # (B, M, na, 5, 2)
            "cls": cls,                # (B, M)
        }

    def _resolve_layout(self, pred):
        if self.layout != "auto":
            return self.layout
        na = self.na
        if pred.shape[3] == na and pred.shape[1] != na:
            return "native"
        if pred.shape[1] == na and pred.shape[3] != na:
            return "anchor_major"
        raise ValueError(
            f"ambiguous raw-map shape {pred.shape} (grid size == na); "
            "construct YoloLoss with an explicit layout="
        )

    def _level_loss(self, pred, targets, anchors, level):
        layout = self._resolve_layout(pred)
        if layout == "native":
            b, ny, nx, na, no = pred.shape
        else:
            b, na, ny, nx, no = pred.shape
        nc = self.num_classes
        cand = self._candidates(targets, anchors, ny, nx)
        valid = cand["valid"]                                    # (B,M,na,5)
        m = valid.shape[1]

        batch_idx = jnp.arange(b, dtype=jnp.int32).reshape(b, 1, 1, 1)
        anchor_idx = jnp.arange(na, dtype=jnp.int32).reshape(1, 1, na, 1)
        if layout == "native":
            lin = (
                ((batch_idx * ny + cand["gj"]) * nx + cand["gi"]) * na
                + anchor_idx
            )                                                    # (B,M,na,5)
        else:
            lin = (
                ((batch_idx * na + anchor_idx) * ny + cand["gj"]) * nx
                + cand["gi"]
            )                                                    # (B,M,na,5)
        lin_flat = lin.reshape(-1)
        valid_flat = valid.reshape(-1)

        n_cells = b * na * ny * nx
        # One (C, no) row gather. (A per-field gather split — xywh/obj/cls
        # gathered from separate slices to shrink the backward scatter — was
        # tried and measured 1.75x SLOWER end-to-end: narrow (N, 4) slices
        # tile 4/128 lanes on TPU, so the sliced buffers and their scatter
        # targets blow up 32x in physical size.)
        pred_flat = pred.reshape(n_cells, no)
        obj_logits = pred_flat[:, 4]
        psub = jnp.take(pred_flat, lin_flat, axis=0)             # (C, no)

        # box regression (reference yolo.py:51-56)
        pxy = jax.nn.sigmoid(psub[:, 0:2]) * 2.0 - 0.5
        anc = jnp.broadcast_to(
            anchors[None, None, :, None, :], (b, m, na, 5, 2)
        ).reshape(-1, 2)
        pwh = (jax.nn.sigmoid(psub[:, 2:4]) * 2.0) ** 2 * anc
        pbox = jnp.concatenate([pxy, pwh], axis=-1)
        tbox = jnp.concatenate(
            [cand["txy"].reshape(-1, 2), cand["twh"].reshape(-1, 2)], axis=-1
        )
        iou = box_iou_aligned(pbox, tbox, box_format="cxcywh", mode="ciou")
        n_valid = jnp.maximum(valid_flat.sum(), 1).astype(pred.dtype)
        loss_box = jnp.where(valid_flat, 1.0 - iou, 0.0).sum() / n_valid

        # objectness target grid: scatter-max of detached clamped iou
        iou_det = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
        if self.gr < 1.0:
            iou_det = (1.0 - self.gr) + self.gr * iou_det
        tobj_updates = jnp.where(valid_flat, iou_det, 0.0).astype(pred.dtype)
        tobj = jnp.zeros((n_cells,), pred.dtype)
        tobj = tobj.at[lin_flat].max(tobj_updates, mode="drop")
        loss_obj = self._bce(
            obj_logits, tobj, self.hyp.get("obj_pw", 1.0)
        ).mean()

        # classification (reference yolo.py:63-66)
        if nc > 1:
            tcls = jnp.broadcast_to(
                cand["cls"][:, :, None, None], (b, m, na, 5)
            ).reshape(-1)
            onehot = jax.nn.one_hot(
                jnp.clip(tcls, 0, nc - 1).astype(jnp.int32), nc
            )
            t = jnp.where(onehot > 0, self.cp, self.cn)
            ce = self._bce(psub[:, 5:], t, self.hyp.get("cls_pw", 1.0))
            loss_cls = (
                jnp.where(valid_flat[:, None], ce, 0.0).sum()
                / (n_valid * nc)
            )
        else:
            loss_cls = jnp.zeros((), pred.dtype)

        return loss_box, loss_obj, loss_cls
