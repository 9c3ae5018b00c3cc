"""SimOTA loss for YOLOv7 — fixed-shape, working (the reference's
YoloLossOTA is dead code with multiple fatal bugs: never constructed by the
trainer (det_trainer.py:38), `torch.tenso` typo (losses/yolo.py:175), calls
a method that doesn't exist (:221 vs :363), broken offset branch (:391-393).
This is a from-first-principles reimplementation of the SimOTA semantics the
reference *intended* (dynamic-k top-10 IoU, cost = cls + 3*iou_loss,
anchor-conflict argmin), expressed with static shapes for XLA:

  * candidate set = every (label, anchor, neighbor-offset) tuple per level,
    masked for validity — same dense design as losses.YoloLoss.
  * per-image assignment runs under vmap: an (M labels x C candidates) cost
    matrix, top-10-smallest-cost per label with rank < dynamic_k, conflict
    resolution by per-candidate argmin cost.

Intentional divergence from the reference text: the CIoU in the box loss is
computed in cxcywh interpretation (the reference passes box_format="xywh" at
yolo.py:196 to center-format boxes — a bug that corner-interprets centers).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np

import jax
import jax.numpy as jnp

from vision_kit_tpu.ops.boxes import box_iou_aligned, box_iou_pairwise
from vision_kit_tpu.train.losses import YoloLoss

BIG = 1e6


class YoloLossOTA(YoloLoss):
    """SimOTA assignment + YOLO loss. Same call signature as YoloLoss."""

    def __init__(self, num_classes: int, anchors: np.ndarray, hyp: dict,
                 strides: Sequence[float] = (8.0, 16.0, 32.0),
                 top_k: int = 10, layout: str = "auto"):
        super().__init__(num_classes, anchors, hyp, layout=layout)
        self.strides = tuple(strides)
        self.top_k = top_k

    @staticmethod
    def _resolve_conflicts(mm, cost):
        """A candidate claimed by >1 gt is REASSIGNED to the globally
        argmin-cost gt (reference yolo.py:319-323 zeroes the column, then
        sets the argmin row unconditionally — a gt that never claimed the
        candidate can win it; the candidate stays foreground either way).
        claims > 1 implies some claimant's cost < BIG/2, so the argmin row
        is always a valid (gt, candidate) pair.

        mm: (M, C) bool claim matrix; cost: (M, C)."""
        claims = jnp.sum(mm, axis=0)
        best_gt = jnp.argmin(cost, axis=0)                       # (C,)
        onehot_best = jax.nn.one_hot(
            best_gt, cost.shape[0], dtype=bool
        ).T                                                      # (M, C)
        return jnp.where(claims[None, :] > 1, onehot_best, mm)

    def __call__(self, preds, targets):
        # Consumes the head's native (B, ny, nx, na, no) training maps
        # directly (same dual-layout linear-index trick as
        # losses.YoloLoss._level_loss): OTA only ever touches the raw map
        # through flat gathers/scatters, so the layout decides the index
        # formula, not the math — no anchor-major transpose (nor its three
        # backward copies) is paid.
        bs = preds[0].shape[0]
        nc = self.num_classes

        # ---- gather the global candidate set across levels ----
        level_meta = []
        cand_feats = []   # per level (B, Cl, no)
        cand_gxy = []     # (B, Cl, 2) cell coords
        cand_anc = []     # (Cl, 2) grid-unit anchors
        cand_stride = []  # (Cl,)
        cands = []
        for i, pred in enumerate(preds):
            layout = self._resolve_layout(pred)
            if layout == "native":
                b, ny, nx, na, no = pred.shape
            else:
                b, na, ny, nx, no = pred.shape
            anchors = jnp.asarray(self.anchors[i])
            c = self._candidates(targets, anchors, ny, nx)
            m = c["valid"].shape[1]
            cl = m * na * 5
            batch_idx = jnp.arange(b)[:, None, None, None]
            anchor_idx = jnp.arange(na)[None, None, :, None]
            if layout == "native":
                lin = (
                    (batch_idx * ny + c["gj"]) * nx + c["gi"]
                ) * na + anchor_idx
            else:
                lin = (
                    (batch_idx * na + anchor_idx) * ny + c["gj"]
                ) * nx + c["gi"]
            pred_flat = pred.reshape(b * na * ny * nx, no)
            feats = jnp.take(pred_flat, lin.reshape(b, cl), axis=0)  # (B,Cl,no)
            gxy = jnp.stack([c["gi"], c["gj"]], axis=-1).reshape(b, cl, 2)
            anc = jnp.broadcast_to(
                anchors[None, :, None, :], (m, na, 5, 2)
            ).reshape(cl, 2)
            level_meta.append(dict(ny=ny, nx=nx, cl=cl, lin=lin, na=na))
            cand_feats.append(feats)
            cand_gxy.append(gxy.astype(jnp.float32))
            cand_anc.append(anc)
            cand_stride.append(jnp.full((cl,), self.strides[i], jnp.float32))
            cands.append(c["valid"].reshape(b, cl))

        feats = jnp.concatenate(cand_feats, axis=1)      # (B, C, no)
        gxy = jnp.concatenate(cand_gxy, axis=1)          # (B, C, 2)
        anc = jnp.concatenate(cand_anc, axis=0)          # (C, 2)
        stride = jnp.concatenate(cand_stride, axis=0)    # (C,)
        valid_c = jnp.concatenate(cands, axis=1)         # (B, C)

        img_hw = jnp.array(
            [level_meta[0]["nx"] * self.strides[0],
             level_meta[0]["ny"] * self.strides[0]], jnp.float32)  # (w, h)

        # ---- per-image SimOTA assignment (vmapped) ----
        def assign(feats_i, gxy_i, valid_i, targets_i):
            # candidate boxes in pixels
            sig = jax.nn.sigmoid(feats_i)
            pxy = (sig[:, 0:2] * 2.0 - 0.5 + gxy_i) * stride[:, None]
            pwh = (sig[:, 2:4] * 2.0) ** 2 * anc * stride[:, None]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)          # cxcywh px

            gt_valid = targets_i[:, 0] >= 0                      # (M,)
            gt_cls = jnp.clip(targets_i[:, 0], 0, nc - 1).astype(jnp.int32)
            gt_box = targets_i[:, 1:5] * jnp.concatenate([img_hw, img_hw])

            pair_iou = box_iou_pairwise(
                gt_box, pbox, box_format="cxcywh"
            )                                                    # (M, C)
            pair_iou = jnp.where(
                gt_valid[:, None] & valid_i[None, :], pair_iou, 0.0
            )
            iou_cost = -jnp.log(pair_iou + 1e-8)

            # dynamic k per gt: sum of top-10 IoUs, >= 1
            k = min(self.top_k, pair_iou.shape[1])
            top_iou, _ = jax.lax.top_k(pair_iou, k)
            dynamic_k = jnp.clip(
                jnp.sum(top_iou, axis=1).astype(jnp.int32), 1, k
            )                                                    # (M,)

            # classification cost (reference :293-308 semantics), computed
            # from logits in fp32. The reference's y = sqrt(sig(cls)*sig(obj))
            # rounds to exactly 1.0 once logits saturate (bf16 compute: at
            # |z| >~ 9; fp32: ~17), and clipping to 1 - 1e-8 is a no-op at
            # the upper bound in both dtypes (1 - 1e-8 == 1.0), so a naive
            # log(1 - y) yields -inf and the gt-class cost NaN — NaN sorts
            # largest under top_k, silently excluding exactly the
            # best-predicted candidates from assignment. Stable identities:
            # log y = (log_sig(cls) + log_sig(obj)) / 2,
            # log(1 - y) = log(-expm1(log y)), finite at any logit.
            cls_logit = feats_i[:, 5:].astype(jnp.float32)
            obj_logit = feats_i[:, 4].astype(jnp.float32)
            log_y = 0.5 * (
                jax.nn.log_sigmoid(cls_logit)
                + jax.nn.log_sigmoid(obj_logit)[:, None]
            )                                                    # (C, nc)
            log_1my = jnp.log(-jnp.expm1(jnp.minimum(log_y, -1e-20)))
            sum_log_1my = jnp.sum(log_1my, axis=-1)              # (C,)
            # BCE summed over classes with one-hot gt:
            # -(log y_c - log(1-y_c) + sum_j log(1-y_j))
            cls_cost = -(
                log_y[:, gt_cls].T - log_1my[:, gt_cls].T
                + sum_log_1my[None, :]
            )                                                    # (M, C)

            cost = cls_cost + 3.0 * iou_cost
            cost = jnp.where(
                gt_valid[:, None] & valid_i[None, :], cost, BIG
            )

            # top-k smallest cost per gt, keep rank < dynamic_k
            neg_vals, idxs = jax.lax.top_k(-cost, k)             # (M, k)
            rank_ok = (
                jnp.arange(k)[None, :] < dynamic_k[:, None]
            ) & (-neg_vals < BIG / 2)                            # exclude invalid
            mm = jnp.zeros(cost.shape, bool)
            rows = jnp.broadcast_to(
                jnp.arange(cost.shape[0])[:, None], idxs.shape
            )
            mm = mm.at[rows.reshape(-1), idxs.reshape(-1)].max(
                rank_ok.reshape(-1)
            )

            mm = self._resolve_conflicts(mm, cost)

            fg = jnp.any(mm, axis=0)                             # (C,)
            matched_gt = jnp.argmax(mm, axis=0)                  # (C,)
            return fg, matched_gt

        fg, matched_gt = jax.vmap(assign)(feats, gxy, valid_c, targets)
        # fg: (B, C) bool; matched_gt: (B, C) int — integer/bool assignment
        # outputs; no gradient flows through the cost matrix, only through
        # the gathered preds in the per-level losses below.

        # ---- losses per level ----
        loss_box = 0.0
        loss_obj = 0.0
        loss_cls = 0.0
        col = 0
        for i, pred in enumerate(preds):
            meta = level_meta[i]
            cl = meta["cl"]
            sl = slice(col, col + cl)
            col += cl
            fg_l = fg[:, sl]                                     # (B, Cl)
            mg_l = matched_gt[:, sl]                             # (B, Cl)
            feats_l = feats[:, sl]                               # (B, Cl, no)
            gxy_l = gxy[:, sl]                                   # (B, Cl, 2)
            anc_l = anc[sl]                                      # (Cl, 2)

            ny, nx = meta["ny"], meta["nx"]
            gt = jnp.take_along_axis(
                targets, mg_l[..., None], axis=1
            )                                                    # (B, Cl, 5)
            gain = jnp.array([nx, ny, nx, ny], jnp.float32)
            tbox = gt[..., 1:5] * gain                           # grid units
            txy = tbox[..., 0:2] - gxy_l                         # rel to cell
            twh = tbox[..., 2:4]

            sig = jax.nn.sigmoid(feats_l[..., 0:4])
            pxy = sig[..., 0:2] * 2.0 - 0.5
            pwh = (sig[..., 2:4] * 2.0) ** 2 * anc_l[None]
            pbox = jnp.concatenate([pxy, pwh], axis=-1)
            tbox_rel = jnp.concatenate([txy, twh], axis=-1)
            iou = box_iou_aligned(
                pbox.reshape(-1, 4), tbox_rel.reshape(-1, 4),
                box_format="cxcywh", mode="ciou",
            ).reshape(fg_l.shape)
            n_l = jnp.maximum(jnp.sum(fg_l), 1).astype(pred.dtype)
            loss_box += jnp.where(fg_l, 1.0 - iou, 0.0).sum() / n_l

            # objectness
            b_, na_ = pred.shape[0], meta["na"]
            iou_det = jnp.clip(jax.lax.stop_gradient(iou), 0.0, None)
            tobj_updates = jnp.where(fg_l, iou_det, 0.0).reshape(-1)
            lin = meta["lin"].reshape(-1)
            tobj = jnp.zeros((b_ * na_ * ny * nx,), pred.dtype)
            tobj = tobj.at[lin].max(tobj_updates, mode="drop")
            loss_obj += (
                self._bce(
                    pred.reshape(-1, pred.shape[-1])[:, 4], tobj,
                    self.hyp.get("obj_pw", 1.0),
                ).mean()
                * self.balance[i]
            )

            # classification
            if nc > 1:
                onehot = jax.nn.one_hot(
                    jnp.clip(gt[..., 0], 0, nc - 1).astype(jnp.int32), nc
                )
                t = jnp.where(onehot > 0, self.cp, self.cn)
                ce = self._bce(
                    feats_l[..., 5:], t, self.hyp.get("cls_pw", 1.0)
                )
                loss_cls += (
                    jnp.where(fg_l[..., None], ce, 0.0).sum() / (n_l * nc)
                )

        loss_box *= self.hyp["box"]
        loss_obj *= self.hyp["obj"]
        loss_cls *= self.hyp["cls"]
        total = (loss_box + loss_obj + loss_cls) * bs
        parts = jax.lax.stop_gradient(
            jnp.stack([loss_box, loss_obj, loss_cls])
        )
        return total, parts
