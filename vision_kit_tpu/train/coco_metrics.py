"""COCO-protocol detection metrics on host (numpy).

Replaces the reference's torchmetrics ``MeanAveragePrecision`` dependency
(core/train/det_trainer.py:37,104 and the mAP/mAR tables of
test_epoch_end, det_trainer.py:150-177) with a first-party implementation of
the COCOeval bbox protocol:

  * AP at IoU .50:.95 (10 thresholds), .50, .75
  * AP for small (<32^2), medium (32^2..96^2), large (>96^2) objects
  * AR at maxDets 1 / 10 / 100, and AR small/medium/large (maxDets 100)
  * 101-point precision interpolation, score-sorted greedy matching with
    per-GT dedup, area-ignored GTs excluded from recall denominators.

Inputs are plain numpy arrays per image:
  preds:  (n, 6) [x1 y1 x2 y2 conf cls]
  labels: (m, 5) [cls x1 y1 x2 y2]
(the same shapes DetEvaluator already accumulates).
"""

from __future__ import annotations

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RANGES = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0**2),
    "medium": (32.0**2, 96.0**2),
    "large": (96.0**2, 1e10),
}
MAX_DETS = (1, 10, 100)


def _box_area(b: np.ndarray) -> np.ndarray:
    return np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(
        b[:, 3] - b[:, 1], 0, None
    )


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise xyxy IoU (n, m)."""
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:4], b[None, :, 2:4])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = _box_area(a)[:, None] + _box_area(b)[None, :] - inter
    return inter / np.maximum(union, 1e-9)


def _match_image(dets: np.ndarray, gts: np.ndarray, area_rng, max_det: int):
    """COCOeval-style per-image matching for one class.

    dets: (n, 5) [x1 y1 x2 y2 score], score-desc order enforced here.
    gts:  (m, 4) xyxy.
    Returns (scores, tp[n_kept, n_iou], ignored[n_kept], n_gt_counted).
    """
    lo, hi = area_rng
    order = np.argsort(-dets[:, 4], kind="stable")[:max_det]
    dets = dets[order]
    g_area = _box_area(gts) if len(gts) else np.zeros((0,))
    g_ignore = (g_area < lo) | (g_area > hi)
    # sort gts: non-ignored first (COCOeval matches preferentially to them)
    g_order = np.argsort(g_ignore, kind="stable")
    gts = gts[g_order]
    g_ignore = g_ignore[g_order]

    n, m = len(dets), len(gts)
    n_iou = len(IOU_THRS)
    tp = np.zeros((n, n_iou), dtype=bool)
    d_ignore = np.zeros((n, n_iou), dtype=bool)
    if m:
        ious = _iou(dets[:, :4], gts)
        for ti, thr in enumerate(IOU_THRS):
            taken = np.zeros(m, dtype=bool)
            for di in range(n):
                best, best_iou = -1, thr - 1e-10
                for gi in range(m):
                    if taken[gi]:
                        continue
                    # once we hit ignored gts, a non-ignored match (if any)
                    # already found wins; only keep looking for ignored gts
                    # if nothing real matched
                    if best > -1 and not g_ignore[best] and g_ignore[gi]:
                        break
                    if ious[di, gi] < best_iou:
                        continue
                    best, best_iou = gi, ious[di, gi]
                if best > -1:
                    taken[best] = True
                    if g_ignore[best]:
                        d_ignore[di, ti] = True
                    else:
                        tp[di, ti] = True
    # unmatched dets outside the area range are ignored, not FPs
    d_area = _box_area(dets[:, :4])
    out_of_range = (d_area < lo) | (d_area > hi)
    d_ignore |= (out_of_range[:, None] & ~tp)
    return dets[:, 4], tp, d_ignore, int((~g_ignore).sum())


class COCOMetrics:
    """Accumulate per-image (preds, labels) and compute the COCOeval set."""

    def __init__(self, class_ids=None):
        self.images: list[tuple[np.ndarray, np.ndarray]] = []
        self.class_ids = class_ids

    def reset(self):
        self.images.clear()

    def update(self, preds: np.ndarray, labels: np.ndarray):
        self.images.append(
            (np.asarray(preds, np.float64), np.asarray(labels, np.float64))
        )

    def compute(self) -> dict:
        if self.class_ids is not None:
            classes = list(self.class_ids)
        else:
            cs = set()
            for p, l in self.images:
                cs.update(np.unique(l[:, 0]).astype(int).tolist() if len(l) else [])
                cs.update(np.unique(p[:, 5]).astype(int).tolist() if len(p) else [])
            classes = sorted(cs)

        n_iou, n_rec = len(IOU_THRS), len(REC_THRS)
        settings = [(a, d) for a in AREA_RANGES for d in MAX_DETS]
        # precision[setting][iou, recall, class], recall_[setting][iou, class]
        precision = {s: np.full((n_iou, n_rec, len(classes)), -1.0) for s in settings}
        recall_ = {s: np.full((n_iou, len(classes)), -1.0) for s in settings}

        for ci, c in enumerate(classes):
            per_img = []
            for preds, labels in self.images:
                d = preds[preds[:, 5] == c][:, :5] if len(preds) else np.zeros((0, 5))
                g = labels[labels[:, 0] == c][:, 1:5] if len(labels) else np.zeros((0, 4))
                per_img.append((d, g))
            for a_name, a_rng in AREA_RANGES.items():
                # match once at the largest maxDets; greedy matching in score
                # order is prefix-stable, so top-k results are row slices
                # (same trick as COCOeval: one evaluateImg, sliced in
                # accumulate)
                matched = [
                    _match_image(d, g, a_rng, MAX_DETS[-1]) for d, g in per_img
                ]
                n_gt = sum(m[3] for m in matched)
                if n_gt == 0:
                    continue
                for max_det in MAX_DETS:
                    scores = np.concatenate([m[0][:max_det] for m in matched])
                    tps = np.concatenate([m[1][:max_det] for m in matched], 0)
                    igns = np.concatenate([m[2][:max_det] for m in matched], 0)
                    order = np.argsort(-scores, kind="mergesort")
                    tps, igns = tps[order], igns[order]
                    key = (a_name, max_det)
                    for ti in range(n_iou):
                        keep = ~igns[:, ti]
                        tp = tps[keep, ti]
                        tp_cum = np.cumsum(tp)
                        fp_cum = np.cumsum(~tp)
                        rc = tp_cum / n_gt
                        pr = tp_cum / np.maximum(tp_cum + fp_cum, 1e-9)
                        recall_[key][ti, ci] = rc[-1] if len(rc) else 0.0
                        # monotone envelope then sample at 101 recall pts
                        pr = np.maximum.accumulate(pr[::-1])[::-1]
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(n_rec)
                        valid = inds < len(pr)
                        q[valid] = pr[inds[valid]]
                        precision[key][ti, :, ci] = q

        def _ap(a_name, max_det, iou_slice=slice(None)):
            p = precision[(a_name, max_det)][iou_slice]
            p = p[p > -1]
            return float(p.mean()) if p.size else -1.0

        def _ar(a_name, max_det):
            r = recall_[(a_name, max_det)]
            r = r[r > -1]
            return float(r.mean()) if r.size else -1.0

        return {
            "map": _ap("all", 100),
            "map_50": _ap("all", 100, slice(0, 1)),
            "map_75": _ap("all", 100, slice(5, 6)),
            "map_small": _ap("small", 100),
            "map_medium": _ap("medium", 100),
            "map_large": _ap("large", 100),
            "mar_1": _ar("all", 1),
            "mar_10": _ar("all", 10),
            "mar_100": _ar("all", 100),
            "mar_small": _ar("small", 100),
            "mar_medium": _ar("medium", 100),
            "mar_large": _ar("large", 100),
        }
