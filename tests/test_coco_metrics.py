"""Golden-value tests for the first-party COCO-protocol metrics
(vision_kit_tpu/train/coco_metrics.py), the replacement for the reference's
torchmetrics MeanAveragePrecision (core/train/det_trainer.py:37,104)."""

import numpy as np
import pytest

from vision_kit_tpu.train.coco_metrics import COCOMetrics


def box(x, y, w, h):
    return [x, y, x + w, y + h]


def test_perfect_predictions():
    m = COCOMetrics()
    # one small (20x20=400 < 32^2) and one large (200x200) object, both hit
    labels = np.array([[0, *box(10, 10, 20, 20)], [0, *box(300, 300, 200, 200)]])
    preds = np.array(
        [[*box(10, 10, 20, 20), 0.9, 0], [*box(300, 300, 200, 200), 0.8, 0]]
    )
    m.update(preds, labels)
    r = m.compute()
    assert r["map"] == pytest.approx(1.0)
    assert r["map_50"] == pytest.approx(1.0)
    assert r["map_75"] == pytest.approx(1.0)
    assert r["map_small"] == pytest.approx(1.0)
    assert r["map_large"] == pytest.approx(1.0)
    assert r["map_medium"] == -1.0  # no medium objects -> excluded
    assert r["mar_100"] == pytest.approx(1.0)
    assert r["mar_10"] == pytest.approx(1.0)


def test_half_recall():
    m = COCOMetrics()
    labels = np.array([[0, *box(0, 0, 50, 50)], [0, *box(200, 200, 50, 50)]])
    preds = np.array([[*box(0, 0, 50, 50), 0.9, 0]])
    m.update(preds, labels)
    r = m.compute()
    # precision 1 up to recall 0.5: 51 of the 101 recall samples are 1.0
    assert r["map"] == pytest.approx(51 / 101)
    assert r["mar_100"] == pytest.approx(0.5)


def test_low_scored_fp_does_not_hurt_ap():
    m = COCOMetrics()
    labels = np.array([[0, *box(0, 0, 50, 50)]])
    preds = np.array(
        [[*box(0, 0, 50, 50), 0.9, 0], [*box(400, 400, 50, 50), 0.5, 0]]
    )
    m.update(preds, labels)
    r = m.compute()
    # the FP ranks below the TP: full recall reached at precision 1
    assert r["map"] == pytest.approx(1.0)
    assert r["mar_1"] == pytest.approx(1.0)


def test_high_scored_fp_and_maxdets():
    m = COCOMetrics()
    labels = np.array([[0, *box(0, 0, 50, 50)], [0, *box(200, 0, 50, 50)]])
    preds = np.array([
        [*box(400, 400, 50, 50), 0.95, 0],  # FP, highest score
        [*box(0, 0, 50, 50), 0.8, 0],
        [*box(200, 0, 50, 50), 0.7, 0],
    ])
    m.update(preds, labels)
    r = m.compute()
    # mar_1: only the top-1 det kept, it's the FP -> recall 0
    assert r["mar_1"] == pytest.approx(0.0)
    assert r["mar_10"] == pytest.approx(1.0)
    # precision samples: 0 until recall>0; p=1/2 at r=.5, 2/3 at r=1 ->
    # envelope: 2/3 for all r<=1 -> AP = 2/3
    assert r["map"] == pytest.approx(2 / 3, abs=1e-6)


def test_iou_threshold_sweep():
    m = COCOMetrics()
    labels = np.array([[0, *box(0, 0, 100, 100)]])
    # shifted box: IoU = (100*80)/(100*120) = 2/3 -> TP at thr .5,.55,.6,.65
    preds = np.array([[*box(0, 20, 100, 100), 0.9, 0]])
    m.update(preds, labels)
    r = m.compute()
    assert r["map_50"] == pytest.approx(1.0)
    assert r["map_75"] == pytest.approx(0.0)
    assert r["map"] == pytest.approx(4 / 10)


def test_class_separation():
    m = COCOMetrics()
    labels = np.array([[0, *box(0, 0, 50, 50)], [1, *box(200, 0, 50, 50)]])
    # class-0 pred on the class-1 gt location: no match for either class
    preds = np.array([
        [*box(0, 0, 50, 50), 0.9, 0],
        [*box(200, 0, 50, 50), 0.9, 0],
    ])
    m.update(preds, labels)
    r = m.compute()
    # class 0: 1 TP + 1 FP; class 1: no preds -> AP 0.
    # class 0 AP: tp first? both conf .9, stable order keeps row order:
    # tp then fp -> precision envelope 1 up to recall 1 -> AP 1
    assert r["map_50"] == pytest.approx(0.5)


def test_area_ignored_gt_excluded_from_recall():
    m = COCOMetrics()
    # one small gt, one large gt; only the large is detected
    labels = np.array([[0, *box(0, 0, 10, 10)], [0, *box(100, 100, 200, 200)]])
    preds = np.array([[*box(100, 100, 200, 200), 0.9, 0]])
    m.update(preds, labels)
    r = m.compute()
    # large-area eval ignores the small gt entirely -> perfect
    assert r["map_large"] == pytest.approx(1.0)
    assert r["mar_large"] == pytest.approx(1.0)
    # small-area eval: the large det is out-of-range-unmatched -> ignored,
    # small gt undetected -> recall 0
    assert r["mar_small"] == pytest.approx(0.0)


def test_empty_images():
    m = COCOMetrics()
    m.update(np.zeros((0, 6)), np.zeros((0, 5)))
    r = m.compute()
    assert r["map"] == -1.0

    m2 = COCOMetrics()
    # gt but no preds
    m2.update(np.zeros((0, 6)), np.array([[0, *box(0, 0, 50, 50)]]))
    r2 = m2.compute()
    assert r2["map"] == pytest.approx(0.0)
    assert r2["mar_100"] == pytest.approx(0.0)


def test_evaluator_summarize_coco_smoke():
    from vision_kit_tpu.train.evaluator import DetEvaluator

    ev = DetEvaluator(["a", "b"], img_size=(64, 64))
    dets = np.zeros((1, 4, 6), np.float32)
    dets[0, 0] = [8, 8, 24, 24, 0.9, 0]
    valid = np.zeros((1, 4), bool)
    valid[0, 0] = True
    targets = np.full((1, 3, 5), -1, np.float32)
    targets[0, 0] = [0, 0.25, 0.25, 0.25, 0.25]  # cx cy w h normalized
    infos = [(64, 64, 1.0, (0.0, 0.0), 0)]
    ev.update(dets, valid, targets, infos)
    coco = ev.summarize_coco()
    assert coco["map_50"] == pytest.approx(1.0)


# -- randomized differential vs the round-1 loop-based matcher ------------
# The vectorized _greedy_match must reproduce the original triple-loop
# COCOeval semantics exactly; the old matcher lives on here as the oracle.

def _match_image_ref(dets, gts, area_rng, max_det):
    """Round-1 loop-based COCOeval matching (oracle)."""
    from vision_kit_tpu.train.coco_metrics import IOU_THRS, _box_area, _iou

    lo, hi = area_rng
    order = np.argsort(-dets[:, 4], kind="stable")[:max_det]
    dets = dets[order]
    g_area = _box_area(gts) if len(gts) else np.zeros((0,))
    g_ignore = (g_area < lo) | (g_area > hi)
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
    d_area = _box_area(dets[:, :4])
    out_of_range = (d_area < lo) | (d_area > hi)
    d_ignore |= (out_of_range[:, None] & ~tp)
    return dets[:, 4], tp, d_ignore, int((~g_ignore).sum())


class _RefCOCOMetrics(COCOMetrics):
    """Round-1 compute() driving the oracle matcher."""

    def compute(self):
        from vision_kit_tpu.train.coco_metrics import (
            AREA_RANGES, IOU_THRS, MAX_DETS, REC_THRS)

        classes = list(self.class_ids) if self.class_ids is not None else \
            sorted({int(v) for p, l in self.images
                    for v in (list(l[:, 0]) if len(l) else [])
                    + (list(p[:, 5]) if len(p) else [])})
        n_iou, n_rec = len(IOU_THRS), len(REC_THRS)
        settings = [(a, d) for a in AREA_RANGES for d in MAX_DETS]
        precision = {s: np.full((n_iou, n_rec, len(classes)), -1.0)
                     for s in settings}
        recall_ = {s: np.full((n_iou, len(classes)), -1.0) for s in settings}
        for ci, c in enumerate(classes):
            per_img = []
            for preds, labels in self.images:
                d = preds[preds[:, 5] == c][:, :5] if len(preds) \
                    else np.zeros((0, 5))
                g = labels[labels[:, 0] == c][:, 1:5] if len(labels) \
                    else np.zeros((0, 4))
                per_img.append((d, g))
            for a_name, a_rng in AREA_RANGES.items():
                matched = [_match_image_ref(d, g, a_rng, MAX_DETS[-1])
                           for d, g in per_img]
                n_gt = sum(m[3] for m in matched)
                if n_gt == 0:
                    continue
                for max_det in MAX_DETS:
                    scores = np.concatenate(
                        [m[0][:max_det] for m in matched])
                    tps = np.concatenate(
                        [m[1][:max_det] for m in matched], 0)
                    igns = np.concatenate(
                        [m[2][:max_det] for m in matched], 0)
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
            "map": _ap("all", 100), "map_50": _ap("all", 100, slice(0, 1)),
            "map_75": _ap("all", 100, slice(5, 6)),
            "map_small": _ap("small", 100),
            "map_medium": _ap("medium", 100),
            "map_large": _ap("large", 100),
            "mar_1": _ar("all", 1), "mar_10": _ar("all", 10),
            "mar_100": _ar("all", 100), "mar_small": _ar("small", 100),
            "mar_medium": _ar("medium", 100), "mar_large": _ar("large", 100),
        }


def _random_scene(rng, n_classes, clustered=False):
    """Random preds/labels with size diversity (hits all area bins), exact
    duplicate boxes (IoU ties) and overlapping clusters."""
    m = int(rng.integers(0, 8))
    n = int(rng.integers(0, 15))
    def boxes(k):
        xy = rng.uniform(0, 500, (k, 2))
        # log-uniform sizes: spans small (<32^2) to large (>96^2)
        wh = np.exp(rng.uniform(np.log(4), np.log(300), (k, 2)))
        return np.concatenate([xy, xy + wh], 1)
    labels = np.concatenate(
        [rng.integers(0, n_classes, (m, 1)).astype(float), boxes(m)], 1
    ) if m else np.zeros((0, 5))
    b = boxes(n)
    if clustered and n > 2 and m:
        # jittered copies of gt boxes -> dense overlaps + near-ties
        src = labels[rng.integers(0, m, n), 1:5]
        b = src + rng.normal(0, 4, (n, 4))
    if n > 1:
        b[0] = b[1]  # exact duplicate pair -> argmax tie
    preds = np.concatenate(
        [b, rng.uniform(0, 1, (n, 1)),
         rng.integers(0, n_classes, (n, 1)).astype(float)], 1
    ) if n else np.zeros((0, 6))
    return preds, labels


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_vectorized_matches_loop_oracle(seed):
    rng = np.random.default_rng(seed)
    fast = COCOMetrics(class_ids=list(range(5)))
    ref = _RefCOCOMetrics(class_ids=list(range(5)))
    for i in range(25):
        p, l = _random_scene(rng, 5, clustered=(i % 2 == 0))
        fast.update(p, l)
        ref.update(p, l)
    got, exp = fast.compute(), ref.compute()
    assert got.keys() == exp.keys()
    for k in exp:
        assert got[k] == pytest.approx(exp[k], abs=1e-12), k
