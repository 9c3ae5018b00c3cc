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
