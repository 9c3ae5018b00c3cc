"""Evaluator tests: matching logic, AP computation, perfect/imperfect
detections, plus ap_per_class parity with the reference implementation."""

import numpy as np
import pytest

from vision_kit_tpu.train.evaluator import (
    DetEvaluator,
    ap_per_class,
    compute_ap,
    match_predictions,
)


def test_compute_ap_perfect():
    # 101-point interpolation puts the (recall=1, precision->0) sentinel at
    # the last sample, so a perfect detector scores 0.995, exactly like the
    # reference/ultralytics implementation.
    ap, _, _ = compute_ap(np.array([1.0]), np.array([1.0]))
    assert ap == pytest.approx(0.995, abs=1e-3)


def test_match_predictions_exact():
    iouv = np.linspace(0.5, 0.95, 10)
    labels = np.array([[0.0, 10, 10, 50, 50]])
    preds = np.array([[10, 10, 50, 50, 0.9, 0.0]])
    correct = match_predictions(preds, labels, iouv)
    assert correct.all()  # IoU 1.0 passes every threshold


def test_match_predictions_wrong_class():
    iouv = np.linspace(0.5, 0.95, 10)
    labels = np.array([[1.0, 10, 10, 50, 50]])
    preds = np.array([[10, 10, 50, 50, 0.9, 0.0]])
    assert not match_predictions(preds, labels, iouv).any()


def test_match_dedup_one_label_one_det():
    """Two detections on one label: only the higher-IoU one is a TP."""
    iouv = np.array([0.5])
    labels = np.array([[0.0, 0, 0, 100, 100]])
    preds = np.array([
        [0, 0, 100, 100, 0.9, 0.0],
        [5, 5, 100, 100, 0.8, 0.0],
    ])
    correct = match_predictions(preds, labels, iouv)
    assert correct.sum() == 1
    assert correct[0, 0]


def test_evaluator_perfect_detections():
    ev = DetEvaluator(["a", "b"], img_size=(128, 128))
    # one image, two gt boxes; detections identical
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [0, 0.25, 0.25, 0.3, 0.3]
    targets[0, 1] = [1, 0.7, 0.7, 0.2, 0.2]
    dets = np.zeros((1, 10, 6), np.float32)
    valid = np.zeros((1, 10), bool)
    for i, (cls, cx, cy, w, h) in enumerate(
        [(0, 0.25, 0.25, 0.3, 0.3), (1, 0.7, 0.7, 0.2, 0.2)]
    ):
        dets[0, i] = [
            (cx - w / 2) * 128, (cy - h / 2) * 128,
            (cx + w / 2) * 128, (cy + h / 2) * 128, 0.9, cls,
        ]
        valid[0, i] = True
    infos = [(128, 128, 1.0, (0.0, 0.0), 0)]
    ev.update(dets, valid, targets, infos)
    result = ev.summarize()
    assert result["map50"] > 0.99
    assert result["map50_95"] > 0.99


def test_evaluator_no_detections():
    ev = DetEvaluator(["a"], img_size=(128, 128))
    targets = np.full((1, 2, 5), -1, np.float32)
    targets[0, 0] = [0, 0.5, 0.5, 0.4, 0.4]
    dets = np.zeros((1, 5, 6), np.float32)
    valid = np.zeros((1, 5), bool)
    ev.update(dets, valid, targets, [(128, 128, 1.0, (0.0, 0.0), 0)])
    result = ev.summarize()
    assert result["map50"] == 0.0


def test_evaluator_empty_labels_with_preds():
    """Image with predictions but no labels must not crash (reference bug:
    unbound targetn / vstack crash, det_evaluator.py:180-182)."""
    ev = DetEvaluator(["a"], img_size=(128, 128))
    targets = np.full((1, 2, 5), -1, np.float32)
    dets = np.zeros((1, 5, 6), np.float32)
    dets[0, 0] = [10, 10, 50, 50, 0.9, 0]
    valid = np.zeros((1, 5), bool)
    valid[0, 0] = True
    ev.update(dets, valid, targets, [(128, 128, 1.0, (0.0, 0.0), 0)])
    result = ev.summarize()  # all FP -> map 0
    assert result["map50"] == 0.0


def test_ap_per_class_parity_with_reference(reference, rng):
    from vision_kit.core.eval.det_evaluator import ap_per_class as ref_ap

    n = 200
    tp = rng.random((n, 10)) > 0.5
    conf = rng.random(n).astype(np.float32)
    pred_cls = rng.integers(0, 5, n).astype(np.float32)
    target_cls = rng.integers(0, 5, 300).astype(np.float32)

    ref = ref_ap(tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    got = ap_per_class(tp.copy(), conf.copy(), pred_cls.copy(), target_cls.copy())
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=1e-6,
                                   atol=1e-8)
