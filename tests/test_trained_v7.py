"""TRAINED-v7 / SimOTA end-to-end evidence (VERDICT r3 missing #1).

SimOTA is the one from-scratch component with no working reference oracle
(the reference's YoloLossOTA is dead code, losses/yolo.py:140-412). Unit
tests showed loss decreases; these tests show the assigner produces a
trainable-to-CONVERGENCE signal and that everything downstream of the
trained weights (eval pipeline, deploy folding) holds on them:

  * v7-base@64 trained with `loss_ota: 1` reaches mAP@.5 >= 0.8 on the
    12-rectangle set — the gate is recomputed HERE on CPU from the fixture
    weights, whatever backend trained them;
  * full eval-pipeline differential repo-vs-reference on those trained
    weights (crowded eval set, mAP within 1e-3) — same protocol as the
    trained_v5n differential (tests/test_trained_parity.py);
  * reparameterization + RepConv deploy-fold parity on the TRAINED params,
    both internally (fold == unfused forward) and against the reference's
    own fold (architectures/yolov7.py:82-103) on the converted weights;
  * OTA-vs-YoloLoss end-metric comparison on the same data/recipe.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from test_trained_parity import (
    BATCH,
    CONF,
    IOU,
    MAX_CAND,
    MAX_DET,
    _eval_set,
    _targets_batch,
)
from vision_kit_tpu.convert import (
    flax_to_torch,
    fuse_repconv_params,
    reparameterize_v7,
)
from vision_kit_tpu.models import YOLOV7
from vision_kit_tpu.ops.nms import postprocess
from vision_kit_tpu.train.evaluator import DetEvaluator

IMG = 64
NC = 2
CLASSES = ["red", "green"]

pytestmark = pytest.mark.slow  # all tests need the trained-v7 fixture


def _v7_map(variables, images, gts, deploy=False):
    """Repo pipeline: jit(v7 + device NMS) -> DetEvaluator summary."""
    model = YOLOV7(variant="base", num_classes=NC, deploy=deploy)

    @jax.jit
    def step(x):
        decoded, _ = model.apply(variables, x, training=False)
        return postprocess(
            decoded, conf_thres=CONF, iou_thres=IOU, multi_label=True,
            max_det=MAX_DET, max_cand=MAX_CAND, multi_label_top=20,
        )

    ev = DetEvaluator(CLASSES, (IMG, IMG))
    x_all = images.astype(np.float32) / 255.0
    for s in range(0, len(images), BATCH):
        b = min(BATCH, len(images) - s)
        dets, valid = step(jnp.asarray(x_all[s:s + b]))
        infos = [(IMG, IMG, 1.0, (0.0, 0.0), s + k) for k in range(b)]
        ev.update(np.asarray(dets), np.asarray(valid),
                  _targets_batch(gts, s, b), infos)
    return ev.summarize()


def _reference_v7_map(variables, images, gts):
    """Reference pipeline on the converted weights (torch fp32)."""
    import torch
    from conftest import reset_reference_defaults
    from vision_kit.core.eval.det_evaluator import DetEvaluator as RefEval
    from vision_kit.models.architectures.yolov7 import YOLOV7 as RefV7
    from vision_kit.utils.image_proc import nms as ref_nms

    reset_reference_defaults()
    torch_model = RefV7(variant="base", num_classes=NC, deploy=False)
    sd = flax_to_torch(variables, half=False)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    torch_model.eval()

    ref_eval = RefEval(CLASSES, (IMG, IMG))
    x_all = images.astype(np.float32) / 255.0
    for s in range(0, len(images), BATCH):
        b = min(BATCH, len(images) - s)
        xb = torch.from_numpy(x_all[s:s + b].transpose(0, 3, 1, 2))
        with torch.no_grad():
            out = torch_model(xb)
        # per-image ref_nms: immune to its wall-clock budget on a loaded
        # 1-core host (see test_full_pipeline_parity for the analysis)
        preds = [
            ref_nms(out[0][k:k + 1], CONF, IOU, multi_label=True)[0]
            for k in range(b)
        ]
        trows = []
        for k in range(b):
            g = gts[s + k]
            trows.append(np.concatenate(
                [np.full((len(g), 1), k, np.float32), g], axis=1))
        targets = torch.from_numpy(np.concatenate(trows, 0))
        ref_eval.evaluate(
            img=xb, img_infos=[(IMG, IMG)] * b,
            idxs=list(range(s, s + b)), preds=preds, targets=targets,
        )
    map50, map95, _, _ = ref_eval.summarize()
    return float(map50), float(map95)


def _training_set(tmp_path):
    """Reconstruct the deterministic 12-rectangle training/val set and
    parse its GT labels into the evaluator's (g, 5) format."""
    import cv2

    from fixture_lib import build_rectangle_dataset

    root = str(tmp_path / "rect_ds")
    build_rectangle_dataset(root)
    images, gts = [], []
    for i in range(12):
        img = cv2.imread(f"{root}/images/val/im{i}.jpg")[:, :, ::-1]
        images.append(img)
        rows = []
        with open(f"{root}/labels/val/im{i}.txt") as f:
            for line in f.read().splitlines():
                c, cx, cy, w, h = line.split()
                rows.append([float(c), float(cx), float(cy),
                             float(w), float(h)])
        gts.append(np.asarray(rows, np.float32))
    return np.stack(images), gts


def test_v7_ota_trains_to_map(trained_v7, tmp_path):
    """THE SimOTA convergence gate: the OTA-trained v7 detects its training
    distribution at mAP@.5 >= 0.8, evaluated from scratch on CPU here (the
    fixture's own validate() result is recorded in meta but not trusted)."""
    images, gts = _training_set(tmp_path)
    res = _v7_map(trained_v7["variables"], images, gts)
    assert res["map50"] >= 0.8, (res, trained_v7["meta"])


def test_trained_v7_full_pipeline_map_parity(reference, trained_v7):
    """End-to-end mAP parity on OTA-TRAINED v7 weights, fp32 both sides:
    (repo model -> repo NMS -> repo evaluator) vs (flax_to_torch ->
    reference torch v7 -> reference nms -> reference DetEvaluator)."""
    images, gts = _eval_set()
    variables = trained_v7["variables"]
    repo = _v7_map(variables, images, gts)
    ref50, ref95 = _reference_v7_map(variables, images, gts)
    # genuinely detecting on the crowded set, not vacuous 0-0 agreement
    assert repo["map50"] > 0.3, repo
    assert repo["map50_95"] < 0.999
    assert repo["map50"] == pytest.approx(ref50, abs=1e-3)
    assert repo["map50_95"] == pytest.approx(ref95, abs=1e-3)


def test_trained_v7_deploy_fold_parity(reference, trained_v7):
    """Deploy folding on TRAINED params (BN stats and implicits carry real
    magnitudes, not init-time ones): RepConv fusion + implicit
    reparameterization preserve the forward, and the fold agrees with the
    reference's own reparameterization (yolov7.py:82-103) run on the
    converted weights."""
    import torch
    from conftest import reset_reference_defaults
    from vision_kit.models.architectures.yolov7 import YOLOV7 as RefV7

    variables = trained_v7["variables"]
    rng = np.random.default_rng(21)
    x = jnp.asarray(rng.uniform(0, 1, (2, IMG, IMG, 3)).astype(np.float32))

    # decode_order="reference" (anchor-major): the second assert compares
    # decoded rows elementwise against the reference's output, whose
    # candidate order differs from our native NHWC decode order
    model = YOLOV7(variant="base", num_classes=NC, deploy=False,
                   decode_order="reference")
    ref_decoded, _ = jax.jit(
        lambda v, x: model.apply(v, x, training=False)
    )(variables, x)

    fused = fuse_repconv_params(variables)
    fused = reparameterize_v7(fused, num_classes=NC)
    deploy_model = YOLOV7(variant="base", num_classes=NC, deploy=True,
                          decode_order="reference")
    got_decoded, _ = jax.jit(
        lambda v, x: deploy_model.apply(v, x, training=False)
    )(fused, x)
    np.testing.assert_allclose(
        np.asarray(got_decoded), np.asarray(ref_decoded),
        rtol=2e-3, atol=2e-3,
    )

    # reference cross-check: its static reparameterization folds ia/im into
    # a deploy-constructed model loaded with the converted trained weights
    reset_reference_defaults()
    ref_deploy = RefV7(variant="base", num_classes=NC, deploy=True)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v))
          for k, v in flax_to_torch(variables, half=False).items()}
    RefV7.reparameterization(ref_deploy, sd)
    ref_deploy.eval()
    with torch.no_grad():
        ref_out = ref_deploy(
            torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(got_decoded), ref_out[0].numpy(), rtol=2e-3, atol=2e-3,
    )


def test_ota_vs_plain_loss_end_metric(trained_v7, trained_v7_plain,
                                      tmp_path):
    """OTA-vs-YoloLoss end-metric comparison on the same data and recipe
    (what the reference never demonstrated — its OTA is dead code): both
    assigners train v7 to a detecting model, and SimOTA lands in the same
    quality regime as the dense assigner (within 0.1 mAP@.5)."""
    images, gts = _training_set(tmp_path)
    ota = _v7_map(trained_v7["variables"], images, gts)
    plain = _v7_map(trained_v7_plain["variables"], images, gts)
    assert ota["map50"] >= 0.8, ota
    assert plain["map50"] >= 0.8, plain
    assert ota["map50"] >= plain["map50"] - 0.1, (ota, plain)
