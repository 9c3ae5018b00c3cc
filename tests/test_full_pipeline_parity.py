"""Full-pipeline mAP differential: (repo model -> repo NMS -> repo
evaluator) vs (same weights via the converter -> reference torch model ->
reference nms -> reference DetEvaluator) over on the order of a hundred
synthetic images, for BOTH model families.

This is the standing stand-in for the missing pretrained-weights full-COCO
parity run (SURVEY.md:6-7): both pipelines consume identical weights and
images, produce their own detections end-to-end, and the final
mAP@.5 / mAP@.5:.95 must agree within 1e-3.

Ground truth is built from the repo pipeline's own jittered detections plus
random distractor boxes, so the PR curves are mid-range and IoU-threshold
sensitive (pure-random GTs would give mAP ~= 0 for both sides — vacuous
agreement). Reference pipeline: vision_kit/utils/image_proc.py:83-187 (nms)
+ core/eval/det_evaluator.py:129-226.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.convert import torch_to_flax
from vision_kit_tpu.models import YOLOV5, YOLOV7
from vision_kit_tpu.ops.nms import postprocess
from vision_kit_tpu.train.evaluator import DetEvaluator

IMG = 96
NC = 2
BATCH = 25
CONF, IOU = 0.001, 0.6
MAX_DET = 300
CLASSES = ["a", "b"]


def _convert(torch_model, jax_model):
    torch_model.eval()
    variables = jax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), training=False
    )
    return torch_to_flax(torch_model.state_dict(), template=variables)


def _differential(torch_model, jax_model, variables, n_images):
    """Run both full pipelines on the same images/weights; return
    (repo summarize dict, ref mAP@.5, ref mAP@.5:.95)."""
    import torch

    rng = np.random.default_rng(0)
    images = rng.integers(0, 255, (n_images, IMG, IMG, 3), dtype=np.uint8)
    x_all = images.astype(np.float32) / 255.0

    @jax.jit
    def repo_step(x):
        decoded, _ = jax_model.apply(variables, x, training=False)
        return postprocess(
            decoded, conf_thres=CONF, iou_thres=IOU, multi_label=True,
            max_det=MAX_DET, max_cand=2048,
        )

    # ---- repo pipeline + GT construction from jittered detections -------
    repo_eval = DetEvaluator(CLASSES, (IMG, IMG))
    all_dets, all_valid = [], []
    gts = []  # per image (g, 5) [cls, cxn, cyn, wn, hn]
    for s in range(0, n_images, BATCH):
        dets, valid = repo_step(jnp.asarray(x_all[s:s + BATCH]))
        dets, valid = np.asarray(dets), np.asarray(valid)
        all_dets.append(dets)
        all_valid.append(valid)
        for bi in range(dets.shape[0]):
            d = dets[bi][valid[bi]]
            rows = []
            take = d[:3]  # top-scored detections -> high precision head
            for r in take:
                x1, y1, x2, y2 = r[:4]
                w, h = x2 - x1, y2 - y1
                if w < 2 or h < 2:
                    continue
                jit = rng.uniform(0.85, 1.15, 4)
                cx = (x1 + x2) / 2 + rng.uniform(-0.1, 0.1) * w
                cy = (y1 + y2) / 2 + rng.uniform(-0.1, 0.1) * h
                rows.append([
                    float(r[5]), cx / IMG, cy / IMG,
                    np.clip(w * jit[2], 2, IMG) / IMG,
                    np.clip(h * jit[3], 2, IMG) / IMG,
                ])
            # distractor box -> guaranteed >= 1 label and recall misses
            rows.append([
                float(rng.integers(0, NC)), rng.uniform(0.2, 0.8),
                rng.uniform(0.2, 0.8), rng.uniform(0.1, 0.3),
                rng.uniform(0.1, 0.3),
            ])
            gts.append(np.asarray(rows, np.float32))

    max_labels = max(len(g) for g in gts)
    for s in range(0, n_images, BATCH):
        bi = s // BATCH
        targets = np.full((BATCH, max_labels, 5), -1, np.float32)
        for k in range(BATCH):
            g = gts[s + k]
            targets[k, : len(g)] = g
        infos = [(IMG, IMG, 1.0, (0.0, 0.0), s + k) for k in range(BATCH)]
        repo_eval.update(all_dets[bi], all_valid[bi], targets, infos)
    repo_res = repo_eval.summarize()

    # ---- reference pipeline (same weights, images, GT) ------------------
    from vision_kit.core.eval.det_evaluator import DetEvaluator as RefEval
    from vision_kit.utils.image_proc import nms as ref_nms

    ref_eval = RefEval(CLASSES, (IMG, IMG))
    for s in range(0, n_images, BATCH):
        xb = torch.from_numpy(
            x_all[s:s + BATCH].transpose(0, 3, 1, 2)
        ).float()
        with torch.no_grad():
            out = torch_model(xb)
        # Per-image ref_nms calls: the reference nms has a WALL-CLOCK budget
        # (time_limit = 0.3+0.03*bs, image_proc.py:109,183-185) after which
        # it silently leaves remaining images with zero detections — on a
        # loaded 1-core host a batch call can trip it and fail the mAP
        # comparison spuriously. Each image's output is stored BEFORE the
        # time check, so per-image calls are exactly equivalent and immune.
        preds = [
            ref_nms(out[0][k:k + 1], CONF, IOU, multi_label=True)[0]
            for k in range(BATCH)
        ]
        trows = []
        for k in range(BATCH):
            g = gts[s + k]
            trows.append(np.concatenate(
                [np.full((len(g), 1), k, np.float32), g], axis=1
            ))
        targets = torch.from_numpy(np.concatenate(trows, 0))
        ref_eval.evaluate(
            img=xb, img_infos=[(IMG, IMG)] * BATCH,
            idxs=list(range(s, s + BATCH)), preds=preds, targets=targets,
        )
    ref_map50, ref_map95, _, _ = ref_eval.summarize()
    return repo_res, float(ref_map50), float(ref_map95)


def _assert_agreement(repo_res, ref_map50, ref_map95):
    # both sides produced meaningful mid-range curves, and they agree
    assert 0.02 < repo_res["map50_95"] < 0.95
    assert repo_res["map50"] == pytest.approx(ref_map50, abs=1e-3)
    assert repo_res["map50_95"] == pytest.approx(ref_map95, abs=1e-3)


def test_full_pipeline_map_parity(reference):
    import torch

    from conftest import reset_reference_defaults
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    # deterministic weights: with unseeded init the random model's many
    # near-tied scores make NMS keep-sets (and mAP, ~5e-3) run-dependent
    torch.manual_seed(0)
    reset_reference_defaults()
    torch_model = RefV5(variant="n", num_classes=NC)
    reset_reference_defaults()
    jax_model = YOLOV5(variant="n", num_classes=NC)
    variables = _convert(torch_model, jax_model)
    _assert_agreement(*_differential(torch_model, jax_model, variables, 250))


def test_full_pipeline_map_parity_v7(reference):
    """Same end-to-end differential through the second model family
    (ELAN backbone, SPPCSPC neck, Implicit head — reference
    models/architectures/yolov7.py). Fewer images: v7-base is ~10x v5n
    FLOPs and both pipelines run on one CPU core."""
    import torch

    from vision_kit.models.architectures.yolov7 import YOLOV7 as RefV7

    torch.manual_seed(0)  # see v5 test: unseeded init makes mAP run-dependent
    torch_model = RefV7(variant="base", num_classes=NC, deploy=False)
    jax_model = YOLOV7(variant="base", num_classes=NC, deploy=False)
    variables = _convert(torch_model, jax_model)
    _assert_agreement(*_differential(torch_model, jax_model, variables, 50))
