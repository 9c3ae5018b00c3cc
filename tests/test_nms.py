"""Fixed-shape NMS vs an independent numpy greedy reference."""

import numpy as np

import jax.numpy as jnp

from vision_kit_tpu.ops.nms import MAX_WH, batched_nms, postprocess


def np_greedy_nms(boxes, scores, iou_thres):
    """Straightforward O(n^2) greedy NMS in numpy (test oracle)."""
    order = np.argsort(-scores)
    keep = []
    suppressed = np.zeros(len(boxes), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        x1 = np.maximum(boxes[i, 0], boxes[:, 0])
        y1 = np.maximum(boxes[i, 1], boxes[:, 1])
        x2 = np.minimum(boxes[i, 2], boxes[:, 2])
        y2 = np.minimum(boxes[i, 3], boxes[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        area_i = (boxes[i, 2] - boxes[i, 0]) * (boxes[i, 3] - boxes[i, 1])
        area = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
        iou = inter / np.maximum(area_i + area - inter, 1e-6)
        suppressed |= iou > iou_thres
    return np.array(keep, dtype=np.int64)


def make_cands(rng, n, nc=4):
    x1y1 = rng.uniform(0, 500, size=(n, 2))
    wh = rng.uniform(10, 150, size=(n, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], axis=-1).astype(np.float32)
    scores = rng.uniform(0.01, 1.0, size=n).astype(np.float32)
    cls = rng.integers(0, nc, size=n)
    return boxes, scores, cls


def test_batched_nms_matches_numpy_greedy(rng):
    boxes, scores, cls = make_cands(rng, 200)
    dets, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.5, max_det=100,
    )
    dets, valid = np.asarray(dets), np.asarray(valid)

    off_boxes = boxes + cls[:, None].astype(np.float32) * MAX_WH
    ref_keep = np_greedy_nms(off_boxes, scores, 0.5)[:100]
    got = dets[valid]
    assert len(got) == len(ref_keep)
    # same boxes kept, in score order
    ref_sorted = off_boxes[ref_keep][np.argsort(-scores[ref_keep])]
    got_off = got[:, :4] + got[:, 5:6] * MAX_WH
    np.testing.assert_allclose(got_off, ref_sorted, rtol=1e-4, atol=1e-2)


def test_merge_nms_matches_numpy_oracle(rng):
    """merge=True must reproduce the reference's weighted-mean merge
    (image_proc.py:172-180): kept boxes become the score-weighted mean of
    all over-threshold overlaps; kept boxes with no other overlap drop
    (redundant)."""
    boxes, scores, cls = make_cands(rng, 120)
    iou_t = 0.5
    off = boxes + cls[:, None].astype(np.float32) * MAX_WH

    # numpy oracle in score-desc candidate order (the device path sorts)
    order = np.argsort(-scores)
    b_s, s_s, c_s = off[order], scores[order], cls[order]
    raw_s = boxes[order]
    keep = np_greedy_nms(b_s, s_s, iou_t)
    # pairwise IoU of offset boxes
    n = len(b_s)
    ious = np.zeros((n, n), np.float32)
    for i in range(n):
        x1 = np.maximum(b_s[i, 0], b_s[:, 0])
        y1 = np.maximum(b_s[i, 1], b_s[:, 1])
        x2 = np.minimum(b_s[i, 2], b_s[:, 2])
        y2 = np.minimum(b_s[i, 3], b_s[:, 3])
        inter = np.clip(x2 - x1, 0, None) * np.clip(y2 - y1, 0, None)
        ai = (b_s[i, 2] - b_s[i, 0]) * (b_s[i, 3] - b_s[i, 1])
        a = (b_s[:, 2] - b_s[:, 0]) * (b_s[:, 3] - b_s[:, 1])
        ious[i] = inter / np.maximum(ai + a - inter, 1e-6)
    exp = {}
    for i in keep:
        overlap = ious[i] > iou_t
        w = overlap * s_s
        merged = (w @ raw_s) / w.sum()
        if overlap.sum() > 1:  # redundant filter
            exp[tuple(np.round(merged, 3))] = s_s[i]

    dets, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=iou_t, max_det=120, merge=True,
    )
    got = np.asarray(dets)[np.asarray(valid)]
    assert len(got) == len(exp)
    got_keys = {tuple(np.round(g[:4], 3)) for g in got}
    assert got_keys == set(exp.keys())


def test_postprocess_merge_smoke(rng):
    """merge=True through the batched postprocess: valid detections, boxes
    finite, and a no-overlap candidate set keeps redundant-filtered empties
    consistent (every kept box overlaps only itself -> all dropped)."""
    n = 64
    preds = np.zeros((2, n, 9), np.float32)
    # widely separated boxes, same class: zero overlaps
    preds[..., 0] = np.arange(n)[None, :] * 400 + 100
    preds[..., 1] = 100
    preds[..., 2:4] = 50
    preds[..., 4] = 0.9
    preds[..., 5] = 0.9
    dets, valid = postprocess(
        jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45, max_det=32,
        merge=True,
    )
    assert not bool(np.asarray(valid).any())  # redundancy filter drops all
    # overlapping pair: merge keeps one, box becomes the weighted mean
    preds2 = np.zeros((1, 8, 9), np.float32)
    preds2[0, :2, 0] = (100, 104)
    preds2[0, :2, 1] = 100
    preds2[0, :2, 2:4] = 50
    preds2[0, :2, 4] = (0.9, 0.6)
    preds2[0, :2, 5] = 1.0
    dets2, valid2 = postprocess(
        jnp.asarray(preds2), conf_thres=0.25, iou_thres=0.45, max_det=8,
        merge=True,
    )
    got = np.asarray(dets2)[np.asarray(valid2)]
    assert len(got) == 1
    s = np.array([0.9, 0.6])
    cx = (100 * 0.9 + 104 * 0.6) / s.sum()
    np.testing.assert_allclose(got[0, 0], cx - 25, rtol=1e-4)


def test_batched_nms_agnostic(rng):
    boxes, scores, cls = make_cands(rng, 150)
    dets, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.45, max_det=50, agnostic=True,
    )
    ref_keep = np_greedy_nms(boxes, scores, 0.45)[:50]
    assert int(np.asarray(valid).sum()) == len(ref_keep)


def test_postprocess_shapes_and_gate(rng):
    b, n, nc = 2, 400, 7
    preds = np.zeros((b, n, 5 + nc), dtype=np.float32)
    preds[..., 0] = rng.uniform(50, 600, size=(b, n))  # cx
    preds[..., 1] = rng.uniform(50, 600, size=(b, n))  # cy
    preds[..., 2] = rng.uniform(10, 100, size=(b, n))  # w
    preds[..., 3] = rng.uniform(10, 100, size=(b, n))  # h
    preds[..., 4] = rng.uniform(0, 1, size=(b, n))     # obj
    preds[..., 5:] = rng.uniform(0, 1, size=(b, n, nc))

    dets, valid = postprocess(
        jnp.asarray(preds), conf_thres=0.25, iou_thres=0.45,
        max_det=30, max_cand=256,
    )
    assert dets.shape == (b, 30, 6)
    assert valid.shape == (b, 30)
    dets, valid = np.asarray(dets), np.asarray(valid)
    # all valid rows satisfy the conf gate
    assert (dets[valid][:, 4] > 0.25).all()
    # class ids in range
    assert (dets[valid][:, 5] >= 0).all() and (dets[valid][:, 5] < nc).all()


def test_postprocess_none_pass_gate():
    preds = np.zeros((1, 50, 10), dtype=np.float32)
    preds[..., 4] = 0.01  # low obj
    preds[..., 5:] = 0.5
    dets, valid = postprocess(jnp.asarray(preds), conf_thres=0.5, max_cand=64)
    assert int(np.asarray(valid).sum()) == 0


def test_postprocess_multilabel_expands(rng):
    preds = np.zeros((1, 10, 9), dtype=np.float32)  # nc=4
    preds[..., 0] = 100; preds[..., 1] = 100
    preds[..., 2] = 50; preds[..., 3] = 50
    preds[0, 0, 4] = 1.0
    preds[0, 0, 5:] = [0.9, 0.8, 0.1, 0.1]
    # multi_label keeps both classes above threshold for the same box
    dets, valid = postprocess(
        jnp.asarray(preds), conf_thres=0.3, multi_label=True, max_cand=64,
        max_det=10,
    )
    assert int(np.asarray(valid).sum()) == 2
    # best-class-only keeps one
    dets, valid = postprocess(
        jnp.asarray(preds), conf_thres=0.3, multi_label=False, max_cand=64,
        max_det=10,
    )
    assert int(np.asarray(valid).sum()) == 1


def test_postprocess_raw_matches_decoded_path():
    """The fused raw-head postprocess (candidate selection before decode)
    must reproduce the decoded-path results exactly (single-label, exact
    top-k). Uses synthetic well-spread logits: an untrained model's scores
    are all tied at the bias prior, which only exercises tie-ordering."""
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.ops.nms import postprocess, postprocess_raw

    rng = np.random.default_rng(0)
    nc, na, no = 12, 3, 17
    strides = (8.0, 16.0, 32.0)
    anchors_px = np.abs(rng.normal(30, 10, (3, na, 2))).astype(np.float32)
    raws, decoded_levels = [], []
    for li, (ny, nx) in enumerate(((16, 16), (8, 8), (4, 4))):
        raw = rng.normal(0, 1.5, (2, na, ny, nx, no)).astype(np.float32)
        raws.append(jnp.asarray(raw))
        # manual reference decode in the head's NATIVE flatten order
        # (b, ny, nx, na, no)
        r = raw.transpose(0, 2, 3, 1, 4)
        s = 1 / (1 + np.exp(-r))
        ix = np.arange(nx, dtype=np.float32).reshape(1, 1, nx, 1)
        iy = np.arange(ny, dtype=np.float32).reshape(1, ny, 1, 1)
        cx = (s[..., 0] * 2 - 0.5 + ix) * strides[li]
        cy = (s[..., 1] * 2 - 0.5 + iy) * strides[li]
        anc = anchors_px[li].reshape(1, 1, 1, na, 2)
        w = (s[..., 2] * 2) ** 2 * anc[..., 0]
        h = (s[..., 3] * 2) ** 2 * anc[..., 1]
        lvl = np.concatenate(
            [np.stack([cx, cy, w, h], -1), s[..., 4:]], axis=-1)
        decoded_levels.append(lvl.reshape(2, ny * nx * na, no))
    decoded = jnp.asarray(np.concatenate(decoded_levels, axis=1))

    d1, v1 = postprocess(decoded, conf_thres=0.1, iou_thres=0.5,
                         max_det=50, max_cand=256)
    d2, v2 = postprocess_raw(
        raws, anchors_px, strides=strides, conf_thres=0.1, iou_thres=0.5,
        max_det=50, max_cand=256, approx_topk=False, anchor_major=True,
    )
    # native layout: same maps transposed, same results
    raws_native = [jnp.transpose(r, (0, 2, 3, 1, 4)) for r in raws]
    d3, v3 = postprocess_raw(
        raws_native, anchors_px, strides=strides, conf_thres=0.1,
        iou_thres=0.5, max_det=50, max_cand=256, approx_topk=False,
    )
    np.testing.assert_array_equal(np.asarray(v2), np.asarray(v3))
    np.testing.assert_allclose(np.asarray(d2)[np.asarray(v2)],
                               np.asarray(d3)[np.asarray(v3)], atol=1e-4)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1)[np.asarray(v1)],
                               np.asarray(d2)[np.asarray(v2)],
                               rtol=1e-5, atol=1e-3)


def test_multi_label_top_matches_full():
    """Per-anchor top-L multi-label truncation must match the full N*nc
    expansion when no anchor has more than L contributing classes."""
    from vision_kit_tpu.ops.nms import postprocess

    rng = np.random.default_rng(3)
    n, nc = 400, 12
    preds = np.zeros((2, n, 5 + nc), np.float32)
    preds[..., 0] = rng.uniform(50, 600, (2, n))
    preds[..., 1] = rng.uniform(50, 600, (2, n))
    preds[..., 2:4] = rng.uniform(10, 80, (2, n, 2))
    preds[..., 4] = rng.uniform(0, 1, (2, n))
    # sparse class confs: ~3 classes above threshold per anchor
    cls = rng.uniform(0, 0.01, (2, n, nc))
    hot = rng.integers(0, nc, (2, n, 3))
    np.put_along_axis(cls, hot, rng.uniform(0.3, 1.0, (2, n, 3)), axis=-1)
    preds[..., 5:] = cls
    p = jnp.asarray(preds)

    d1, v1 = postprocess(p, conf_thres=0.01, iou_thres=0.5, multi_label=True,
                         max_det=100, max_cand=512)
    d2, v2 = postprocess(p, conf_thres=0.01, iou_thres=0.5, multi_label=True,
                         max_det=100, max_cand=512, multi_label_top=8)
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_allclose(np.asarray(d1)[np.asarray(v1)],
                               np.asarray(d2)[np.asarray(v2)], atol=1e-5)


def test_multi_label_top_small_anchor_count():
    """max_cand larger than n*L must not crash (regression: top_k k > size)."""
    from vision_kit_tpu.ops.nms import postprocess

    rng = np.random.default_rng(0)
    preds = jnp.asarray(
        rng.uniform(0, 1, (1, 60, 85)).astype(np.float32) * 100
    )
    d, v = postprocess(preds, conf_thres=0.001, iou_thres=0.6,
                       multi_label=True, max_det=300, max_cand=2048,
                       multi_label_top=20)
    assert d.shape[1] <= 300 and v.shape == d.shape[:2]


def test_merge_nms_single_candidate_kept():
    """A single over-threshold candidate must survive merge=True (the
    reference only runs the merge/redundant block for 1 < n < 3e3,
    image_proc.py:172 — n == 1 keeps its detection as-is)."""
    boxes = np.array([[10.0, 10.0, 50.0, 60.0]], np.float32)
    scores = np.array([0.9], np.float32)
    cls = np.array([2])
    dets, valid = batched_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cls),
        iou_thres=0.5, max_det=1, merge=True,
    )
    dets, valid = np.asarray(dets), np.asarray(valid)
    assert valid.sum() == 1
    np.testing.assert_allclose(dets[0, :4], boxes[0], atol=1e-4)
    assert dets[0, 5] == 2


def test_merge_nms_single_candidate_through_postprocess():
    """Same n==1 behavior through the batched postprocess path: one anchor
    above conf keeps its detection under merge=True."""
    nc = 4
    preds = np.zeros((1, 32, 5 + nc), np.float32)
    preds[0, :, :4] = [100, 100, 40, 40]  # cxcywh
    preds[0, 0, 4] = 0.9                  # one anchor above conf
    preds[0, 0, 5] = 0.9
    d, v = postprocess(jnp.asarray(preds), conf_thres=0.25, iou_thres=0.5,
                       max_det=10, max_cand=32, merge=True)
    assert np.asarray(v)[0].sum() == 1


def test_postprocess_matches_reference_nms(reference, rng):
    """Detection-level randomized differential: the SAME decoded prediction
    tensor through repo `postprocess` and through the reference torch `nms`
    (image_proc.py:83-187) must produce identical keep sets (boxes, scores,
    classes) — a stricter gate than the mAP-level full-pipeline differential.

    Scores are continuous random floats (ties have measure zero) and the
    per-image over-threshold candidate count is kept well under max_cand so
    the repo's fixed-shape top-k is exact. Reference nms is called per image
    (its wall-clock budget, image_proc.py:109,183-185, must not truncate
    under CPU contention)."""
    import torch

    B, N, NC = 4, 500, 5
    CONF, IOU = 0.3, 0.6
    cxcy = rng.uniform(0, 640, (B, N, 2))
    wh = rng.uniform(4, 160, (B, N, 2))
    obj = rng.uniform(0, 1, (B, N, 1)) ** 2        # skew low: ~500 cands/img
    cls = rng.uniform(0, 1, (B, N, NC))
    preds = np.concatenate([cxcy, wh, obj, cls], axis=-1).astype(np.float32)

    dets, valid = postprocess(
        jnp.asarray(preds), conf_thres=CONF, iou_thres=IOU,
        multi_label=True, max_det=300, max_cand=1024,
    )
    dets, valid = np.asarray(dets), np.asarray(valid)

    from vision_kit.utils.image_proc import nms as ref_nms

    for b in range(B):
        ref = ref_nms(
            torch.from_numpy(preds[b:b + 1]), CONF, IOU, multi_label=True
        )[0].numpy()
        got = dets[b][valid[b]]
        # enough candidates that the comparison is meaningful
        assert len(ref) > 20
        assert len(got) == len(ref)
        order_ref = np.argsort(-ref[:, 4], kind="stable")
        order_got = np.argsort(-got[:, 4], kind="stable")
        np.testing.assert_allclose(
            got[order_got, 4], ref[order_ref, 4], rtol=1e-5, atol=1e-6
        )
        np.testing.assert_allclose(
            got[order_got, :4], ref[order_ref, :4], rtol=1e-4, atol=1e-3
        )
        np.testing.assert_array_equal(
            got[order_got, 5].astype(int), ref[order_ref, 5].astype(int)
        )
