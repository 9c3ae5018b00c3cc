"""Box conversion and IoU tests: hand-computed cases + golden parity with the
reference's torch implementations (vision_kit/utils/bboxes.py)."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_kit_tpu.ops import boxes as B


def rand_xyxy(rng, n):
    x1y1 = rng.uniform(0, 300, size=(n, 2))
    wh = rng.uniform(1, 200, size=(n, 2))
    return np.concatenate([x1y1, x1y1 + wh], axis=-1).astype(np.float32)


def test_conversion_roundtrip(rng):
    b = rand_xyxy(rng, 64)
    out = B.cxcywh_to_xyxy(B.xyxy_to_cxcywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-4)
    out = B.xywh_to_xyxy(B.xyxy_to_xywh(jnp.asarray(b)))
    np.testing.assert_allclose(np.asarray(out), b, rtol=1e-5, atol=1e-4)


def test_xywhn_roundtrip(rng):
    b = rand_xyxy(rng, 32)
    n = B.xyxy_to_xywhn(jnp.asarray(b), w=640, h=480)
    back = B.xywhn_to_xyxy(n, w=640, h=480)
    np.testing.assert_allclose(np.asarray(back), b, rtol=1e-4, atol=1e-3)


def test_iou_hand_values():
    a = jnp.array([[0.0, 0.0, 10.0, 10.0]])
    b = jnp.array([[5.0, 5.0, 15.0, 15.0]])
    iou = B.box_iou_pairwise(a, b)
    # inter 25, union 175
    np.testing.assert_allclose(np.asarray(iou), [[25.0 / 175.0]], rtol=1e-5)

    same = B.box_iou_aligned(a, a)
    np.testing.assert_allclose(np.asarray(same), [1.0], rtol=1e-5)

    disjoint = B.box_iou_pairwise(a, jnp.array([[20.0, 20.0, 30.0, 30.0]]))
    np.testing.assert_allclose(np.asarray(disjoint), [[0.0]], atol=1e-7)


def test_clip_boxes():
    b = jnp.array([[-5.0, -5.0, 700.0, 500.0]])
    c = B.clip_boxes(b, (480, 640))
    np.testing.assert_allclose(np.asarray(c), [[0.0, 0.0, 640.0, 480.0]])


# pairwise ciou parity is not testable: the reference's pairwise ciou path
# crashes on rows != cols (bboxes.py:261-271 misses the broadcast dims)
@pytest.mark.parametrize("mode", ["iou", "giou"])
def test_iou_parity_with_reference(reference, rng, mode):
    import torch
    from vision_kit.utils.bboxes import bbox_overlaps

    b1 = rand_xyxy(rng, 50)
    b2 = rand_xyxy(rng, 70)
    ref = bbox_overlaps(torch.from_numpy(b1), torch.from_numpy(b2), mode=mode)
    got = B.box_iou_pairwise(jnp.asarray(b1), jnp.asarray(b2), mode=mode)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("mode", ["iou", "ciou"])
def test_iou_aligned_parity_with_reference(reference, rng, mode):
    import torch
    from vision_kit.utils.bboxes import bbox_overlaps

    b1 = rand_xyxy(rng, 64)
    b2 = rand_xyxy(rng, 64)
    ref = bbox_overlaps(
        torch.from_numpy(b1), torch.from_numpy(b2), mode=mode, is_aligned=True
    )
    got = B.box_iou_aligned(jnp.asarray(b1), jnp.asarray(b2), mode=mode)
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)


def test_ciou_cxcywh_format(reference, rng):
    import torch
    from vision_kit.utils.bboxes import bbox_overlaps

    cxcywh = rng.uniform(5, 100, size=(32, 4)).astype(np.float32)
    ref = bbox_overlaps(
        torch.from_numpy(cxcywh), torch.from_numpy(cxcywh.copy()),
        mode="ciou", is_aligned=True, box_format="cxcywh",
    )
    got = B.box_iou_aligned(
        jnp.asarray(cxcywh), jnp.asarray(cxcywh), mode="ciou",
        box_format="cxcywh",
    )
    np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-4, atol=1e-4)
