"""Box geometry ops: conversions and IoU families, pure jnp and fixed-shape.

TPU-native counterpart of the reference's `vision_kit/utils/bboxes.py`
(conversions at bboxes.py:62-137, IoU families at bboxes.py:150-289). All
functions are functional (no in-place mutation), broadcast over leading batch
dims, and compile to fused VPU code under jit. They are also the building
blocks for the fixed-shape NMS and the CIoU training loss.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

EPS = 1e-6


# ---------------------------------------------------------------------------
# Conversions. Boxes live in the last axis with size 4.
# ---------------------------------------------------------------------------

def cxcywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(cx, cy, w, h) -> (x1, y1, x2, y2)."""
    cx, cy, w, h = jnp.split(b, 4, axis=-1)
    hw, hh = w * 0.5, h * 0.5
    return jnp.concatenate([cx - hw, cy - hh, cx + hw, cy + hh], axis=-1)


def xyxy_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate(
        [(x1 + x2) * 0.5, (y1 + y2) * 0.5, x2 - x1, y2 - y1], axis=-1
    )


def xywh_to_xyxy(b: jnp.ndarray) -> jnp.ndarray:
    """(x_min, y_min, w, h) -> (x1, y1, x2, y2)."""
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def xyxy_to_xywh(b: jnp.ndarray) -> jnp.ndarray:
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_cxcywh(b: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([x + w * 0.5, y + h * 0.5, w, h], axis=-1)


def xywhn_to_xyxy(b: jnp.ndarray, w: float = 640, h: float = 640,
                  padw: float = 0, padh: float = 0) -> jnp.ndarray:
    """Normalized (cx, cy, w, h) -> absolute (x1, y1, x2, y2) with padding."""
    cx, cy, bw, bh = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([
        w * (cx - bw * 0.5) + padw,
        h * (cy - bh * 0.5) + padh,
        w * (cx + bw * 0.5) + padw,
        h * (cy + bh * 0.5) + padh,
    ], axis=-1)


def xyxy_to_xywhn(b: jnp.ndarray, w: float = 640, h: float = 640) -> jnp.ndarray:
    """Absolute (x1, y1, x2, y2) -> normalized (cx, cy, w, h)."""
    x1, y1, x2, y2 = jnp.split(b, 4, axis=-1)
    return jnp.concatenate([
        (x1 + x2) * 0.5 / w,
        (y1 + y2) * 0.5 / h,
        (x2 - x1) / w,
        (y2 - y1) / h,
    ], axis=-1)


def clip_boxes(b: jnp.ndarray, shape: tuple[int, int]) -> jnp.ndarray:
    """Clip xyxy boxes to image (height, width)."""
    h, w = shape
    x1 = jnp.clip(b[..., 0:1], 0, w)
    y1 = jnp.clip(b[..., 1:2], 0, h)
    x2 = jnp.clip(b[..., 2:3], 0, w)
    y2 = jnp.clip(b[..., 3:4], 0, h)
    return jnp.concatenate([x1, y1, x2, y2], axis=-1)


def box_area(b: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes; shape (..., 4) -> (...)."""
    return (b[..., 2] - b[..., 0]) * (b[..., 3] - b[..., 1])


# ---------------------------------------------------------------------------
# IoU. `mode` in {iou, iof, giou, diou, ciou}. `box_format` in
# {xyxy, xywh, cxcywh}. Matches reference bbox_overlaps semantics
# (bboxes.py:150-289) with all-array math (no data-dependent branches).
# ---------------------------------------------------------------------------

def _to_xyxy(b: jnp.ndarray, box_format: str) -> jnp.ndarray:
    if box_format == "xyxy":
        return b
    if box_format == "xywh":
        return xywh_to_xyxy(b)
    if box_format == "cxcywh":
        return cxcywh_to_xyxy(b)
    raise ValueError(f"Unsupported box format {box_format}")


def _iou_core(b1: jnp.ndarray, b2: jnp.ndarray, mode: str, eps: float) -> jnp.ndarray:
    """Elementwise IoU over broadcast-aligned xyxy boxes (..., 4) -> (...)."""
    lt = jnp.maximum(b1[..., :2], b2[..., :2])
    rb = jnp.minimum(b1[..., 2:], b2[..., 2:])
    wh = jnp.clip(rb - lt, 0, None)
    overlap = wh[..., 0] * wh[..., 1]

    area1 = box_area(b1)
    area2 = box_area(b2)
    if mode == "iof":
        union = area1 + eps
    else:
        union = area1 + area2 - overlap
    union = jnp.maximum(union, eps)
    ious = overlap / union
    if mode in ("iou", "iof"):
        return ious

    enclosed_lt = jnp.minimum(b1[..., :2], b2[..., :2])
    enclosed_rb = jnp.maximum(b1[..., 2:], b2[..., 2:])
    enclose_wh = jnp.clip(enclosed_rb - enclosed_lt, 0, None)

    if mode == "giou":
        enclose_area = jnp.maximum(enclose_wh[..., 0] * enclose_wh[..., 1], eps)
        return ious - (enclose_area - union) / enclose_area

    # diou / ciou
    c2 = enclose_wh[..., 0] ** 2 + enclose_wh[..., 1] ** 2 + eps
    rho2 = (
        ((b2[..., 0] + b2[..., 2]) - (b1[..., 0] + b1[..., 2])) ** 2
        + ((b2[..., 1] + b2[..., 3]) - (b1[..., 1] + b1[..., 3])) ** 2
    ) / 4.0
    if mode == "diou":
        return ious - rho2 / c2

    # ciou: aspect-ratio consistency term. The height +eps mirrors the
    # reference (bboxes.py:266-267) for numerical identity on degenerate boxes.
    w1 = b1[..., 2] - b1[..., 0]
    h1 = b1[..., 3] - b1[..., 1] + eps
    w2 = b2[..., 2] - b2[..., 0]
    h2 = b2[..., 3] - b2[..., 1] + eps
    factor = 4.0 / math.pi ** 2
    v = factor * (jnp.arctan(w2 / (h2 + eps)) - jnp.arctan(w1 / (h1 + eps))) ** 2
    alpha = jax.lax.stop_gradient(v / (v - ious + (1.0 + eps)))
    return ious - (rho2 / c2 + v * alpha)


def box_iou_aligned(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    box_format: str = "xyxy",
    mode: str = "iou",
    eps: float = EPS,
) -> jnp.ndarray:
    """IoU between aligned pairs: (..., N, 4) x (..., N, 4) -> (..., N)."""
    b1 = _to_xyxy(boxes1, box_format)
    b2 = _to_xyxy(boxes2, box_format)
    return _iou_core(b1, b2, mode, eps)


def box_iou_pairwise(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    box_format: str = "xyxy",
    mode: str = "iou",
    eps: float = EPS,
) -> jnp.ndarray:
    """IoU between all pairs: (..., N, 4) x (..., M, 4) -> (..., N, M)."""
    b1 = _to_xyxy(boxes1, box_format)[..., :, None, :]
    b2 = _to_xyxy(boxes2, box_format)[..., None, :, :]
    return _iou_core(b1, b2, mode, eps)
