"""Host-side augmentations in pure numpy/OpenCV.

Behavioral port of the reference pipeline (vision_kit/data/augmentations.py)
without the albumentations dependency: random affine (rotation/scale/shear/
translation about the origin, exactly the reference matrix composition
:24-59), HSV jitter, flips, and the low-probability pixel augs
(blur/median/gray/CLAHE at p=0.01, :130-134). All randomness flows through an
explicit np.random.Generator so the pipeline is seedable per-sample (the
reference's global `random` calls are not reproducible across workers).

Labels are (n, 5) float32 [x1, y1, x2, y2, cls] in absolute pixels.
"""

from __future__ import annotations

import math

import cv2
import numpy as np

PAD_VALUE = 114


def _rand(rng, value, center=0.0):
    """Uniform in [center-value, center+value] or [v0, v1] for pairs
    (reference get_aug_params :12-21)."""
    if isinstance(value, (int, float)):
        return rng.uniform(center - value, center + value)
    return rng.uniform(value[0], value[1])


def get_affine_matrix(rng, target_size, degrees=10.0, translate=0.1,
                      scales=0.1, shear=10.0):
    """2x3 affine combining rotation+scale about origin, shear, translation
    (reference :24-59)."""
    twidth, theight = target_size
    angle = _rand(rng, degrees)
    scale = _rand(rng, scales, center=1.0)
    if scale <= 0.0:
        raise ValueError("affine scale must be positive")

    R = cv2.getRotationMatrix2D(angle=angle, center=(0, 0), scale=scale)
    M = np.ones((2, 3))
    shear_x = math.tan(_rand(rng, shear) * math.pi / 180)
    shear_y = math.tan(_rand(rng, shear) * math.pi / 180)
    M[0] = R[0] + shear_y * R[1]
    M[1] = R[1] + shear_x * R[0]
    M[0, 2] = _rand(rng, translate) * twidth
    M[1, 2] = _rand(rng, translate) * theight
    return M, scale


def apply_affine_to_bboxes(boxes, target_size, M):
    """Warp all 4 corners, take the axis-aligned hull, clip (reference
    :62-92). boxes: (n, 4) xyxy."""
    n = len(boxes)
    if n == 0:
        return boxes
    tw, th = target_size
    corners = np.ones((4 * n, 3))
    corners[:, :2] = boxes[:, [0, 1, 2, 3, 0, 3, 2, 1]].reshape(4 * n, 2)
    corners = (corners @ M.T).reshape(n, 8)
    xs = corners[:, 0::2]
    ys = corners[:, 1::2]
    out = np.stack(
        [xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1
    )
    out[:, 0::2] = out[:, 0::2].clip(0, tw)
    out[:, 1::2] = out[:, 1::2].clip(0, th)
    return out


def random_affine(rng, img, labels, target_size=(640, 640), degrees=10.0,
                  translate=0.1, scales=0.1, shear=10.0):
    """Affine-warp image to target_size with gray border + label update
    (reference :95-114)."""
    M, _ = get_affine_matrix(rng, target_size, degrees, translate, scales, shear)
    img = cv2.warpAffine(
        img, M, dsize=tuple(target_size),
        borderValue=(PAD_VALUE, PAD_VALUE, PAD_VALUE),
    )
    if len(labels):
        labels = labels.copy()
        labels[:, :4] = apply_affine_to_bboxes(labels[:, :4], target_size, M)
    return img, labels


def augment_hsv(rng, img, h_gain=0.015, s_gain=0.7, v_gain=0.4):
    """HSV jitter on a uint8 RGB image (ultralytics-style LUT)."""
    r = rng.uniform(-1, 1, 3) * [h_gain, s_gain, v_gain] + 1
    hue, sat, val = cv2.split(cv2.cvtColor(img, cv2.COLOR_RGB2HSV))
    x = np.arange(0, 256, dtype=r.dtype)
    lut_hue = ((x * r[0]) % 180).astype(np.uint8)
    lut_sat = np.clip(x * r[1], 0, 255).astype(np.uint8)
    lut_val = np.clip(x * r[2], 0, 255).astype(np.uint8)
    img_hsv = cv2.merge(
        (cv2.LUT(hue, lut_hue), cv2.LUT(sat, lut_sat), cv2.LUT(val, lut_val))
    )
    return cv2.cvtColor(img_hsv, cv2.COLOR_HSV2RGB)


def flip_lr(img, labels):
    img = np.ascontiguousarray(img[:, ::-1])
    if len(labels):
        labels = labels.copy()
        w = img.shape[1]
        x1 = labels[:, 0].copy()
        labels[:, 0] = w - labels[:, 2]
        labels[:, 2] = w - x1
    return img, labels


def flip_ud(img, labels):
    img = np.ascontiguousarray(img[::-1])
    if len(labels):
        labels = labels.copy()
        h = img.shape[0]
        y1 = labels[:, 1].copy()
        labels[:, 1] = h - labels[:, 3]
        labels[:, 3] = h - y1
    return img, labels


def pixel_augs(rng, img):
    """Low-probability pixel-level augs (reference TrainAugPipeline :130-134:
    Blur/MedianBlur/ToGray/CLAHE each at p=0.01)."""
    if rng.random() < 0.01:
        img = cv2.blur(img, (rng.integers(3, 8) | 1,) * 2)
    if rng.random() < 0.01:
        img = cv2.medianBlur(img, int(rng.integers(3, 8)) | 1)
    if rng.random() < 0.01:
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
        img = cv2.cvtColor(gray, cv2.COLOR_GRAY2RGB)
    if rng.random() < 0.01:
        lab = cv2.cvtColor(img, cv2.COLOR_RGB2LAB)
        clahe = cv2.createCLAHE(clipLimit=4.0, tileGridSize=(8, 8))
        lab[..., 0] = clahe.apply(lab[..., 0])
        img = cv2.cvtColor(lab, cv2.COLOR_LAB2RGB)
    return img


def pad_to(img, labels, dst_hw):
    """Pad (no resize) to at least dst_hw with gray, centered — the
    PadIfNeeded step of the reference pipeline (:141-142)."""
    h, w = img.shape[:2]
    ph = max(dst_hw[0] - h, 0)
    pw = max(dst_hw[1] - w, 0)
    if ph == 0 and pw == 0:
        return img, labels
    top, left = ph // 2, pw // 2
    img = cv2.copyMakeBorder(
        img, top, ph - top, left, pw - left, cv2.BORDER_CONSTANT,
        value=(PAD_VALUE,) * 3,
    )
    if len(labels):
        labels = labels.copy()
        labels[:, [0, 2]] += left
        labels[:, [1, 3]] += top
    return img, labels


class TrainAugPipeline:
    """Per-sample train augmentation: pixel augs + HSV + flips + pad
    (reference augmentations.py:117-184, minus albumentations)."""

    def __init__(self, flip_lr_prob=0.5, flip_ud_prob=0.0, hsv_prob=1.0,
                 img_sz=(640, 640)):
        self.flip_lr_prob = flip_lr_prob
        self.flip_ud_prob = flip_ud_prob
        self.hsv_prob = hsv_prob
        self.img_sz = (img_sz, img_sz) if isinstance(img_sz, int) else tuple(img_sz)

    def __call__(self, rng, img, labels):
        img = pixel_augs(rng, img)
        if rng.random() < self.hsv_prob:
            img = augment_hsv(rng, img)
        if rng.random() < self.flip_lr_prob:
            img, labels = flip_lr(img, labels)
        if rng.random() < self.flip_ud_prob:
            img, labels = flip_ud(img, labels)
        return pad_to(img, labels, self.img_sz)


class ValAugPipeline:
    """Validation: letterbox-resize to img_sz only (reference :187-242)."""

    def __init__(self, img_sz=(640, 640)):
        self.img_sz = (img_sz, img_sz) if isinstance(img_sz, int) else tuple(img_sz)

    def __call__(self, rng, img, labels):
        out, labels, _ = self.apply(img, labels)
        return out, labels

    def apply(self, img, labels):
        """Like __call__ but also returns the (ratio, (dw, dh)) actually
        applied, so callers rescale eval coords with the SAME transform
        instead of re-deriving it (they could drift)."""
        from vision_kit_tpu.ops.letterbox import letterbox_np

        out, (ratio, pad) = letterbox_np(img, self.img_sz)
        if len(labels):
            labels = labels.copy()
            labels[:, :4] *= ratio
            labels[:, [0, 2]] += pad[0]
            labels[:, [1, 3]] += pad[1]
        return out, labels, (ratio, pad)
