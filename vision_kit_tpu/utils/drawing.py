"""Drawing detections + sample grids (counterpart of
vision_kit/utils/drawing.py:9-144)."""

from __future__ import annotations

import cv2
import numpy as np

# fixed color wheel (12 hues cycled; the reference ships 120 fixed hex colors)
_BASE = [
    (31, 119, 180), (255, 127, 14), (44, 160, 44), (214, 39, 40),
    (148, 103, 189), (140, 86, 75), (227, 119, 194), (127, 127, 127),
    (188, 189, 34), (23, 190, 207), (255, 152, 150), (197, 176, 213),
]


def class_color(cls_id: int) -> tuple[int, int, int]:
    return _BASE[int(cls_id) % len(_BASE)]


class Drawing:
    def __init__(self, class_labels, line_thickness: int = 2):
        self.class_labels = list(class_labels)
        self.lt = line_thickness

    def draw(self, img: np.ndarray, dets: np.ndarray) -> np.ndarray:
        """img: HWC uint8 (RGB or BGR — caller's space). dets: (n, 6)
        [x1, y1, x2, y2, conf, cls]."""
        out = img.copy()
        for row in dets:
            x1, y1, x2, y2 = map(int, row[:4])
            conf, cls = float(row[4]), int(row[5])
            color = class_color(cls)
            name = (
                self.class_labels[cls]
                if cls < len(self.class_labels)
                else str(cls)
            )
            label = f"{name} {conf:.2f}"
            cv2.rectangle(out, (x1, y1), (x2, y2), color, self.lt)
            (tw, th), _ = cv2.getTextSize(
                label, cv2.FONT_HERSHEY_SIMPLEX, 0.5, 1
            )
            cv2.rectangle(out, (x1, y1 - th - 4), (x1 + tw + 2, y1), color, -1)
            cv2.putText(
                out, label, (x1 + 1, y1 - 3), cv2.FONT_HERSHEY_SIMPLEX, 0.5,
                (255, 255, 255), 1, cv2.LINE_AA,
            )
        return out


def grid_save(images: np.ndarray, targets, path: str, max_images: int = 16):
    """Save a batch sample grid (counterpart of drawing.py:9-47).

    images: (B, H, W, 3) float [0,1] or uint8; targets: (B, M, 5)
    [cls, cxn, cyn, wn, hn] with cls<0 padding.
    """
    import math

    b = min(len(images), max_images)
    cols = int(math.ceil(math.sqrt(b)))
    rows = int(math.ceil(b / cols))
    h, w = images.shape[1:3]
    canvas = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(b):
        img = images[i]
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        # Always copy: ascontiguousarray on an already-contiguous slice is a
        # view, and cv2.rectangle below would deface the caller's batch (the
        # trainer draws the grid BEFORE the batch is evaluated). order="C",
        # not the default "K": arrays converted from jax carry XLA's layout
        # (e.g. channel-major strides), astype/copy preserve it, and
        # OpenCV >= 5 rejects non-C-contiguous destinations.
        img = np.array(img, copy=True, order="C")
        t = np.asarray(targets[i])
        t = t[t[:, 0] >= 0]
        for row in t:
            cx, cy, bw, bh = row[1] * w, row[2] * h, row[3] * w, row[4] * h
            p1 = (int(cx - bw / 2), int(cy - bh / 2))
            p2 = (int(cx + bw / 2), int(cy + bh / 2))
            cv2.rectangle(img, p1, p2, class_color(int(row[0])), 2)
        r, c = divmod(i, cols)
        canvas[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    cv2.imwrite(path, cv2.cvtColor(canvas, cv2.COLOR_RGB2BGR))
    return canvas
