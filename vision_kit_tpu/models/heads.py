"""Anchor-based Detect heads for YOLOv5/YOLOv7 with static-grid decode.

Counterparts of vision_kit/models/heads/yolov5.py and yolov7.py. The decode
grids are compile-time constants (built from static feature shapes with
broadcasted_iota), so the sigmoid-decode fuses into the head conv epilogue
under jit — no lazily cached grid tensors like the reference (:63-64).

Training output: per-level raw maps in the NATIVE conv layout
(B, H, W, na, 5+nc) — no transpose; the loss consumes either layout
(train/losses.py). With decode_order="reference" the maps are transposed to
the reference's anchor-major (B, na, H, W, 5+nc) order so converted-weight
parity tests can compare level-by-level. Eval output:
(decoded (B, sum(na*H*W), 5+nc), raw maps).
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp
from flax import linen as nn

from vision_kit_tpu.models.layers import Implicit

V5_ANCHORS = (
    (10, 13, 16, 30, 33, 23),
    (30, 61, 62, 45, 59, 119),
    (116, 90, 156, 198, 373, 326),
)
V7_ANCHORS = (
    (12, 16, 19, 36, 40, 28),
    (36, 75, 76, 55, 72, 146),
    (142, 110, 192, 243, 459, 401),
)
V7_HEAD_CHS = {"base": (256, 512, 1024), "x": (320, 640, 1280)}


def check_anchor_order(anchors: np.ndarray, strides: Sequence[float]) -> np.ndarray:
    """Flip anchor levels if their mean area order disagrees with stride order
    (reference model_utils.py:72-81). Pure numpy, build-time."""
    a = anchors.prod(-1).mean(-1).reshape(-1)
    da = a[-1] - a[0]
    ds = strides[-1] - strides[0]
    if da != 0 and (np.sign(da) != np.sign(ds)):
        anchors = anchors[::-1].copy()
    return anchors


def normalized_anchors(
    anchors: Sequence[Sequence[float]], strides: Sequence[float]
) -> np.ndarray:
    """(nl, na, 2) anchors in grid units (divided by stride), order-checked."""
    a = np.asarray(anchors, dtype=np.float32).reshape(len(anchors), -1, 2)
    a = a / np.asarray(strides, dtype=np.float32).reshape(-1, 1, 1)
    return check_anchor_order(a, strides)


def _head_bias_init(stride: float, na: int, nc: int):
    """Detection-prior bias (reference model_utils.py:37-43): obj prior
    log(8 / (640/s)^2), cls prior log(0.6 / (nc - 0.99)). The reference adds
    these to torch's small default uniform bias; we initialize to the priors
    directly (the ~1e-2 uniform term is noise against priors of order 1-10)."""

    def init(key, shape, dtype=jnp.float32):
        b = np.zeros((na, shape[0] // na), dtype=np.float32)
        b[:, 4] += float(np.log(8.0 / (640.0 / stride) ** 2))
        if shape[0] // na > 5:
            b[:, 5:] += float(np.log(0.6 / (nc - 0.99)))
        return jnp.asarray(b.reshape(-1), dtype)

    return init


def _make_grid(ny: int, nx: int, offset: float) -> np.ndarray:
    """Static (1, 1, ny, nx, 2) xy grid with the given offset."""
    yv, xv = np.meshgrid(
        np.arange(ny, dtype=np.float32), np.arange(nx, dtype=np.float32),
        indexing="ij",
    )
    return np.stack([xv, yv], axis=-1).reshape(1, 1, ny, nx, 2) + offset


def _decode_level(
    raw: jnp.ndarray,          # (B, na, ny, nx, no) or (B, ny, nx, na, no)
    stride: float,
    anchors_px: np.ndarray,    # (na, 2) pixel units
    v7_style: bool,
    anchor_axis: int,
) -> jnp.ndarray:
    """Sigmoid-decode one level. anchor_axis=1 reproduces the reference's
    anchor-major flattening (torch layout, needed for exact output-order
    parity); anchor_axis=3 decodes the NHWC conv output in place with no
    transpose (faster eval path; NMS results are order-independent up to
    score ties)."""
    y = jax.nn.sigmoid(raw)
    if anchor_axis == 1:
        b, na, ny, nx, no = raw.shape
        grid_shape = (1, 1, ny, nx, 2)
        anc_shape = (1, na, 1, 1, 2)
    else:
        b, ny, nx, na, no = raw.shape
        grid_shape = (1, ny, nx, 1, 2)
        anc_shape = (1, 1, 1, na, 2)
    if v7_style:
        grid = jnp.asarray(_make_grid(ny, nx, 0.0)).reshape(grid_shape)
        xy = (y[..., 0:2] * 2.0 - 0.5 + grid) * stride
    else:
        grid = jnp.asarray(_make_grid(ny, nx, -0.5)).reshape(grid_shape)
        xy = (y[..., 0:2] * 2.0 + grid) * stride
    anchor_grid = jnp.asarray(anchors_px.astype(np.float32)).reshape(anc_shape)
    wh = (y[..., 2:4] * 2.0) ** 2 * anchor_grid
    out = jnp.concatenate([xy, wh, y[..., 4:]], axis=-1)
    return out.reshape(b, na * ny * nx, no)


class YoloV5Head(nn.Module):
    """YOLOv5 Detect (reference heads/yolov5.py:11-91)."""

    num_classes: int = 80
    width: float = 1.0
    anchors: Sequence[Sequence[float]] = V5_ANCHORS
    in_chs: Sequence[int] = (256, 512, 1024)
    stride: Sequence[float] = (8.0, 16.0, 32.0)
    export: bool = False
    decode_order: str = "native"  # "native" (fast) | "reference" (parity)
    dtype: Any = jnp.float32

    @property
    def grid_anchors(self) -> np.ndarray:
        return normalized_anchors(self.anchors, self.stride)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        na = len(self.anchors[0]) // 2
        no = self.num_classes + 5
        anchors_grid = self.grid_anchors                      # (nl, na, 2)
        reference_order = self.decode_order == "reference"

        raws, decoded = [], []
        for i, f in enumerate(feats):
            y = nn.Conv(
                no * na, (1, 1), use_bias=True,
                bias_init=_head_bias_init(self.stride[i], na, self.num_classes),
                dtype=self.dtype,
                name=f"m_{i}",
            )(f)
            b, ny, nx, _ = y.shape
            # NHWC conv emits (B, ny, nx, na*no); channel axis is ordered
            # anchor-major exactly like torch's (na*no, ...) output channels,
            # so this reshape/transpose reproduces the reference layout.
            # Training returns the transposed (reference-order) maps for the
            # loss/parity; eval returns the NATIVE (B, ny, nx, na, no) order
            # so the fused serving postprocess consumes the conv output
            # in-place (the 5-d transpose costs a full layout copy per map).
            raw_native = y.reshape(b, ny, nx, na, no)
            # training maps keep the NATIVE conv layout unless the model is
            # in reference-parity mode: the loss consumes either layout
            # (train/losses.py), and skipping the anchor-major transpose
            # saves a full-map copy per level in forward and backward
            if reference_order:
                raw = raw_native.transpose(0, 3, 1, 2, 4)
            else:
                raw = raw_native
            raws.append(raw)
            if not training:
                anchors_px = anchors_grid[i] * self.stride[i]
                if reference_order:
                    decoded.append(
                        _decode_level(raw, self.stride[i], anchors_px, False,
                                      anchor_axis=1)
                    )
                else:
                    decoded.append(
                        _decode_level(
                            raw_native, self.stride[i],
                            anchors_px, False, anchor_axis=3,
                        )
                    )

        if training:
            return raws
        z = jnp.concatenate(decoded, axis=1)
        return (z,) if self.export else (z, raws)


class YoloV7Head(nn.Module):
    """YOLOv7 Detect with implicit knowledge (reference heads/yolov7.py:11-95).

    deploy=True drops the ia/im Implicit layers (after reparameterization
    folds them into the conv weights/bias; see convert.reparameterize_v7).

    Note: the reference's v7 anchor_grid is cloned from the raw anchors
    *before* check_anchor_order (heads/yolov7.py:47-50); for the default
    anchors no flip occurs so decode uses the raw pixel anchors directly.
    """

    variant: str = "base"
    num_classes: int = 80
    anchors: Sequence[Sequence[float]] = V7_ANCHORS
    stride: Sequence[float] = (8.0, 16.0, 32.0)
    deploy: bool = False
    export: bool = False
    decode_order: str = "native"  # "native" (fast) | "reference" (parity)
    dtype: Any = jnp.float32

    @property
    def grid_anchors(self) -> np.ndarray:
        return normalized_anchors(self.anchors, self.stride)

    @nn.compact
    def __call__(self, feats, training: bool = False):
        na = len(self.anchors[0]) // 2
        no = self.num_classes + 5
        anchors_px = np.asarray(self.anchors, np.float32).reshape(len(self.anchors), na, 2)

        raws, decoded = [], []
        for i, f in enumerate(feats):
            if not self.deploy:
                f = Implicit(f.shape[-1], ops="add", name=f"ia_{i}")(f)
            y = nn.Conv(
                no * na, (1, 1), use_bias=True,
                bias_init=_head_bias_init(self.stride[i], na, self.num_classes),
                dtype=self.dtype,
                name=f"m_{i}",
            )(f)
            if not self.deploy:
                y = Implicit(no * na, ops="multiply", name=f"im_{i}")(y)
            b, ny, nx, _ = y.shape
            raw_native = y.reshape(b, ny, nx, na, no)
            # native layout kept in training too (see YoloV5Head note)
            if self.decode_order == "reference":
                raw = raw_native.transpose(0, 3, 1, 2, 4)
            else:  # native layout: no transpose (fused serving/train paths)
                raw = raw_native
            raws.append(raw)
            if not training:
                if self.decode_order == "reference":
                    decoded.append(
                        _decode_level(raw, self.stride[i], anchors_px[i],
                                      True, anchor_axis=1)
                    )
                else:
                    decoded.append(
                        _decode_level(
                            raw_native, self.stride[i],
                            anchors_px[i], True, anchor_axis=3,
                        )
                    )

        if training:
            return raws
        z = jnp.concatenate(decoded, axis=1)
        return (z,) if self.export else (z, raws)
