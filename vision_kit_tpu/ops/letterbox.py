"""Letterbox resize/pad, host (numpy/cv2) and device (XLA) versions.

Mirrors the behavior of the reference's `vision_kit/utils/image_proc.py:12-80`
(`resize` and `scale_coords`): scale by ratio = min(new/old), optional
stride-aligned "auto" rectangles, gray-114 padding split across both sides
with the reference's +/-0.1 rounding convention.

The device path (`letterbox_device`) is the TPU-native addition: given a
static source shape, the resize + pad + normalize runs inside the same jit
program as the network forward, so the demo path has zero host round-trips
between preprocess, forward, and postprocess.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

PAD_VALUE = 114


def letterbox_params(
    src_hw: tuple[int, int],
    dst_hw: tuple[int, int] | int,
    stride: int = 32,
    scaleup: bool = True,
    auto: bool = False,
    letterbox: bool = True,
):
    """Pure-python geometry of the letterbox transform (static, trace-safe).

    Returns (new_unpad_wh, (top, bottom, left, right), ratio, (dw, dh))
    matching the reference resize() semantics (image_proc.py:22-60).
    """
    if isinstance(dst_hw, int):
        dst_hw = (dst_hw, dst_hw)
    h, w = src_hw
    ratio = min(dst_hw[0] / h, dst_hw[1] / w)
    if not scaleup:
        ratio = min(ratio, 1.0)

    new_unpad = (int(round(w * ratio)), int(round(h * ratio)))  # (w, h)
    dw = dst_hw[1] - new_unpad[0]
    dh = dst_hw[0] - new_unpad[1]
    if auto:
        dw %= stride
        dh %= stride

    if letterbox:
        dwf, dhf = dw / 2.0, dh / 2.0
        top, bottom = int(round(dhf - 0.1)), int(round(dhf + 0.1))
        left, right = int(round(dwf - 0.1)), int(round(dwf + 0.1))
        pad = (dwf, dhf)
    else:
        top, bottom, left, right = 0, int(round(dh)), 0, int(round(dw))
        pad = (float(dw), float(dh))

    return new_unpad, (top, bottom, left, right), ratio, pad


def letterbox_np(
    img: np.ndarray,
    dst_hw: tuple[int, int] | int,
    stride: int = 32,
    scaleup: bool = True,
    auto: bool = False,
    letterbox: bool = True,
    color: tuple[int, int, int] = (PAD_VALUE, PAD_VALUE, PAD_VALUE),
):
    """Host letterbox via OpenCV. Returns (img, (ratio, (dw, dh)))."""
    import cv2

    new_unpad, (top, bottom, left, right), ratio, pad = letterbox_params(
        img.shape[:2], dst_hw, stride=stride, scaleup=scaleup, auto=auto,
        letterbox=letterbox,
    )
    if (img.shape[1], img.shape[0]) != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    img = cv2.copyMakeBorder(
        img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=color
    )
    return img, (ratio, pad)


def letterbox_device(
    img: jnp.ndarray,
    dst_hw: tuple[int, int] | int,
    scaleup: bool = True,
    normalize: bool = True,
    dtype=jnp.float32,
):
    """Device-side letterbox: uint8 HWC image -> (H, W, 3) float NHWC-ready.

    The source shape is static under jit (one compile per source resolution,
    cached thereafter), so the resize geometry is compile-time constant and
    XLA lowers this to a single fused resize+pad+scale program.

    Returns (out, (ratio, (dw, dh))) where `out` is dst_hw-shaped, padded with
    114 and scaled to [0, 1] when `normalize`.
    """
    if isinstance(dst_hw, int):
        dst_hw = (dst_hw, dst_hw)
    new_unpad, (top, bottom, left, right), ratio, pad = letterbox_params(
        img.shape[:2], dst_hw, scaleup=scaleup
    )
    x = img.astype(dtype)
    # bilinear matches cv2.INTER_LINEAR up to edge handling; for the demo
    # parity budget (1e-3 IoU) this is within tolerance.
    x = jax.image.resize(x, (new_unpad[1], new_unpad[0], img.shape[2]), "bilinear")
    x = jnp.pad(
        x,
        ((top, bottom), (left, right), (0, 0)),
        constant_values=float(PAD_VALUE),
    )
    if normalize:
        x = x / 255.0
    return x, (ratio, pad)


def scale_coords(
    img1_hw: tuple[int, int],
    coords: jnp.ndarray,
    img0_hw: tuple[int, int],
    ratio_pad=None,
) -> jnp.ndarray:
    """Rescale xyxy coords from letterboxed img1 space back to original img0.

    Functional version of reference image_proc.py:63-80 (which mutates in
    place). Works on jnp or np arrays of shape (..., >=4); only the first
    four columns are transformed, the rest pass through.
    """
    if ratio_pad is None:
        gain = min(img1_hw[0] / img0_hw[0], img1_hw[1] / img0_hw[1])
        pad = (
            (img1_hw[1] - img0_hw[1] * gain) / 2,
            (img1_hw[0] - img0_hw[0] * gain) / 2,
        )
    else:
        gain = ratio_pad[0][0] if isinstance(ratio_pad[0], (tuple, list)) else ratio_pad[0]
        pad = ratio_pad[1]

    xp = jnp if isinstance(coords, jnp.ndarray) else np
    x1 = (coords[..., 0:1] - pad[0]) / gain
    y1 = (coords[..., 1:2] - pad[1]) / gain
    x2 = (coords[..., 2:3] - pad[0]) / gain
    y2 = (coords[..., 3:4] - pad[1]) / gain
    h, w = img0_hw
    box = xp.concatenate(
        [
            xp.clip(x1, 0, w),
            xp.clip(y1, 0, h),
            xp.clip(x2, 0, w),
            xp.clip(y2, 0, h),
        ],
        axis=-1,
    )
    if coords.shape[-1] > 4:
        box = xp.concatenate([box, coords[..., 4:]], axis=-1)
    return box
