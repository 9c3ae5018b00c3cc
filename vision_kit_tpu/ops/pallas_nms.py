"""Pallas TPU kernel for greedy NMS suppression.

The jnp fixed-point formulation in ops/nms.py materializes a (K, K) IoU/
suppression matrix in HBM and re-reads it every iteration — HBM-bandwidth
bound at large batch. This kernel keeps the K candidate boxes in VMEM and
runs the exact greedy scan (score-desc order) as a K-step fori_loop, each
step computing one box-vs-all IoU row on the VPU in VMEM: zero HBM traffic
inside the loop and exact greedy semantics (not a fixed-point formulation).

Grid: one program per image. K (max_cand) up to ~2048 fits VMEM easily.
All row vectors are kept 2D (1, K) per TPU tiling rules.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_kernel(boxes_ref, valid_ref, thres_ref, keep_ref):
    """boxes: (1, K, 4) xyxy score-desc sorted (class offset applied).
    valid: (1, K) int32. keep out: (1, K) int32."""
    k = boxes_ref.shape[1]
    x1 = boxes_ref[0:1, :, 0]   # (1, K)
    y1 = boxes_ref[0:1, :, 1]
    x2 = boxes_ref[0:1, :, 2]
    y2 = boxes_ref[0:1, :, 3]
    area = (x2 - x1) * (y2 - y1)
    thres = thres_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def body(i, state):
        suppressed, keep = state                      # (1, K) int32 each
        not_suppressed = suppressed[0, i] == 0
        is_valid = valid_ref[0, i] == 1
        keep_i = jnp.logical_and(not_suppressed, is_valid)
        keep = keep.at[0, i].set(keep_i.astype(jnp.int32))

        # IoU of box i against all boxes, one VPU row
        xx1 = jnp.maximum(x1[0, i], x1)
        yy1 = jnp.maximum(y1[0, i], y1)
        xx2 = jnp.minimum(x2[0, i], x2)
        yy2 = jnp.minimum(y2[0, i], y2)
        inter = jnp.maximum(xx2 - xx1, 0.0) * jnp.maximum(yy2 - yy1, 0.0)
        iou = inter / jnp.maximum(area[0, i] + area - inter, 1e-9)

        row_suppress = jnp.logical_and(
            jnp.logical_and(iou > thres, col > i), keep_i
        )
        suppressed = jnp.maximum(suppressed, row_suppress.astype(jnp.int32))
        return suppressed, keep

    zeros = jnp.zeros((1, k), jnp.int32)
    _, keep = jax.lax.fori_loop(0, k, body, (zeros, zeros))
    keep_ref[0:1, :] = keep


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_greedy_keep(
    boxes: jnp.ndarray,     # (B, K, 4) xyxy, score-desc sorted
    valid: jnp.ndarray,     # (B, K) bool
    iou_thres,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched exact-greedy keep-mask. Returns (B, K) bool."""
    b, k, _ = boxes.shape
    thres = jnp.full((1,), iou_thres, jnp.float32)

    keep = pl.pallas_call(
        _nms_kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k, 4), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, k), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32), thres)
    return keep.astype(bool)
