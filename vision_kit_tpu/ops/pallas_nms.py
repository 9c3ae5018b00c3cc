"""Pallas TPU kernel for greedy NMS suppression.

The jnp fixed-point formulation in ops/nms.py materializes a (K, K) IoU/
suppression matrix in HBM and re-reads it every iteration — HBM-bandwidth
bound at large batch. This kernel keeps the K candidate boxes in VMEM and
runs the exact greedy scan (score-desc order) as a K-step fori_loop, each
step computing one box-vs-all IoU row on the VPU: zero HBM traffic inside
the loop and exact greedy semantics.

Mosaic lowering constraints shape the implementation:
  * no dynamic indexing of loop-carried values -> scalars are extracted with
    masked reductions (one K-wide VPU op each) instead of `vec[i]`;
  * all row vectors are (1, K) 2-D;
  * the (B, K) masks are carried as (B, 1, K) so each block's trailing two
    dims equal the array dims (the (8, 128) tiling rule).

Grid: one program per image. K (max_cand) up to ~2048 fits VMEM easily.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9


def _nms_kernel(boxes_ref, valid_ref, thres_ref, keep_ref):
    """boxes: (1, K, 4) xyxy score-desc sorted (class offset applied).
    valid: (1, 1, K) int32. keep out: (1, 1, K) int32."""
    k = boxes_ref.shape[1]
    x1 = boxes_ref[0, :, 0].reshape(1, k)
    y1 = boxes_ref[0, :, 1].reshape(1, k)
    x2 = boxes_ref[0, :, 2].reshape(1, k)
    y2 = boxes_ref[0, :, 3].reshape(1, k)
    area = (x2 - x1) * (y2 - y1)
    valid = valid_ref[0, 0:1, :]                       # (1, K) int32
    thres = thres_ref[0]

    col = jax.lax.broadcasted_iota(jnp.int32, (1, k), 1)

    def extract(vec, mask):
        """Scalar vec[i] as a masked max-reduction (no dynamic indexing)."""
        return jnp.max(jnp.where(mask, vec, NEG))

    def body(i, state):
        suppressed, keep = state                       # (1, K) int32 each
        mask_i = col == i
        supp_i = jnp.max(jnp.where(mask_i, suppressed, 0))
        valid_i = jnp.max(jnp.where(mask_i, valid, 0))
        keep_i = jnp.logical_and(supp_i == 0, valid_i == 1)
        keep = jnp.where(
            jnp.logical_and(mask_i, keep_i), 1, keep
        )

        xi1 = extract(x1, mask_i)
        yi1 = extract(y1, mask_i)
        xi2 = extract(x2, mask_i)
        yi2 = extract(y2, mask_i)
        area_i = (xi2 - xi1) * (yi2 - yi1)

        inter = jnp.maximum(jnp.minimum(xi2, x2) - jnp.maximum(xi1, x1), 0.0) \
            * jnp.maximum(jnp.minimum(yi2, y2) - jnp.maximum(yi1, y1), 0.0)
        iou = inter / jnp.maximum(area_i + area - inter, 1e-9)

        row_suppress = jnp.logical_and(
            jnp.logical_and(iou > thres, col > i), keep_i
        )
        suppressed = jnp.maximum(suppressed, row_suppress.astype(jnp.int32))
        return suppressed, keep

    zeros = jnp.zeros((1, k), jnp.int32)
    _, keep = jax.lax.fori_loop(0, k, body, (zeros, zeros))
    keep_ref[0, 0:1, :] = keep


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
            pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, k), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, 1, k), jnp.int32),
        interpret=interpret,
    )(boxes, valid.astype(jnp.int32).reshape(b, 1, k), thres)
    return keep.reshape(b, k).astype(bool)
