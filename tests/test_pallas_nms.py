"""Pallas greedy-NMS kernel vs the numpy greedy oracle (interpret mode on
the CPU test backend)."""

import numpy as np

import jax.numpy as jnp

from vision_kit_tpu.ops.pallas_nms import pallas_greedy_keep
from test_nms import np_greedy_nms


def make_sorted(rng, b, k):
    x1y1 = rng.uniform(0, 500, (b, k, 2))
    wh = rng.uniform(10, 150, (b, k, 2))
    boxes = np.concatenate([x1y1, x1y1 + wh], -1).astype(np.float32)
    scores = np.sort(rng.uniform(0, 1, (b, k)).astype(np.float32))[:, ::-1]
    return boxes, np.ascontiguousarray(scores)


def test_pallas_matches_numpy_greedy(rng):
    b, k = 3, 96
    boxes, scores = make_sorted(rng, b, k)
    valid = np.ones((b, k), bool)
    keep = np.asarray(pallas_greedy_keep(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True
    ))
    for i in range(b):
        ref_keep_idx = np_greedy_nms(boxes[i], scores[i], 0.5)
        ref = np.zeros(k, bool)
        ref[ref_keep_idx] = True
        np.testing.assert_array_equal(keep[i], ref)


def test_pallas_invalid_candidates_ignored(rng):
    b, k = 1, 64
    boxes, scores = make_sorted(rng, b, k)
    valid = np.ones((b, k), bool)
    valid[0, 40:] = False
    keep = np.asarray(pallas_greedy_keep(
        jnp.asarray(boxes), jnp.asarray(valid), 0.5, interpret=True
    ))
    assert not keep[0, 40:].any()
    ref_keep_idx = np_greedy_nms(boxes[0, :40], scores[0, :40], 0.5)
    ref = np.zeros(k, bool)
    ref[ref_keep_idx] = True
    np.testing.assert_array_equal(keep[0], ref)
