"""Loss parity: fixed-shape YoloLoss vs the reference's ragged YoloLoss on
identical random predictions/targets, plus standalone invariants."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models.heads import V5_ANCHORS, normalized_anchors
from vision_kit_tpu.train.losses import YoloLoss, bce_with_logits, smooth_bce

HYP = {
    "box": 0.05, "obj": 1.0, "cls": 0.5,
    "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0,
}
NC = 7
STRIDES = (8.0, 16.0, 32.0)
IMG = 160  # grids 20/10/5


def make_preds(rng, b):
    shapes = [(b, 3, IMG // int(s), IMG // int(s), NC + 5) for s in STRIDES]
    return [rng.normal(0, 1, size=s).astype(np.float32) for s in shapes]


def make_targets(rng, b, n_per_img):
    """Well-separated targets (avoids same-cell collisions where the
    reference's last-write-wins vs our scatter-max legitimately differ)."""
    rows = []
    for bi in range(b):
        for ni in range(n_per_img):
            cx = (0.13 + 0.17 * ni) % 0.9 + 0.05
            cy = (0.11 + 0.23 * ni + 0.31 * bi) % 0.9 + 0.05
            w = rng.uniform(0.05, 0.3)
            h = rng.uniform(0.05, 0.3)
            cls = rng.integers(0, NC)
            rows.append([bi, cls, cx, cy, w, h])
    return np.asarray(rows, dtype=np.float32)


def to_padded(targets_rows, b, m):
    out = np.full((b, m, 5), -1, dtype=np.float32)
    counts = [0] * b
    for row in targets_rows:
        bi = int(row[0])
        out[bi, counts[bi]] = row[1:]
        counts[bi] += 1
    return out


def test_bce_matches_torch():
    import torch

    logits = np.linspace(-4, 4, 31).astype(np.float32)
    targets = (np.sin(logits) * 0.5 + 0.5).astype(np.float32)
    for pw in (1.0, 2.5):
        ref = torch.nn.BCEWithLogitsLoss(
            pos_weight=torch.tensor([pw]), reduction="none"
        )(torch.from_numpy(logits), torch.from_numpy(targets))
        got = bce_with_logits(jnp.asarray(logits), jnp.asarray(targets), pw)
        # jax and torch log-sigmoid differ by ~1 ulp chains on CPU
        np.testing.assert_allclose(np.asarray(got), ref.numpy(), rtol=1e-3, atol=1e-4)


def test_smooth_bce():
    cp, cn = smooth_bce(0.1)
    assert cp == pytest.approx(0.95) and cn == pytest.approx(0.05)


def test_loss_parity_with_reference(reference, rng):
    import torch
    from vision_kit.models.losses.yolo import YoloLoss as RefLoss

    b = 2
    anchors = normalized_anchors(V5_ANCHORS, STRIDES)
    preds = make_preds(rng, b)
    rows = make_targets(rng, b, 6)

    ref_loss = RefLoss(num_classes=NC, hyp=dict(HYP))
    ref_loss.set_anchor(torch.from_numpy(anchors.copy()))
    ref_total, ref_parts = ref_loss(
        [torch.from_numpy(p) for p in preds], torch.from_numpy(rows)
    )

    loss = YoloLoss(NC, anchors, HYP)
    total, parts = loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(to_padded(rows, b, 16))
    )
    np.testing.assert_allclose(float(total), float(ref_total), rtol=2e-3)
    np.testing.assert_allclose(
        np.asarray(parts), ref_parts.numpy().reshape(-1), rtol=2e-3, atol=1e-5
    )


def test_loss_native_layout_parity(rng):
    """The native-layout (B, ny, nx, na, no) path must match the
    anchor-major path on the same values (pure re-indexing)."""
    b = 2
    anchors = normalized_anchors(V5_ANCHORS, STRIDES)
    preds_am = make_preds(rng, b)
    rows = make_targets(rng, b, 6)
    padded = jnp.asarray(to_padded(rows, b, 16))

    loss_auto = YoloLoss(NC, anchors, HYP)
    t_am, p_am = loss_auto([jnp.asarray(p) for p in preds_am], padded)
    preds_nat = [jnp.asarray(p.transpose(0, 2, 3, 1, 4)) for p in preds_am]
    t_nat, p_nat = loss_auto(preds_nat, padded)
    np.testing.assert_allclose(float(t_nat), float(t_am), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(p_nat), np.asarray(p_am), rtol=1e-5
    )
    # explicit layout= agrees with auto-detection
    t_e, _ = YoloLoss(NC, anchors, HYP, layout="native")(preds_nat, padded)
    np.testing.assert_allclose(float(t_e), float(t_nat), rtol=0, atol=0)


def test_loss_empty_targets(rng):
    b = 2
    anchors = normalized_anchors(V5_ANCHORS, STRIDES)
    loss = YoloLoss(NC, anchors, HYP)
    preds = [jnp.asarray(p) for p in make_preds(rng, b)]
    empty = jnp.full((b, 16, 5), -1.0)
    total, parts = loss(preds, empty)
    assert np.isfinite(float(total))
    assert float(parts[0]) == 0.0 and float(parts[2]) == 0.0
    assert float(parts[1]) > 0.0  # obj loss still penalizes background


def test_loss_is_differentiable(rng):
    b = 1
    anchors = normalized_anchors(V5_ANCHORS, STRIDES)
    loss = YoloLoss(NC, anchors, HYP)
    preds = [jnp.asarray(p) for p in make_preds(rng, b)]
    targets = jnp.asarray(to_padded(make_targets(rng, b, 3), b, 8))

    def f(ps):
        return loss(ps, targets)[0]

    grads = jax.grad(f)(preds)
    gnorm = sum(float(jnp.abs(g).sum()) for g in grads)
    assert np.isfinite(gnorm) and gnorm > 0
