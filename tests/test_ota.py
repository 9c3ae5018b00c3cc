"""SimOTA loss tests (from first principles — the reference OTA is dead
code, SURVEY.md §2.1)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models.heads import V7_ANCHORS, normalized_anchors
from vision_kit_tpu.train.ota import YoloLossOTA

HYP = {
    "box": 0.05, "obj": 0.7, "cls": 0.3,
    "cls_pw": 1.0, "obj_pw": 1.0,
    "anchor_t": 4.0, "label_smoothing": 0.0,
}
NC = 7
STRIDES = (8.0, 16.0, 32.0)
IMG = 160


def make_preds(rng, b):
    shapes = [(b, 3, IMG // int(s), IMG // int(s), NC + 5) for s in STRIDES]
    return [jnp.asarray(rng.normal(0, 1, size=s).astype(np.float32))
            for s in shapes]


def make_loss():
    anchors = normalized_anchors(V7_ANCHORS, STRIDES)
    return YoloLossOTA(NC, anchors, HYP, strides=STRIDES)


def test_ota_runs_finite(rng):
    loss = make_loss()
    preds = make_preds(rng, 2)
    targets = np.full((2, 8, 5), -1, np.float32)
    targets[0, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    targets[0, 1] = [5, 0.2, 0.3, 0.15, 0.1]
    targets[1, 0] = [0, 0.7, 0.6, 0.5, 0.5]
    total, parts = loss(preds, jnp.asarray(targets))
    assert np.isfinite(float(total))
    assert all(np.isfinite(np.asarray(parts)))
    assert float(parts[0]) > 0  # matched something -> box loss nonzero


def test_ota_empty_targets(rng):
    loss = make_loss()
    preds = make_preds(rng, 2)
    targets = jnp.full((2, 8, 5), -1.0)
    total, parts = loss(preds, targets)
    assert np.isfinite(float(total))
    assert float(parts[0]) == 0.0 and float(parts[2]) == 0.0
    assert float(parts[1]) > 0.0


def test_ota_differentiable(rng):
    loss = make_loss()
    preds = make_preds(rng, 1)
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets = jnp.asarray(targets)

    grads = jax.grad(lambda ps: loss(ps, targets)[0])(preds)
    g = sum(float(jnp.abs(x).sum()) for x in grads)
    assert np.isfinite(g) and g > 0


def test_ota_training_reduces_loss(rng):
    """A few SGD steps on fixed preds-as-params must reduce the OTA loss
    (sanity that assignment produces a usable gradient signal)."""
    import optax

    loss = make_loss()
    preds = make_preds(rng, 1)
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets = jnp.asarray(targets)

    tx = optax.sgd(0.5)
    opt_state = tx.init(preds)

    @jax.jit
    def step(ps, os_):
        l, grads = jax.value_and_grad(lambda p: loss(p, targets)[0])(ps)
        updates, os2 = tx.update(grads, os_)
        return optax.apply_updates(ps, updates), os2, l

    losses = []
    for _ in range(10):
        preds, opt_state, l = step(preds, opt_state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_ota_native_layout_parity(rng):
    """Native (B,ny,nx,na,no) maps through the layout-aware linear index
    must produce bit-identical losses to the anchor-major path (the head's
    training maps are native by default; OTA must not need a transpose)."""
    anchors = normalized_anchors(V7_ANCHORS, STRIDES)
    loss_am = YoloLossOTA(NC, anchors, HYP, strides=STRIDES,
                          layout="anchor_major")
    loss_nat = YoloLossOTA(NC, anchors, HYP, strides=STRIDES,
                           layout="native")
    preds = make_preds(rng, 2)                       # anchor-major
    preds_nat = [p.transpose(0, 2, 3, 1, 4) for p in preds]
    targets = np.full((2, 8, 5), -1, np.float32)
    targets[0, 0] = [2, 0.5, 0.5, 0.3, 0.4]
    targets[0, 1] = [5, 0.2, 0.3, 0.15, 0.1]
    targets[1, 0] = [0, 0.7, 0.6, 0.5, 0.5]
    targets = jnp.asarray(targets)

    t_am, p_am = loss_am(preds, targets)
    t_nat, p_nat = loss_nat(preds_nat, targets)
    np.testing.assert_allclose(float(t_am), float(t_nat), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(p_am), np.asarray(p_nat),
                               rtol=1e-6)

    g_am = jax.grad(lambda ps: loss_am(ps, targets)[0])(preds)
    g_nat = jax.grad(lambda ps: loss_nat(ps, targets)[0])(preds_nat)
    for ga, gn in zip(g_am, g_nat):
        np.testing.assert_allclose(
            np.asarray(ga), np.asarray(gn).transpose(0, 3, 1, 2, 4),
            rtol=1e-5, atol=1e-6)


def test_ota_each_candidate_single_gt(rng):
    """Internals: after conflict resolution no candidate serves two gts."""
    loss = make_loss()
    preds = make_preds(rng, 1)
    # two heavily-overlapping gts force claim conflicts
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.3, 0.3]
    targets[0, 1] = [2, 0.52, 0.5, 0.3, 0.3]
    total, parts = loss(preds, jnp.asarray(targets))
    assert np.isfinite(float(total))
