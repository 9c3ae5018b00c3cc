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


@pytest.mark.parametrize("dtype", [np.float32, jnp.bfloat16])
def test_ota_saturated_logits_still_assign(rng, dtype):
    """Confidently-correct (saturated-sigmoid) predictions must stay
    assignable. y = sqrt(sig(cls)*sig(obj)) rounds to exactly 1.0 once
    logits saturate (bf16 ~|z|>9, fp32 ~|z|>17) and 1 - 1e-8 == 1.0 in
    both dtypes, so a naive log(1-y) cost is NaN there — NaN sorts largest
    under top_k and silently excluded exactly the best candidates
    (regression for the stable log-space cls cost)."""
    loss = make_loss()
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets = jnp.asarray(targets)

    preds = []
    for s in STRIDES:
        g = IMG // int(s)
        p = np.zeros((1, 3, g, g, NC + 5), np.float32)
        p[..., 4] = 40.0                     # obj saturated
        p[..., 5:] = -40.0
        p[..., 5 + 1] = 40.0                 # gt class saturated
        preds.append(jnp.asarray(p, dtype))

    total, parts = loss(preds, targets)
    assert np.isfinite(float(total))
    assert float(parts[0]) > 0.0             # candidates were assigned

    grads = jax.grad(lambda ps: loss(ps, targets)[0])(preds)
    assert all(np.isfinite(np.asarray(g, np.float32)).all() for g in grads)


def test_ota_conflict_reassigns_to_argmin():
    """Reference semantics (yolo.py:319-323): a multiply-claimed candidate
    is reassigned to the global argmin-cost gt — even one that never
    claimed it — never dropped from the foreground set."""
    # 3 gts x 2 candidates; candidate 0 claimed by gts 1 and 2, but gt 0
    # (not a claimant) has the globally smallest cost there; candidate 1
    # has a single claim (gt 1) and must pass through untouched.
    mm = jnp.array([[False, False],
                    [True, True],
                    [True, False]])
    cost = jnp.array([[1.0, 5.0],
                      [2.0, 4.0],
                      [3.0, 9.0]])
    out = np.asarray(YoloLossOTA._resolve_conflicts(mm, cost))
    # column 0: reassigned to gt 0 (argmin), not dropped
    np.testing.assert_array_equal(out[:, 0], [True, False, False])
    # column 1: single claim untouched
    np.testing.assert_array_equal(out[:, 1], [False, True, False])


def test_ota_focal_gamma_applied(rng):
    """fl_gamma > 0 must modulate the OTA losses (it is a documented shared
    hyperparameter; configs/yolov7.yaml exposes both fl_gamma and
    loss_ota)."""
    anchors = normalized_anchors(V7_ANCHORS, STRIDES)
    loss_plain = YoloLossOTA(NC, anchors, HYP, strides=STRIDES)
    loss_focal = YoloLossOTA(NC, anchors, dict(HYP, fl_gamma=1.5),
                             strides=STRIDES)
    preds = make_preds(rng, 1)
    targets = np.full((1, 4, 5), -1, np.float32)
    targets[0, 0] = [1, 0.5, 0.5, 0.25, 0.25]
    targets = jnp.asarray(targets)

    _, p_plain = loss_plain(preds, targets)
    _, p_focal = loss_focal(preds, targets)
    assert float(p_plain[1]) != float(p_focal[1])   # obj
    assert float(p_plain[2]) != float(p_focal[2])   # cls
    assert float(p_plain[0]) == float(p_focal[0])   # box unaffected


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
