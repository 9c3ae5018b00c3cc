"""Optimizer tests: group labeling, warmup interpolation, nesterov SGD
update parity with torch, focal loss sanity."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.train.losses import bce_with_logits, focal_bce_with_logits
from vision_kit_tpu.train.optim import (
    SGDState,
    label_params,
    lr_schedules,
    yolo_sgd,
)

HYP = {
    "lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
    "warmup_epochs": 3.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
}


def test_label_params():
    params = {
        "backbone": {
            "stem": {"conv": {"kernel": np.zeros((3, 3, 3, 8))},
                     "bn": {"scale": np.zeros(8), "bias": np.zeros(8)}},
        },
        "head": {"m_0": {"kernel": np.zeros((1, 1, 8, 255)),
                         "bias": np.zeros(255)},
                 "ia_0": {"implicit": np.zeros((1, 1, 1, 8))}},
    }
    labels = label_params(params)
    assert labels["backbone"]["stem"]["conv"]["kernel"] == "weight"
    assert labels["backbone"]["stem"]["bn"]["scale"] == "norm"
    assert labels["backbone"]["stem"]["bn"]["bias"] == "bias"
    assert labels["head"]["m_0"]["bias"] == "bias"
    assert labels["head"]["ia_0"]["implicit"] == "norm"


def test_warmup_schedule_endpoints():
    spe = 100
    lr_w, lr_b, mom = lr_schedules(HYP, max_epochs=10, steps_per_epoch=spe)
    nw = 300  # 3 epochs * 100 steps
    assert float(lr_b(0)) == pytest.approx(0.1, rel=1e-5)
    assert float(lr_w(0)) == pytest.approx(0.0, abs=1e-8)
    assert float(mom(0)) == pytest.approx(0.8, rel=1e-5)
    # past warmup: momentum at target, lr on the linear decay
    assert float(mom(nw + 1)) == pytest.approx(0.937, rel=1e-5)
    e5 = 5 * spe
    expect = 0.01 * ((1 - 5 / 10) * (1 - 0.01) + 0.01)
    assert float(lr_w(e5)) == pytest.approx(expect, rel=1e-4)
    # bias lr converges to the same schedule
    assert float(lr_b(e5)) == pytest.approx(float(lr_w(e5)), rel=1e-5)


def test_cosine_schedule_v7():
    lr_w, _, _ = lr_schedules(
        {**HYP, "lrf": 0.1}, max_epochs=10, steps_per_epoch=100, cosine=True
    )
    # at the final epoch the cosine factor reaches lrf
    assert float(lr_w(10 * 100)) == pytest.approx(0.01 * 0.1, rel=1e-3)


def test_sgd_matches_torch_nesterov():
    import torch

    rng = np.random.default_rng(0)
    w0 = rng.normal(0, 1, (4, 5)).astype(np.float32)
    grads = [rng.normal(0, 1, (4, 5)).astype(np.float32) for _ in range(4)]
    lr, mu, wd = 0.01, 0.937, 0.0005

    # torch ground truth
    wt = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.SGD([wt], lr=lr, momentum=mu, nesterov=True,
                          weight_decay=wd)
    for g in grads:
        opt.zero_grad()
        wt.grad = torch.from_numpy(g.copy())
        opt.step()

    # our transform: fixed schedules past warmup
    hyp = {**HYP, "lr0": lr, "lrf": 1.0, "warmup_epochs": 0.0}
    params = {"layer": {"kernel": jnp.asarray(w0.copy())}}
    tx = yolo_sgd(params, hyp, max_epochs=1000000, steps_per_epoch=1)
    state = tx.init(params)
    # skip warmup: min warmup is 100 steps, so jump the step counter
    state = SGDState(step=jnp.asarray(1000, jnp.int32),
                     momentum_buf=state.momentum_buf)
    import optax

    for g in grads:
        updates, state = tx.update(
            {"layer": {"kernel": jnp.asarray(g)}}, state, params
        )
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["layer"]["kernel"]), wt.detach().numpy(),
        rtol=1e-4, atol=1e-6,
    )


def test_focal_loss_reduces_easy_examples():
    logits = jnp.asarray([4.0, 0.0])   # confident-correct, uncertain
    targets = jnp.asarray([1.0, 1.0])
    bce = bce_with_logits(logits, targets)
    focal = focal_bce_with_logits(logits, targets, gamma=2.0)
    # focal suppresses the easy example far more than the hard one
    ratio_easy = float(focal[0] / bce[0])
    ratio_hard = float(focal[1] / bce[1])
    assert ratio_easy < ratio_hard < 0.5
