"""Multi-scale training (cfg data.multiscale — TPU extra, the reference
has none): the batch stays base-sized on the host and in H2D; the jitted
step resizes on device (train/step.py scale_to)."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models.architectures import YOLOV5
from vision_kit_tpu.train.losses import YoloLoss
from vision_kit_tpu.train.optim import make_optimizer
from vision_kit_tpu.train.step import create_train_state, make_train_step

HYP = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
       "warmup_epochs": 0.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
       "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "anchor_t": 4.0, "fl_gamma": 0.0,
       "label_smoothing": 0.0}


def _setup(base=64):
    model = YOLOV5(variant="n", num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, base, base, 3)), training=False
    )
    tx = make_optimizer(variables["params"], dict(HYP), 10, 10)
    loss = YoloLoss(2, model.grid_anchors, dict(HYP), layout="native")
    state = create_train_state(variables, tx)
    return model, loss, tx, state


def _batch(base=64, b=2, seed=0):
    rng = np.random.default_rng(seed)
    imgs = rng.integers(0, 256, (b, base, base, 3), np.uint8)
    targets = np.full((b, 4, 5), -1, np.float32)
    targets[:, 0] = [0, 0.5, 0.5, 0.4, 0.3]
    return {"image": jnp.asarray(imgs), "targets": jnp.asarray(targets)}


def test_scale_to_runs_and_updates():
    """scale_to=128 on a 64-base batch: step runs, loss finite, params
    move, and the head maps inside the loss saw the 128 grid (loss differs
    from the base-size step on the same batch)."""
    model, loss, tx, state = _setup()
    batch = _batch()
    step_base = make_train_step(model, loss, tx, donate=False)
    step_up = make_train_step(model, loss, tx, donate=False, scale_to=128)
    s1, m1 = step_base(state, batch)
    s2, m2 = step_up(state, batch)
    l1, l2 = float(m1["loss"]), float(m2["loss"])
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l1 != l2  # different rendering -> different loss
    p0 = jax.tree_util.tree_leaves(state.params)[0]
    p2 = jax.tree_util.tree_leaves(s2.params)[0]
    assert not np.allclose(np.asarray(p0), np.asarray(p2))


def test_scale_to_base_is_identity():
    """scale_to == input size must be the exact base program (the resize
    is statically skipped)."""
    model, loss, tx, state = _setup()
    batch = _batch(seed=1)
    step_base = make_train_step(model, loss, tx, donate=False)
    step_same = make_train_step(model, loss, tx, donate=False, scale_to=64)
    _, m1 = step_base(state, batch)
    _, m2 = step_same(state, batch)
    assert float(m1["loss"]) == float(m2["loss"])


def test_scale_to_with_accumulation():
    """scale_to composes with accum_steps (the resize runs per microbatch
    so accumulation keeps its one-microbatch activation budget)."""
    model, loss, tx, state = _setup()
    batch = _batch(b=4, seed=3)
    step = make_train_step(model, loss, tx, donate=False, accum_steps=2,
                           scale_to=128)
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_scale_down():
    """Downscale leg (128 -> 64)."""
    model, loss, tx, state = _setup(base=128)
    batch = _batch(base=128, seed=2)
    step = make_train_step(model, loss, tx, donate=False, scale_to=64)
    _, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))


def _trainer_cfg(tmp_path, multiscale):
    from vision_kit_tpu.utils.config import ConfigNode

    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        (tmp_path / split / "images").mkdir(parents=True, exist_ok=True)
        (tmp_path / split / "labels").mkdir(parents=True, exist_ok=True)
        for i in range(4):
            img = np.full((160, 160, 3), 90, np.uint8)
            img[40:90, 30:100] = (200, 60, 60)
            cv2.imwrite(str(tmp_path / split / "images" / f"{i}.jpg"), img)
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                "0 0.40625 0.40625 0.4375 0.3125"
            )
    return ConfigNode.wrap({
        "model": {"name": "YOLOv5", "version": "n", "num_classes": 2,
                  "input_size": [64, 64], "act": "silu", "deploy": False,
                  "weight": ""},
        "data": {"data_format": "yolo", "data_dir": str(tmp_path),
                 "output_dir": str(tmp_path / "out"),
                 "train_path": "train", "val_path": "valid",
                 "test_path": "valid", "batch_size": 2, "max_epochs": 1,
                 "num_workers": 0, "filter_classes": [],
                 "class_labels": ["a", "b"], "multiscale": multiscale},
        "testing": {"conf_thresh": 0.001, "iou_thresh": 0.6,
                    "val_interval": 10},
        "hypermeters": dict(HYP),
        "augmentations": {"degrees": 0.0, "translate": 0.1, "scale": 0.5,
                          "shear": 0.0, "perspective": 0.0,
                          "flip_ud_prob": 0.0, "flip_lr_prob": 0.5,
                          "mosaic_prob": 1.0, "mixup_prob": 1.0,
                          "hsv_prob": 1.0, "mosaic_scale": [0.5, 1.5],
                          "mixup_scale": [0.5, 1.5], "enable_mixup": False,
                          "enable_mosaic": True},
    })


def test_trainer_multiscale_schedule(tmp_path):
    """Trainer: size schedule is deterministic, covers >1 size, changes
    only at MS_INTERVAL boundaries, and a non-base step actually runs."""
    from vision_kit_tpu.parallel.mesh import make_mesh, shard_batch
    from vision_kit_tpu.train.trainer import Trainer

    cfg = _trainer_cfg(tmp_path, multiscale=[64, 128])
    os.makedirs(cfg.data.output_dir, exist_ok=True)
    trainer = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                      use_tensorboard=False)
    assert trainer.ms_sizes == [64, 128]

    # schedule: constant within an interval, deterministic across calls
    fns = [trainer._train_step_for(g) for g in range(40)]
    for g in range(40):
        assert fns[g] is trainer._train_step_for(g)
        if g % trainer.MS_INTERVAL:
            assert fns[g] is fns[g - g % trainer.MS_INTERVAL]
    assert any(f is not trainer.train_step for f in fns), "128 never drawn"
    assert any(f is trainer.train_step for f in fns), "base never drawn"

    # run one real batch through the 128-sized step
    big = next(f for f in fns if f is not trainer.train_step)
    batch = next(iter(trainer.train_loader))
    state, metrics = big(trainer.state,
                         shard_batch(trainer.mesh, batch))
    assert np.isfinite(float(jax.device_get(metrics["loss"])))
    trainer.train_loader.close()


def test_trainer_multiscale_validation(tmp_path):
    from vision_kit_tpu.parallel.mesh import make_mesh
    from vision_kit_tpu.train.trainer import Trainer

    cfg = _trainer_cfg(tmp_path, multiscale=[64, 100])  # 100 % 32 != 0
    os.makedirs(cfg.data.output_dir, exist_ok=True)
    with pytest.raises(ValueError, match="multiple of 32"):
        Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                use_tensorboard=False)
