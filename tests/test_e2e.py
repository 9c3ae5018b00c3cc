"""End-to-end slices: fused predictor on a real image, tiny train->val->ckpt
cycle through the Trainer, export path."""

import os

import cv2
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.models import YOLOV5
from vision_kit_tpu.predictor import Predictor

BUS = "/root/reference/assets/bus.jpg"


@pytest.fixture(scope="module")
def tiny_model():
    model = YOLOV5(variant="n", num_classes=80)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 192, 192, 3)), training=False
    )
    return model, variables


def test_predictor_fused_pipeline(tiny_model):
    model, variables = tiny_model
    if not os.path.exists(BUS):
        pytest.skip("bus.jpg not available")
    bgr = cv2.imread(BUS)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    pred = Predictor(model, variables, img_size=192, conf_thres=0.01,
                     max_cand=256, max_det=50)
    dets, ms = pred(rgb)
    assert dets.ndim == 2 and dets.shape[1] == 6
    # boxes are inside the ORIGINAL frame (rescale fused into the program)
    h, w = rgb.shape[:2]
    if len(dets):
        assert (dets[:, 0] >= 0).all() and (dets[:, 2] <= w + 1).all()
        assert (dets[:, 1] >= 0).all() and (dets[:, 3] <= h + 1).all()
    # second call reuses the compiled program
    d2, _ = pred(rgb)
    assert d2.shape[1] == 6


def test_predictor_batch_consistency(tiny_model):
    """Same image twice -> identical detections (determinism)."""
    model, variables = tiny_model
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    pred = Predictor(model, variables, img_size=192, conf_thres=0.01,
                     max_cand=256, max_det=50)
    d1, _ = pred(img)
    d2, _ = pred(img)
    np.testing.assert_array_equal(d1, d2)


def test_predict_batch_matches_single(tiny_model):
    """predict_batch runs the whole batch as one program and must agree
    with the per-image path."""
    model, variables = tiny_model
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (3, 200, 300, 3), dtype=np.uint8)
    pred = Predictor(model, variables, img_size=192, conf_thres=0.01,
                     max_cand=256, max_det=50)
    batch_dets, _ = pred.predict_batch(imgs)
    assert len(batch_dets) == 3
    for i in range(3):
        single, _ = pred(imgs[i])
        np.testing.assert_allclose(batch_dets[i], single, rtol=1e-5,
                                   atol=1e-4)


def test_export_stablehlo(tiny_model):
    """Export path: lowering the fixed-shape inference program to StableHLO
    text (the TPU-native analog of the reference's ONNX export)."""
    model, variables = tiny_model

    def forward(images):
        decoded, _ = model.apply(variables, images, training=False)
        return decoded

    lowered = jax.jit(forward).lower(
        jax.ShapeDtypeStruct((1, 192, 192, 3), jnp.float32)
    )
    text = lowered.as_text()
    assert "stablehlo" in text or "mhlo" in text or "func.func" in text
    assert len(text) > 1000


def test_trainer_cycle(tmp_path):
    """Two-epoch train + validate + checkpoint save/restore on a synthetic
    dataset through the full Trainer."""
    from vision_kit_tpu.utils.config import ConfigNode
    from vision_kit_tpu.train.trainer import Trainer
    from vision_kit_tpu.parallel.mesh import make_mesh

    # synthetic yolo dataset
    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(4):
            img = np.full((160, 160, 3), 90, np.uint8)
            img[40:90, 30:100] = (200, 60, 60)
            cv2.imwrite(str(tmp_path / split / "images" / f"{i}.jpg"), img)
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                "0 0.40625 0.40625 0.4375 0.3125"
            )

    cfg = ConfigNode.wrap({
        "model": {"name": "YOLOv5", "version": "n", "num_classes": 2,
                  "input_size": [96, 96], "act": "silu", "deploy": False,
                  "weight": ""},
        "data": {"data_format": "yolo", "data_dir": str(tmp_path),
                 "output_dir": str(tmp_path / "out"),
                 "train_path": "train", "val_path": "valid",
                 "test_path": "valid", "batch_size": 2, "max_epochs": 2,
                 "num_workers": 0, "filter_classes": [],
                 "class_labels": ["a", "b"]},
        "testing": {"conf_thresh": 0.001, "iou_thresh": 0.6,
                    "val_interval": 1},
        "hypermeters": {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937,
                        "weight_decay": 0.0005, "warmup_epochs": 0.0,
                        "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
                        "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0,
                        "obj_pw": 1.0, "iou_t": 0.2, "anchor_t": 4.0,
                        "fl_gamma": 0.0, "label_smoothing": 0.0},
        "augmentations": {"degrees": 0.0, "translate": 0.1, "scale": 0.5,
                          "shear": 0.0, "perspective": 0.0,
                          "flip_ud_prob": 0.0, "flip_lr_prob": 0.5,
                          "mosaic_prob": 1.0, "mixup_prob": 1.0,
                          "hsv_prob": 1.0, "mosaic_scale": [0.5, 1.5],
                          "mixup_scale": [0.5, 1.5], "enable_mixup": False,
                          "enable_mosaic": True},
    })
    os.makedirs(cfg.data.output_dir, exist_ok=True)
    mesh = make_mesh(n_data=2, n_model=1)
    trainer = Trainer(cfg, mesh=mesh, use_tensorboard=False)
    trainer.fit()
    assert int(jax.device_get(trainer.state.step)) > 0
    assert os.path.exists(os.path.join(cfg.data.output_dir, "ckpts", "last"))

    # restore into a fresh trainer
    trainer2 = Trainer(cfg, mesh=mesh, use_tensorboard=False)
    epoch = trainer2.load_checkpoint(
        os.path.join(cfg.data.output_dir, "ckpts", "last")
    )
    assert epoch >= 0
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(jax.device_get(trainer2.state.params))[0]),
        np.asarray(jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))[0]),
    )

    # export-path weight extraction: load_weights on a TRAINER checkpoint
    # (full TrainState on disk) must pull the EMA weights into a bare
    # variables template — regression: this crashed with an orbax structure
    # mismatch, breaking `main.py export --ckpt-dir`
    from vision_kit_tpu.predictor import load_weights

    model = YOLOV5(variant="n", num_classes=2)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 96, 96, 3)), training=False
    )
    loaded = load_weights(
        os.path.join(cfg.data.output_dir, "ckpts", "last"), template
    )
    ema_tree = jax.device_get(trainer.state.ema.tree)
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(loaded["params"])[0]),
        np.asarray(jax.tree_util.tree_leaves(ema_tree["params"])[0]),
    )

    trainer.train_loader.close()
    trainer2.train_loader.close()


def test_trainer_crash_saves_checkpoint(tmp_path, monkeypatch):
    """An exception mid-training must save a resumable 'last' checkpoint
    with the real epoch (reference ModelCkpt.on_exception)."""
    import json

    from vision_kit_tpu.parallel.mesh import make_mesh
    from vision_kit_tpu.train.trainer import Trainer
    from vision_kit_tpu.utils.config import ConfigNode

    rng = np.random.default_rng(0)
    for split in ("train", "valid"):
        (tmp_path / split / "images").mkdir(parents=True)
        (tmp_path / split / "labels").mkdir(parents=True)
        for i in range(2):
            cv2.imwrite(str(tmp_path / split / "images" / f"{i}.jpg"),
                        np.full((96, 96, 3), 90, np.uint8))
            (tmp_path / split / "labels" / f"{i}.txt").write_text(
                "0 0.5 0.5 0.4 0.3")
    cfg = ConfigNode.wrap({
        "model": {"name": "YOLOv5", "version": "n", "num_classes": 2,
                  "input_size": [64, 64], "act": "silu", "deploy": False,
                  "weight": ""},
        "data": {"data_format": "yolo", "data_dir": str(tmp_path),
                 "output_dir": str(tmp_path / "out"), "train_path": "train",
                 "val_path": "valid", "batch_size": 2, "max_epochs": 5,
                 "num_workers": 0, "filter_classes": [],
                 "class_labels": ["a", "b"], "ckpt_interval": 100},
        "testing": {"conf_thresh": 0.01, "iou_thresh": 0.6,
                    "val_interval": 100},
        "hypermeters": {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937,
                        "weight_decay": 0.0005, "warmup_epochs": 0.0,
                        "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
                        "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0,
                        "obj_pw": 1.0, "iou_t": 0.2, "anchor_t": 4.0,
                        "fl_gamma": 0.0, "label_smoothing": 0.0},
        "augmentations": {"degrees": 0.0, "translate": 0.1, "scale": 0.5,
                          "shear": 0.0, "flip_ud_prob": 0.0,
                          "flip_lr_prob": 0.0, "mosaic_prob": 0.0,
                          "mixup_prob": 0.0, "hsv_prob": 0.0},
    })
    os.makedirs(cfg.data.output_dir, exist_ok=True)
    trainer = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                      use_tensorboard=False)

    calls = {"n": 0}
    orig = trainer.train_step

    def exploding_step(state, batch):
        calls["n"] += 1
        if calls["n"] > 3:  # blow up during epoch 3 (step 4)
            raise RuntimeError("boom")
        return orig(state, batch)

    trainer.train_step = exploding_step
    with pytest.raises(RuntimeError, match="boom"):
        trainer.fit()
    path = os.path.join(cfg.data.output_dir, "ckpts", "last")
    assert os.path.exists(path)
    meta = json.load(open(path + ".meta.json"))
    # 3 steps completed before the boom (steps_per_epoch=1): the resume
    # cursor is meta["step"]; epoch stays informational (last COMPLETED)
    assert meta["step"] == 3
    assert meta["epoch"] == 2
    trainer2 = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                       use_tensorboard=False)
    assert trainer2.load_checkpoint(path) == 3
    assert trainer2.global_step == 3
    trainer.train_loader.close()
    trainer2.train_loader.close()


def test_predict_spatial_multichip(tiny_model):
    """spatial=True height-shards the conv stack over the model axis (the
    multi-chip latency path) and must match single-chip results — for a
    single image AND for a data+spatial sharded batch."""
    from vision_kit_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (200, 300, 3), dtype=np.uint8)
    p1 = Predictor(model, variables, img_size=192, conf_thres=0.01,
                   max_cand=256, max_det=50)
    psp = Predictor(model, variables, img_size=192, conf_thres=0.01,
                    max_cand=256, max_det=50,
                    mesh=make_mesh(n_data=4, n_model=2), spatial=True)
    d1, _ = p1(img)
    dsp, _ = psp(img)
    np.testing.assert_allclose(dsp, d1, rtol=1e-5, atol=1e-4)

    imgs = rng.integers(0, 255, (4, 200, 300, 3), dtype=np.uint8)
    b1, _ = p1.predict_batch(imgs)
    bsp, _ = psp.predict_batch(imgs)
    for a, b in zip(b1, bsp):
        np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-4)


def test_predict_batch_multichip(tiny_model):
    """Predictor with a mesh shards predict_batch over the data axis and
    matches the single-chip results."""
    from vision_kit_tpu.parallel.mesh import make_mesh

    model, variables = tiny_model
    rng = np.random.default_rng(2)
    imgs = rng.integers(0, 255, (8, 200, 300, 3), dtype=np.uint8)
    p1 = Predictor(model, variables, img_size=192, conf_thres=0.01,
                   max_cand=256, max_det=50)
    p8 = Predictor(model, variables, img_size=192, conf_thres=0.01,
                   max_cand=256, max_det=50, mesh=make_mesh(n_data=8))
    d1, _ = p1.predict_batch(imgs)
    d8, _ = p8.predict_batch(imgs)
    assert len(d1) == len(d8) == 8
    for a, b in zip(d1, d8):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-4)
