"""Round-2 product-facing behaviors: seed threading, data.test_path,
per-epoch COCO-accumulation gating, spatial size validation."""

import os

import cv2
import numpy as np
import pytest

import jax

from vision_kit_tpu.parallel.mesh import make_mesh
from vision_kit_tpu.train.trainer import Trainer
from vision_kit_tpu.utils.config import ConfigNode

HYP = {"lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
       "warmup_epochs": 0.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
       "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
       "iou_t": 0.2, "anchor_t": 4.0, "fl_gamma": 0.0,
       "label_smoothing": 0.0}
AUG = {"degrees": 0.0, "translate": 0.1, "scale": 0.5, "shear": 0.0,
       "flip_ud_prob": 0.0, "flip_lr_prob": 0.5, "mosaic_prob": 1.0,
       "mixup_prob": 0.0, "hsv_prob": 1.0, "mosaic_scale": [0.5, 1.5],
       "mixup_scale": [0.5, 1.5], "enable_mixup": False,
       "enable_mosaic": True}


def _write_split(root, split, n, box="0 0.5 0.5 0.4 0.3", shade=90):
    (root / split / "images").mkdir(parents=True, exist_ok=True)
    (root / split / "labels").mkdir(parents=True, exist_ok=True)
    for i in range(n):
        img = np.full((96, 96, 3), shade, np.uint8)
        img[30:60, 30:70] = (200, 60, 60)
        cv2.imwrite(str(root / split / "images" / f"{i}.jpg"), img)
        (root / split / "labels" / f"{i}.txt").write_text(box)


def _cfg(tmp_path, **data_overrides):
    data = {"data_format": "yolo", "data_dir": str(tmp_path),
            "output_dir": str(tmp_path / "out"), "train_path": "train",
            "val_path": "valid", "batch_size": 2, "max_epochs": 1,
            "num_workers": 0, "filter_classes": [],
            "class_labels": ["a", "b"]}
    data.update(data_overrides)
    cfg = ConfigNode.wrap({
        "model": {"name": "YOLOv5", "version": "n", "num_classes": 2,
                  "input_size": [64, 64], "act": "silu", "deploy": False,
                  "weight": ""},
        "data": data,
        "testing": {"conf_thresh": 0.001, "iou_thresh": 0.6,
                    "val_interval": 1},
        "hypermeters": dict(HYP),
        "augmentations": dict(AUG),
    })
    os.makedirs(cfg.data.output_dir, exist_ok=True)
    return cfg


def _param_leaves(trainer):
    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(jax.device_get(trainer.state.params))]


def test_seed_threads_into_init_and_loader(tmp_path):
    """--seed must drive model init AND the data stream: same seed ->
    identical params and first batch; different seed -> both diverge
    (reference pl.seed_everything, scripts/main.py:113)."""
    _write_split(tmp_path, "train", 4)
    _write_split(tmp_path, "valid", 2)
    cfg = _cfg(tmp_path)
    mesh = make_mesh(n_data=1, n_model=1)
    trainers = [
        Trainer(cfg, mesh=mesh, use_tensorboard=False, seed=s)
        for s in (1, 1, 2)
    ]
    try:
        k1, k1b, k2 = (_param_leaves(t) for t in trainers)
        for a, b in zip(k1, k1b):
            np.testing.assert_array_equal(a, b)
        # at least one leaf (the conv kernels) must differ across seeds
        assert any(
            a.shape == b.shape and np.abs(a - b).max() > 0
            for a, b in zip(k1, k2)
        )

        batches = [next(iter(t.train_loader)) for t in trainers]
        np.testing.assert_array_equal(batches[0]["image"],
                                      batches[1]["image"])
        np.testing.assert_array_equal(batches[0]["targets"],
                                      batches[1]["targets"])
        assert not np.array_equal(batches[0]["image"], batches[2]["image"])
    finally:
        for t in trainers:
            t.train_loader.close()


def test_test_path_split_and_coco_gating(tmp_path):
    """trainer.test() must evaluate data.test_path when it differs from the
    val split (reference datamodule.py:99-110), and per-epoch validate()
    must skip the COCO-protocol accumulation."""
    _write_split(tmp_path, "train", 4)
    _write_split(tmp_path, "valid", 2)
    _write_split(tmp_path, "test", 6, box="1 0.5 0.5 0.6 0.6", shade=40)
    cfg = _cfg(tmp_path, test_path="test")
    trainer = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                      use_tensorboard=False)
    try:
        # epoch-val path: no COCO accumulation
        trainer.validate()
        assert trainer.evaluator.coco_metrics is None
        with pytest.raises(RuntimeError, match="disabled"):
            trainer.evaluator.summarize_coco()

        # distinct test split is actually used
        tl = trainer._test_loader()
        assert tl is not trainer.val_loader
        assert len(tl.dataset) == 6
        result = trainer.test()
        assert trainer.evaluator.seen == 6
        assert "coco" in result  # test() computed the COCO table set
    finally:
        trainer.train_loader.close()


def test_test_path_falls_back_to_val(tmp_path):
    """Without a distinct test_path, test() evaluates the val split (the
    round-1 behavior, now explicit)."""
    _write_split(tmp_path, "train", 4)
    _write_split(tmp_path, "valid", 2)
    cfg = _cfg(tmp_path, test_path="valid")
    trainer = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                      use_tensorboard=False)
    try:
        assert trainer._test_loader() is trainer.val_loader
    finally:
        trainer.train_loader.close()


def test_predictor_spatial_size_check():
    """spatial=True with an undersized img_size must fail fast instead of
    silently running an unvalidated sharding regime."""
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.predictor import Predictor

    model = YOLOV5(variant="n", num_classes=2)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False
    )
    mesh = make_mesh(n_data=4, n_model=2)  # needs H >= 128
    with pytest.raises(ValueError, match="spatial"):
        Predictor(model, variables, img_size=96, mesh=mesh, spatial=True)


def test_observability_tb_scalars_and_grids(tmp_path):
    """TB event files must contain the loss components, mAP scalars and the
    per-split sample grids (reference pushes grids to TB/WandB,
    det_trainer.py:110-143)."""
    from tensorboard.backend.event_processing import event_accumulator

    _write_split(tmp_path, "train", 4)
    _write_split(tmp_path, "valid", 2)
    cfg = _cfg(tmp_path)
    trainer = Trainer(cfg, mesh=make_mesh(n_data=1, n_model=1),
                      use_tensorboard=True)
    try:
        trainer.fit()
        trainer.test()
        trainer.tb.flush()
        ea = event_accumulator.EventAccumulator(
            os.path.join(cfg.data.output_dir, "tb"),
            size_guidance={"scalars": 0, "images": 0},
        )
        ea.Reload()
        scalars = set(ea.Tags()["scalars"])
        images = set(ea.Tags()["images"])
        for tag in ("loss", "loss/box", "loss/obj", "loss/cls", "lr",
                    "mAP@.5", "mAP@.5:.95"):
            assert tag in scalars, (tag, scalars)
        for tag in ("samples/train", "samples/val", "samples/test"):
            assert tag in images, (tag, images)
        # the on-disk jpgs exist too (reference writes <split>.jpg)
        for split in ("train", "val", "test"):
            assert os.path.exists(
                os.path.join(cfg.data.output_dir, f"{split}.jpg")
            )
    finally:
        trainer.train_loader.close()


def test_loader_seek_continues_stream(tmp_path):
    """seek(b) on a fresh loader must reproduce exactly the batches a
    continuous run yields from position b (batches are deterministic per
    batch id), and a live loader must reject seek."""
    from vision_kit_tpu.data.datasets import YOLODataset
    from vision_kit_tpu.data.loader import TrainLoader

    _write_split(tmp_path, "train", 8)
    ds = YOLODataset(str(tmp_path / "train"), img_size=(64, 64))

    def make():
        return TrainLoader(ds, 2, img_size=(64, 64), aug_cfg=dict(AUG),
                           seed=7)

    a = make()
    try:
        it = iter(a)
        ref = [next(it) for _ in range(5)]
    finally:
        a.close()

    b = make()
    try:
        b.seek(3)
        itb = iter(b)
        for k in (3, 4):
            got = next(itb)
            np.testing.assert_array_equal(got["image"], ref[k]["image"])
            np.testing.assert_array_equal(got["targets"], ref[k]["targets"])
        with pytest.raises(RuntimeError, match="idle"):
            b.seek(0)
    finally:
        b.close()


def test_crash_resume_matches_uninterrupted_run(tmp_path):
    """Crash mid-training, resume from the crash-save checkpoint: the final
    params must be bit-identical to an uninterrupted run — i.e. resume
    continues the exact data stream (loader seek), LR schedule, EMA and
    optimizer state an uninterrupted run would have."""
    _write_split(tmp_path, "train", 8)
    _write_split(tmp_path, "valid", 2)
    mesh = make_mesh(n_data=1, n_model=1)

    def cfg():
        return _cfg(tmp_path, max_epochs=3, batch_size=2,
                    ckpt_interval=100)

    c = cfg()
    c.testing.val_interval = 100  # no val: isolate the train-path state

    # uninterrupted 3-epoch run (steps_per_epoch = 8/2 = 4)
    tr_a = Trainer(c, mesh=mesh, use_tensorboard=False, seed=5)
    try:
        tr_a.fit()
        ref_leaves = _param_leaves(tr_a)
    finally:
        tr_a.train_loader.close()

    # same config, crash during epoch 2 (0-indexed), before its first
    # real step runs: state == end of epoch 1, meta epoch == 0+1-1 ... the
    # crash handler records the last COMPLETED epoch (1)
    c2 = cfg()
    c2.data.output_dir = str(tmp_path / "out2")
    os.makedirs(c2.data.output_dir, exist_ok=True)
    c2.testing.val_interval = 100
    tr_b = Trainer(c2, mesh=mesh, use_tensorboard=False, seed=5)
    calls = {"n": 0}
    orig = tr_b.train_step

    def exploding(state, batch):
        calls["n"] += 1
        if calls["n"] > 8:  # epochs 0+1 complete (8 steps), die in epoch 2
            raise RuntimeError("boom")
        return orig(state, batch)

    tr_b.train_step = exploding
    with pytest.raises(RuntimeError, match="boom"):
        tr_b.fit()
    tr_b.train_loader.close()
    path = os.path.join(c2.data.output_dir, "ckpts", "last")
    assert os.path.exists(path)

    # resume: must seek the loader to epoch2's first batch id (8) and
    # finish bit-identical to the uninterrupted run
    tr_c = Trainer(c2, mesh=mesh, use_tensorboard=False, seed=5)
    try:
        tr_c.fit(resume=path)
        assert tr_c.train_loader._next_bid >= 8  # stream really fast-forwarded
        res_leaves = _param_leaves(tr_c)
    finally:
        tr_c.train_loader.close()
    for a_leaf, c_leaf in zip(ref_leaves, res_leaves):
        np.testing.assert_array_equal(a_leaf, c_leaf)


def test_early_stop_counter_survives_resume(tmp_path):
    """epochs_no_improve is checkpoint meta: a resumed run keeps counting
    patience where the interrupted run left off."""
    _write_split(tmp_path, "train", 4)
    _write_split(tmp_path, "valid", 2)
    cfg = _cfg(tmp_path)
    mesh = make_mesh(n_data=1, n_model=1)
    tr = Trainer(cfg, mesh=mesh, use_tensorboard=False)
    try:
        tr.epochs_no_improve = 3
        tr.best_map50 = 0.5
        tr.save_checkpoint("last", 0, blocking=True)
    finally:
        tr.train_loader.close()
    tr2 = Trainer(cfg, mesh=mesh, use_tensorboard=False)
    try:
        tr2.load_checkpoint(os.path.join(cfg.data.output_dir, "ckpts", "last"))
        assert tr2.epochs_no_improve == 3
        assert tr2.best_map50 == 0.5
    finally:
        tr2.train_loader.close()
