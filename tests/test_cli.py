"""CLI-layer e2e: scripts/main.py driven as a subprocess on a tiny
synthetic YOLO dataset (the unit suites cover Trainer in-process; this
covers argparse, seed resolution, config mutation, run dirs and task
dispatch — the layer where a --seed default regression once hid).

Kept cheap: 64x64 v5n, 4 images, 1 epoch, no workers; the subprocess
shares the repo's persistent compilation cache (utils/jax_platform.
setup_compilation_cache), so repeat runs skip the big compiles.
"""

import os
import subprocess
import sys

import cv2
import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_dataset(root):
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        for i in range(4):
            img = np.full((96, 128, 3), 60, np.uint8)
            w, h = int(rng.integers(16, 40)), int(rng.integers(16, 40))
            x, y = int(rng.integers(0, 127 - w)), int(rng.integers(0, 95 - h))
            c = int(rng.integers(0, 2))
            color = (0, 0, 255) if c == 0 else (0, 255, 0)
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            cv2.imwrite(f"{root}/images/{split}/im{i}.jpg", img)
            line = (f"{c} {(x + w / 2) / 128:.6f} {(y + h / 2) / 96:.6f} "
                    f"{w / 128:.6f} {h / 96:.6f}")
            with open(f"{root}/labels/{split}/im{i}.txt", "w") as f:
                f.write(line)


def _make_cfg(path, ds_root, out_root, seed=None):
    base = yaml.safe_load(open(os.path.join(REPO, "configs/yolov5.yaml")))
    base["model"].update(version="n", num_classes=2, input_size=[64, 64],
                         weight="")
    base["data"].update(
        data_format="yolo", data_dir=ds_root, output_dir=out_root,
        train_path="images/train", val_path="images/val",
        test_path="images/val", batch_size=2, max_epochs=1, num_workers=0,
        class_labels=["red", "green"],
    )
    if seed is not None:
        base["data"]["seed"] = seed
    base["testing"]["val_interval"] = 1
    yaml.safe_dump(base, open(path, "w"))


@pytest.mark.slow
def test_main_cli_train(tmp_path):
    ds = str(tmp_path / "ds")
    out = str(tmp_path / "out")
    cfg = str(tmp_path / "cfg.yaml")
    _make_dataset(ds)
    _make_cfg(cfg, ds, out, seed=7)

    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/main.py"), "train",
         "-c", cfg],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    log = r.stdout + r.stderr
    # cfg data.seed must be honored when --seed is absent
    assert "Global seed set to 7" in log, log[-3000:]
    assert "mAP@.5" in log
    run_dirs = os.listdir(os.path.join(out, "YOLOv5", "train"))
    assert len(run_dirs) == 1
    run = os.path.join(out, "YOLOv5", "train", run_dirs[0])
    assert os.path.isdir(os.path.join(run, "ckpts"))
    assert os.path.isfile(os.path.join(run, "log.log"))

    # demo --config leg: the trained custom-dataset weights (2 classes,
    # 64x64) must demo with the config they were trained with — this is
    # the reference's demo.py surface generalized past COCO-80 defaults
    weights_dir = os.path.join(run, "weights")
    weights = [f for f in os.listdir(weights_dir) if f.endswith(".msgpack")]
    assert weights, os.listdir(run)
    out_img = str(tmp_path / "demo_out.jpg")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts/demo.py"),
         "-p", os.path.join(ds, "images/val/im0.jpg"),
         "-c", cfg, "-w", os.path.join(weights_dir, weights[0]),
         "--conf", "0.05", "-o", out_img],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "detections in" in r.stdout, r.stdout[-2000:]
    assert os.path.isfile(out_img)
