"""One sustained at-scale training run on the chip (VERDICT r3 #2).

Every correctness artifact in the suite runs at 64-128 px on <=12-image
datasets; the TPU train bench is a step-only measurement. This tool runs
the REAL composition for a sustained stretch: a COCO-scale synthetic set
(2048 train / 256 val images, 24 classes, 640 px), the disk image cache,
device-side augmentation (mosaic/mixup/HSV/flip in the jitted step),
per-epoch validation + checkpointing + early-stop bookkeeping — and
records sustained img/s per epoch, the val mAP curve, and where the time
went (host pipeline vs H2D vs device step).

Expected outcome on THIS harness (documented, not a failure): the tunneled
TPU caps H2D at ~40 MB/s; device_aug ships ~6.1 MB of mosaic tiles per
image, so the sustained rate is tunnel-bound far below the 610 img/s
device-step bench. The run proves the subsystems COMPOSE at scale (cache
build+resume at thousands of images, device-aug feeding, val/ckpt cycling
for an hour) and quantifies each bottleneck; co-located-hardware
projection = min(device step bench, host loader bench).

  python tools/train_at_scale.py                      # full run (~40 min)
  python tools/train_at_scale.py --epochs 2 --images 512   # shorter
  python tools/train_at_scale.py --no-device-aug      # host-aug leg

Run alone (never concurrently with another TPU job — CLAUDE.md).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

CLASSES = [f"{shape}_{color}" for shape in ("rect", "circle", "tri")
           for color in ("red", "green", "blue", "yellow", "cyan",
                         "magenta", "white", "orange")]
COLORS = {
    "red": (0, 0, 220), "green": (0, 200, 0), "blue": (220, 60, 0),
    "yellow": (0, 220, 220), "cyan": (220, 220, 0),
    "magenta": (220, 0, 220), "white": (240, 240, 240),
    "orange": (0, 140, 255),
}


def build_dataset(root: str, n_train: int, n_val: int, size: int = 640,
                  seed: int = 7):
    """Deterministic shapes-on-noise set, YOLO layout. Reused if complete."""
    import cv2

    marker = os.path.join(root, f".complete_{n_train}_{n_val}_{size}")
    if os.path.exists(marker):
        print(f"dataset already built at {root}")
        return
    rng = np.random.default_rng(seed)
    for split, n in (("train", n_train), ("val", n_val)):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
        t0 = time.monotonic()
        for i in range(n):
            img = rng.integers(30, 90, (size, size, 3), np.uint8)
            lines, placed = [], []
            want = int(rng.integers(1, 9))
            for _ in range(60):
                if len(lines) == want:
                    break
                w = int(rng.integers(max(8, size // 16), size * 11 // 32))
                h = int(rng.integers(max(8, size // 16), size * 11 // 32))
                x = int(rng.integers(0, size - 1 - w))
                y = int(rng.integers(0, size - 1 - h))
                ok = True
                for (px, py, pw, ph) in placed:
                    ix = max(0, min(x + w, px + pw) - max(x, px))
                    iy = max(0, min(y + h, py + ph) - max(y, py))
                    if ix * iy > 0.3 * min(w * h, pw * ph):
                        ok = False
                        break
                if not ok:
                    continue
                cls = int(rng.integers(0, len(CLASSES)))
                shape, color = CLASSES[cls].split("_")
                bgr = COLORS[color]
                if shape == "rect":
                    cv2.rectangle(img, (x, y), (x + w, y + h), bgr, -1)
                elif shape == "circle":
                    cv2.ellipse(img, (x + w // 2, y + h // 2),
                                (w // 2, h // 2), 0, 0, 360, bgr, -1)
                else:  # triangle inscribed in the box
                    pts = np.array([[x + w // 2, y], [x, y + h - 1],
                                    [x + w - 1, y + h - 1]], np.int32)
                    cv2.fillPoly(img, [pts], bgr)
                lines.append(
                    f"{cls} {(x + w / 2) / size:.6f} {(y + h / 2) / size:.6f}"
                    f" {w / size:.6f} {h / size:.6f}")
                placed.append((x, y, w, h))
            cv2.imwrite(f"{root}/images/{split}/im{i:05d}.jpg", img,
                        [cv2.IMWRITE_JPEG_QUALITY, 92])
            with open(f"{root}/labels/{split}/im{i:05d}.txt", "w") as f:
                f.write("\n".join(lines))
        print(f"built {split}: {n} images in {time.monotonic() - t0:.0f}s")
    open(marker, "w").close()


class _CurveHandler(logging.Handler):
    """Capture the trainer's per-epoch throughput and mAP log lines."""

    def __init__(self):
        super().__init__()
        self.epochs = []   # (epoch, loss, seconds, img_per_sec)
        self.maps = []     # (map50, map50_95)

    def emit(self, record):
        msg = record.getMessage()
        if msg.startswith("epoch ") and "img/s" in msg:
            try:
                toks = msg.split()
                epoch = int(toks[1].split("/")[0])
                loss = float(toks[3])
                secs = float(toks[-3].rstrip("s"))
                ips = float(toks[-2])
                self.epochs.append((epoch, loss, secs, ips))
            except (ValueError, IndexError):
                pass
        # "epoch N mAP@.5 0.1234 mAP@.5:.95 0.0567" (trainer.py)
        if "mAP@.5 " in msg and "mAP@.5:.95" in msg:
            try:
                toks = msg.split()
                self.maps.append((float(toks[3]), float(toks[5])))
            except (ValueError, IndexError):
                pass


def build_cfg(args, repo: str):
    """Resolve the run config dict + output dir from the CLI args.

    Factored out so the flag semantics are testable without a chip
    (tests/test_round5.py): `--v7` must CLEAR loss_ota (configs/yolov7.yaml
    defaults it to 1 — otherwise --ota is a no-op and the payload's model
    label misreports the loss actually used), `--ota` must set it, and the
    two regimes must write DISTINCT output dirs so their checkpoints can't
    overwrite each other (diff_at_scale picks weights by max mAP in-dir).
    """
    import yaml

    out_dir = os.path.join(
        args.root,
        "out" + ("_v7ota" if args.ota else "_v7" if args.v7 else ""))
    cfg_name = "yolov7.yaml" if args.v7 else "yolov5.yaml"
    cfg = yaml.safe_load(open(os.path.join(repo, "configs", cfg_name)))
    cfg["model"].update(version="base" if args.v7 else "s",
                        num_classes=len(CLASSES),
                        input_size=[args.img, args.img], weight="")
    if args.v7:
        cfg["hypermeters"]["loss_ota"] = 1 if args.ota else 0
    cfg["data"].update(
        data_format="yolo", data_dir=args.root, output_dir=out_dir,
        train_path="images/train", val_path="images/val",
        test_path="images/val", batch_size=args.batch,
        max_epochs=args.epochs, num_workers=args.workers,
        class_labels=CLASSES, ckpt_interval=1,
    )
    if not args.no_cache:
        cfg["data"]["cache_images"] = "disk"
    if not args.no_device_aug:
        cfg["data"]["device_aug"] = True
        # device_aug requires degrees=0/shear=0 (data/device_aug.py)
        cfg["augmentations"].update(degrees=0.0, shear=0.0)
    cfg["testing"]["val_interval"] = 1
    return cfg, out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="/tmp/vk_scale_ds")
    ap.add_argument("--images", type=int, default=2048)
    ap.add_argument("--val-images", type=int, default=256)
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--img", type=int, default=640)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--no-device-aug", action="store_true")
    ap.add_argument("--no-cache", action="store_true")
    ap.add_argument("--v7", action="store_true",
                    help="YOLOv7-base instead of v5s (VERDICT r4 #3)")
    ap.add_argument("--ota", action="store_true",
                    help="SimOTA loss (hypermeters.loss_ota: 1; implies "
                         "--v7)")
    ap.add_argument("--out", default="/tmp/train_at_scale.json")
    args = ap.parse_args()
    if args.ota:
        args.v7 = True

    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()

    build_dataset(args.root, args.images, args.val_images, args.img)

    import yaml

    import jax

    from vision_kit_tpu.train.evaluator import DetEvaluator
    from vision_kit_tpu.train.trainer import Trainer
    from vision_kit_tpu.utils.config import load_config
    from vision_kit_tpu.utils.general import update_loss_cfg

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg, out_dir = build_cfg(args, repo)
    cfg_path = os.path.join(args.root, "cfg.yaml")
    yaml.safe_dump(cfg, open(cfg_path, "w"))
    c = update_loss_cfg(load_config(cfg_path))
    os.makedirs(out_dir, exist_ok=True)
    c.data.output_dir = out_dir

    curve = _CurveHandler()
    logging.getLogger("vision_kit_tpu").addHandler(curve)
    logging.getLogger("vision_kit_tpu").setLevel(logging.INFO)
    logging.basicConfig(level=logging.INFO)

    ev = DetEvaluator(class_labels=CLASSES, img_size=(args.img, args.img))
    t_build = time.monotonic()
    tr = Trainer(c, evaluator=ev, use_tensorboard=False, seed=0)
    t0 = time.monotonic()
    try:
        tr.fit()
    finally:
        tr.train_loader.close()
    wall = time.monotonic() - t0

    n_epochs_run = len(curve.epochs)
    total_imgs = n_epochs_run * args.images
    sustained = total_imgs / wall if wall > 0 else 0.0
    steady = [ips for (_, _, _, ips) in curve.epochs[1:]] or \
        [ips for (_, _, _, ips) in curve.epochs]
    payload = {
        "platform": jax.devices()[0].platform,
        "model": ("yolov7-base" if args.v7 else "yolov5-s")
                 + ("+ota" if args.ota else ""),
        "images": args.images, "classes": len(CLASSES), "img": args.img,
        "batch": args.batch, "epochs_run": n_epochs_run,
        "device_aug": not args.no_device_aug,
        "cache_images": None if args.no_cache else "disk",
        "dataset_build_plus_cache_s": round(t0 - t_build, 1),
        "wall_s": round(wall, 1),
        "sustained_img_per_sec": round(sustained, 1),
        "steady_state_img_per_sec": round(float(np.mean(steady)), 1),
        "per_epoch": [
            {"epoch": e, "loss": l, "s": s, "img_per_sec": i}
            for (e, l, s, i) in curve.epochs
        ],
        "map_curve": [{"map50": a, "map50_95": b} for a, b in curve.maps],
    }
    with open(args.out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))


if __name__ == "__main__":
    main()
