"""Shared trained-fixture recipes — NO import side effects.

Used by BOTH tests/conftest.py (session fixtures, forced-CPU pytest
environment) and tools/train_v7_fixture.py (standalone producer that may
run on the real TPU). The v7-base training recipe lives here once so the
cache a TPU run writes is exactly what the pytest fixture would have
trained on CPU: same dataset, same config, same seed.

Why a disk cache at all: v7-base fwd+bwd at 64 px costs ~15 s/step on this
single-core host — the ~300-step convergence run is hours on CPU but
minutes on the chip. The cache (.test_cache/, gitignored) makes the trained
weights a build artifact: produced once (preferably on TPU), consumed by
every subsequent pytest session, re-trained from scratch only when neither
cache nor tunnel exists.
"""

from __future__ import annotations

import hashlib
import json
import os

import numpy as np

# bump to invalidate every cached fixture (dataset or recipe change)
RECIPE_VERSION = "v1"


def build_rectangle_dataset(root):
    """12 solid-rectangle images (1-3 boxes each, class = color), YOLO
    layout, deterministic. Multi-box images matter: the trained weights
    feed the crowded-NMS parity differentials and a model that never saw
    two objects in one image detects poorly on crowded scenes."""
    import cv2

    rng = np.random.default_rng(3)
    for split in ("train", "val"):
        os.makedirs(f"{root}/images/{split}", exist_ok=True)
        os.makedirs(f"{root}/labels/{split}", exist_ok=True)
    for i in range(12):
        img = np.full((64, 64, 3), 60, np.uint8)
        lines, placed = [], []
        want = 1 + i % 3
        for _ in range(40):  # rejection sampling until `want` boxes fit
            if len(lines) == want:
                break
            w, h = int(rng.integers(16, 35)), int(rng.integers(16, 35))
            x, y = int(rng.integers(0, 63 - w)), int(rng.integers(0, 63 - h))
            ok = True
            for (px, py, pw, ph) in placed:
                ix = max(0, min(x + w, px + pw) - max(x, px))
                iy = max(0, min(y + h, py + ph) - max(y, py))
                inter = ix * iy
                if (inter / (w * h + pw * ph - inter) > 0.2
                        or inter / (pw * ph) > 0.3):
                    ok = False
                    break
            if not ok:
                continue
            c = int(rng.integers(0, 2))
            color = (0, 0, 255) if c == 0 else (0, 255, 0)
            cv2.rectangle(img, (x, y), (x + w, y + h), color, -1)
            lines.append(f"{c} {(x + w / 2) / 64:.6f} {(y + h / 2) / 64:.6f} "
                         f"{w / 64:.6f} {h / 64:.6f}")
            placed.append((x, y, w, h))
        for split in ("train", "val"):
            cv2.imwrite(f"{root}/images/{split}/im{i}.jpg", img)
            with open(f"{root}/labels/{split}/im{i}.txt", "w") as f:
                f.write("\n".join(lines))


# ---------------------------------------------------------------------------
# v7-base trained fixture recipe
# ---------------------------------------------------------------------------

V7_RECIPE = {
    "version": "base",
    "num_classes": 2,
    "input": 64,
    "batch": 12,
    "max_epochs": 600,
    "val_interval": 50,
    "patience": 3,          # 3 plateaued validations end the run early
    "seed": 0,
    "dataset": RECIPE_VERSION,
}


def v7_recipe_hash(loss_ota: int) -> str:
    payload = dict(V7_RECIPE, loss_ota=int(loss_ota))
    return hashlib.md5(
        json.dumps(payload, sort_keys=True).encode()
    ).hexdigest()[:12]


def v7_cache_base(repo_root: str, loss_ota: int) -> str:
    tag = "ota" if loss_ota else "plain"
    return os.path.join(repo_root, ".test_cache", f"trained_v7base_{tag}")


def v7_template():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV7

    model = YOLOV7(variant=V7_RECIPE["version"],
                   num_classes=V7_RECIPE["num_classes"], deploy=False)
    s = V7_RECIPE["input"]
    return model, model.init(jax.random.PRNGKey(0), jnp.zeros((1, s, s, 3)),
                             training=False)


def load_v7_cache(repo_root: str, loss_ota: int):
    """Return (variables, meta) from a valid cache, else None."""
    from flax import serialization

    base = v7_cache_base(repo_root, loss_ota)
    msg, meta_path = base + ".msgpack", base + ".json"
    if not (os.path.isfile(msg) and os.path.isfile(meta_path)):
        return None
    try:
        with open(meta_path) as f:
            meta = json.load(f)
        if meta.get("recipe_hash") != v7_recipe_hash(loss_ota):
            return None
        _, template = v7_template()
        with open(msg, "rb") as f:
            variables = serialization.from_bytes(template, f.read())
        return variables, meta
    except Exception:
        return None


def save_v7_cache(repo_root: str, loss_ota: int, variables, meta: dict):
    import jax
    from flax import serialization

    base = v7_cache_base(repo_root, loss_ota)
    os.makedirs(os.path.dirname(base), exist_ok=True)
    tmp = base + ".msgpack.tmp"
    with open(tmp, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))
    os.replace(tmp, base + ".msgpack")
    meta = dict(meta, recipe_hash=v7_recipe_hash(loss_ota))
    tmp = base + ".json.tmp"
    with open(tmp, "w") as f:
        json.dump(meta, f, indent=1)
    os.replace(tmp, base + ".json")


def train_v7(workdir: str, repo_root: str, loss_ota: int,
             max_epochs: int | None = None, log=print):
    """Run the fixture training (on whatever backend jax is using) and
    return (ema_variables, final_validate_result). Deterministic recipe —
    the ONLY intended nondeterminism across backends is float arithmetic."""
    import yaml

    import jax

    from vision_kit_tpu.train.evaluator import DetEvaluator
    from vision_kit_tpu.train.trainer import Trainer
    from vision_kit_tpu.utils.config import load_config
    from vision_kit_tpu.utils.general import update_loss_cfg

    r = V7_RECIPE
    ds, out = os.path.join(workdir, "ds"), os.path.join(workdir, "out")
    build_rectangle_dataset(ds)
    cfg = yaml.safe_load(
        open(os.path.join(repo_root, "configs/yolov7.yaml")))
    cfg["model"].update(version=r["version"], num_classes=r["num_classes"],
                        input_size=[r["input"], r["input"]], weight="")
    cfg["data"].update(
        data_format="yolo", data_dir=ds, output_dir=out,
        train_path="images/train", val_path="images/val",
        test_path="images/val", batch_size=r["batch"],
        max_epochs=int(max_epochs or r["max_epochs"]),
        num_workers=0, class_labels=["red", "green"], ckpt_interval=10_000,
    )
    cfg["testing"].update(val_interval=r["val_interval"],
                          patience=r["patience"])
    cfg["hypermeters"]["loss_ota"] = int(loss_ota)
    # no augmentation: pure optimization signal (1 step/epoch; the first
    # 100 steps are lr/momentum warmup — see train/optim.py)
    cfg["augmentations"].update(
        mosaic_prob=0.0, mixup_prob=0.0, hsv_prob=0.0, flip_lr_prob=0.0,
        translate=0.0, scale=0.0, enable_mosaic=False, enable_mixup=False,
    )
    path = os.path.join(workdir, "cfg.yaml")
    yaml.safe_dump(cfg, open(path, "w"))
    c = update_loss_cfg(load_config(path))
    os.makedirs(out, exist_ok=True)
    c.data.output_dir = out

    ev = DetEvaluator(class_labels=["red", "green"],
                      img_size=(r["input"], r["input"]))
    tr = Trainer(c, evaluator=ev, use_tensorboard=False, seed=r["seed"])
    try:
        log(f"training v7-{r['version']} loss_ota={loss_ota} on "
            f"{jax.devices()[0].platform}...")
        tr.fit()
        result = tr.validate()
        variables = jax.device_get(tr.state.ema.tree)
        steps = int(tr.global_step)
    finally:
        tr.train_loader.close()
    return variables, result, steps
