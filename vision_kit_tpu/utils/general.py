"""General helpers: variant multipliers, run dirs, loss-gain scaling.

Counterpart of vision_kit/utils/general.py.
"""

from __future__ import annotations

import os
from datetime import datetime


def dw_multiple_generator(version: str = "s") -> tuple[float, float]:
    """(width_mul, depth_mul) for YOLOv5 variants (reference general.py:50-70).

    n=(0.25, 0.33), s=(0.50, 0.33), m=(0.75, 0.67), l=(1.00, 1.00),
    x=(1.25, 1.33).
    """
    width, depth = 0.25, 0.33
    v = version.lower()
    if v == "s":
        depth *= 1.01
        width *= 2
    elif v == "m":
        depth *= 2.02
        width *= 3
    elif v == "l":
        depth *= 3.03
        width *= 4
    elif v == "x":
        depth *= 4.04
        width *= 5
    elif v == "n":
        pass
    else:
        raise ValueError(f"YOLOv5 variant {version!r} is not supported")
    return width, round(depth, 2)


def update_loss_cfg(cfg, nl: int | None = None):
    """Scale loss gains by layer count / class count / image size
    (reference general.py:9-15). Mutates and returns cfg.

    nl is the number of detection levels. The reference derives it from the
    built model's head (`de_parallel(model.head).nl`); here it comes from the
    same anchor table the head is built from, so a future P6-style 4-level
    head cannot silently mis-scale the gains. Pass nl explicitly for a
    custom head.
    """
    if nl is None:
        from vision_kit_tpu.models.heads import V5_ANCHORS, V7_ANCHORS

        name = str(cfg.model.name).lower()
        anchors = {"yolov5": V5_ANCHORS, "yolov7": V7_ANCHORS}.get(name)
        assert anchors is not None, (
            f"update_loss_cfg cannot derive nl for model {cfg.model.name!r}; "
            "pass nl= explicitly"
        )
        nl = len(anchors)
    assert nl >= 1, f"nl must be >= 1, got {nl}"
    cfg.hypermeters.box *= 3 / nl
    cfg.hypermeters.cls *= cfg.model.num_classes / 80 * 3 / nl
    cfg.hypermeters.obj *= (cfg.model.input_size[0] / 640) ** 2 * 3 / nl
    return cfg


def coco80_to_coco91_class() -> list[int]:
    """Map contiguous 80-class index -> original COCO-91 category id
    (reference utils/dataset_utils.py:10-33)."""
    return [
        1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 13, 14, 15, 16, 17, 18, 19, 20,
        21, 22, 23, 24, 25, 27, 28, 31, 32, 33, 34, 35, 36, 37, 38, 39, 40,
        41, 42, 43, 44, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55, 56, 57, 58,
        59, 60, 61, 62, 63, 64, 65, 67, 70, 72, 73, 74, 75, 76, 77, 78, 79,
        80, 81, 82, 84, 85, 86, 87, 88, 89, 90,
    ]


def mk_output_dir(path: str, model_name: str, task: str) -> str:
    """outputs/<model>/<task>/<YYYYmmddHHMM> (reference general.py:42-47)."""
    out = os.path.join(path, model_name, task, datetime.now().strftime("%Y%m%d%H%M"))
    os.makedirs(out, exist_ok=True)
    return out


def exif_size(img) -> tuple[int, int]:
    """EXIF-orientation-corrected (width, height) of a PIL image
    (reference utils/general.py:24-31): orientations 6/8 (90/270 deg)
    swap the stored dimensions."""
    import contextlib

    from PIL import ExifTags

    orientation_tag = next(
        k for k, v in ExifTags.TAGS.items() if v == "Orientation"
    )
    s = img.size
    with contextlib.suppress(Exception):
        rotation = dict(img._getexif().items())[orientation_tag]
        if rotation in (6, 8):
            s = (s[1], s[0])
    return s
