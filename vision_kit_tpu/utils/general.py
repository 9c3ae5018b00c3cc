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


def update_loss_cfg(cfg):
    """Scale loss gains by layer count / class count / image size
    (reference general.py:9-15). Mutates and returns cfg."""
    nl = 3
    cfg.hypermeters.box *= 3 / nl
    cfg.hypermeters.cls *= cfg.model.num_classes / 80 * 3 / nl
    cfg.hypermeters.obj *= (cfg.model.input_size[0] / 640) ** 2 * 3 / nl
    return cfg


def mk_output_dir(path: str, model_name: str, task: str) -> str:
    """outputs/<model>/<task>/<YYYYmmddHHMM> (reference general.py:42-47)."""
    out = os.path.join(path, model_name, task, datetime.now().strftime("%Y%m%d%H%M"))
    os.makedirs(out, exist_ok=True)
    return out
