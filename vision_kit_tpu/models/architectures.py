"""Full detector assemblies and the model factory.

Counterpart of vision_kit/models/architectures/{__init__,yolov5,yolov7}.py.
Models are pure Flax modules: backbone -> neck -> head, params as pytrees.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vision_kit_tpu.models.backbones import CSPDarknet, V7Backbone
from vision_kit_tpu.models.heads import YoloV5Head, YoloV7Head
from vision_kit_tpu.models.necks import PAFPN, PAFPNELAN
from vision_kit_tpu.utils.general import dw_multiple_generator


class YOLOV5(nn.Module):
    """YOLOv5 n/s/m/l/x (reference architectures/yolov5.py:14-46)."""

    variant: str = "s"
    act: str = "silu"
    num_classes: int = 80
    export: bool = False
    decode_order: str = "native"
    dtype: Any = jnp.float32

    def setup(self):
        wid_mul, dep_mul = dw_multiple_generator(self.variant)
        self.backbone = CSPDarknet(
            depth_mul=dep_mul, width_mul=wid_mul, act=self.act, dtype=self.dtype
        )
        self.neck = PAFPN(
            depth_mul=dep_mul, width_mul=wid_mul, act=self.act, dtype=self.dtype
        )
        self.head = YoloV5Head(
            num_classes=self.num_classes, width=wid_mul, export=self.export,
            decode_order=self.decode_order, dtype=self.dtype,
        )

    def __call__(self, x, training: bool = False):
        feats = self.backbone(x, training)
        feats = self.neck(feats, training)
        return self.head(feats, training)

    @property
    def grid_anchors(self):
        return YoloV5Head(num_classes=self.num_classes).grid_anchors

    @property
    def anchors_px(self):
        """(nl, na, 2) pixel-unit anchors exactly as the eval decode uses
        them (for ops.nms.postprocess_raw)."""
        import numpy as np

        return self.grid_anchors * np.asarray(self.strides).reshape(-1, 1, 1)

    @property
    def strides(self):
        return (8.0, 16.0, 32.0)


class YOLOV7(nn.Module):
    """YOLOv7 base/x (reference architectures/yolov7.py:17-48)."""

    variant: str = "base"
    act: str = "silu"
    num_classes: int = 80
    deploy: bool = False
    export: bool = False
    decode_order: str = "native"
    dtype: Any = jnp.float32

    def setup(self):
        self.backbone = V7Backbone(
            variant=self.variant, act=self.act, dtype=self.dtype
        )
        self.neck = PAFPNELAN(
            variant=self.variant, act=self.act, deploy=self.deploy,
            dtype=self.dtype,
        )
        self.head = YoloV7Head(
            variant=self.variant, num_classes=self.num_classes,
            deploy=self.deploy, export=self.export,
            decode_order=self.decode_order, dtype=self.dtype,
        )

    def __call__(self, x, training: bool = False):
        feats = self.backbone(x, training)
        feats = self.neck(feats, training)
        return self.head(feats, training)

    @property
    def grid_anchors(self):
        return YoloV7Head(variant=self.variant).grid_anchors

    @property
    def anchors_px(self):
        """v7 decode uses the RAW pixel anchors, cloned before
        check_anchor_order (see YoloV7Head docstring)."""
        import numpy as np

        from vision_kit_tpu.models.heads import V7_ANCHORS

        na = len(V7_ANCHORS[0]) // 2
        return np.asarray(V7_ANCHORS, np.float32).reshape(
            len(V7_ANCHORS), na, 2
        )

    @property
    def strides(self):
        return (8.0, 16.0, 32.0)


def build_model(cfg, export: bool = False, dtype=jnp.float32,
                decode_order: str = "native"):
    """Dispatch on cfg.model.name, mirroring reference
    architectures/__init__.py:7-26."""
    name = cfg.model.name
    if name == "YOLOv5":
        return YOLOV5(
            variant=cfg.model.version,
            act=cfg.model.act,
            num_classes=cfg.model.num_classes,
            export=export,
            decode_order=decode_order,
            dtype=dtype,
        )
    if name == "YOLOv7":
        return YOLOV7(
            variant=cfg.model.version,
            act=cfg.model.act,
            num_classes=cfg.model.num_classes,
            deploy=bool(cfg.model.deploy),
            export=export,
            decode_order=decode_order,
            dtype=dtype,
        )
    raise NotImplementedError(f"Unknown model {name!r}")
