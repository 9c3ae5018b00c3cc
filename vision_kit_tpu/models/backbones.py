"""Backbones: CSPDarknet (YOLOv5) and E-ELAN backbone (YOLOv7), in Flax NHWC.

Behavioral counterparts of the reference's
vision_kit/models/backbones/csp_darknet.py and yolov7.py. Returns the
(P3, P4, P5) multi-scale features at strides 8/16/32.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from vision_kit_tpu.models.layers import (
    ELAN,
    SPP,
    SPPF,
    C3Bottleneck,
    ConvBnAct,
    DWConvModule,
    Focus,
    MPx3Conv,
)


class CSPDarknet(nn.Module):
    """CSPDarknet-53-style backbone (reference csp_darknet.py:11-118).

    Width/depth scaled by the v5 multipliers; stem is a 6x6/s2 conv (or
    Focus when `with_focus`), SPPF tail on stage4.
    """

    depth_mul: float
    width_mul: float
    act: str = "silu"
    depthwise: bool = False
    with_focus: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        base_ch = int(self.width_mul * 64)
        base_depth = max(round(self.depth_mul * 3), 1)
        Conv = DWConvModule if self.depthwise else ConvBnAct

        def conv(outs, kernel, stride, name):
            if self.depthwise:
                return DWConvModule(
                    outs, kernel, stride, act=self.act, dtype=self.dtype,
                    name=name,
                )
            return ConvBnAct(
                outs, kernel, stride, act=self.act, dtype=self.dtype, name=name
            )

        if self.with_focus:
            c1 = Focus(base_ch, kernel=3, act=self.act, dtype=self.dtype,
                       name="stem")(x, training)
        else:
            c1 = ConvBnAct(
                base_ch, kernel=6, stride=2, padding=2, s2d=True,
                dtype=self.dtype, name="stem",
            )(x, training)

        c2 = conv(base_ch * 2, 3, 2, "stage1_0")(c1, training)
        c2 = C3Bottleneck(
            base_ch * 2, n=base_depth, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype, name="stage1_1",
        )(c2, training)

        c3 = conv(base_ch * 4, 3, 2, "stage2_0")(c2, training)
        c3 = C3Bottleneck(
            base_ch * 4,
            n=base_depth * 3 if self.with_focus else base_depth * 2,
            act=self.act, depthwise=self.depthwise, dtype=self.dtype,
            name="stage2_1",
        )(c3, training)

        c4 = conv(base_ch * 8, 3, 2, "stage3_0")(c3, training)
        c4 = C3Bottleneck(
            base_ch * 8, n=base_depth * 3, act=self.act,
            depthwise=self.depthwise, dtype=self.dtype, name="stage3_1",
        )(c4, training)

        c5 = conv(base_ch * 16, 3, 2, "stage4_0")(c4, training)
        if self.with_focus:
            c5 = SPP(base_ch * 16, act=self.act, dtype=self.dtype,
                     name="stage4_1")(c5, training)
            c5 = C3Bottleneck(
                base_ch * 16, n=base_depth, shortcut=False, act=self.act,
                depthwise=self.depthwise, dtype=self.dtype, name="stage4_2",
            )(c5, training)
        else:
            c5 = C3Bottleneck(
                base_ch * 16, n=base_depth, act=self.act,
                depthwise=self.depthwise, dtype=self.dtype, name="stage4_1",
            )(c5, training)
            c5 = SPPF(base_ch * 16, kernel=5, dtype=self.dtype,
                      name="stage4_2")(c5, training)

        return c3, c4, c5


V7_BACKBONE_CFG = {
    "tiny": {"base_chs": 32, "elan_depth": 2},
    "base": {"base_chs": 32, "elan_depth": 4},
    "x": {"base_chs": 40, "elan_depth": 6},
}


class V7Backbone(nn.Module):
    """YOLOv7 E-ELAN backbone (reference backbones/yolov7.py:8-99)."""

    variant: str = "base"
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        cfg = V7_BACKBONE_CFG[self.variant.lower()]
        bc, depth = cfg["base_chs"], cfg["elan_depth"]

        def cba(outs, k, s, name):
            return ConvBnAct(
                outs, k, s, act=self.act, dtype=self.dtype, name=name
            )

        x = cba(bc, 3, 1, "stem")(x, training)
        p1 = cba(bc * 2, 3, 2, "stage1_0")(x, training)
        p1 = cba(bc * 2, 3, 1, "stage1_1")(p1, training)
        p1 = cba(bc * 4, 3, 2, "stage1_2")(p1, training)

        p2 = ELAN(64, bc * 8, depth=depth, dtype=self.dtype, name="stage2")(
            p1, training
        )
        p2_1, p2_2 = MPx3Conv(bc * 4, act=self.act, dtype=self.dtype,
                              name="stage2_1")(p2, training)
        p2c = jnp.concatenate([p2_1, p2_2], axis=-1)

        p3 = ELAN(128, bc * 16, depth=depth, dtype=self.dtype, name="stage3")(
            p2c, training
        )
        p3_1, p3_2 = MPx3Conv(bc * 8, act=self.act, dtype=self.dtype,
                              name="stage3_1")(p3, training)
        p3c = jnp.concatenate([p3_1, p3_2], axis=-1)

        p4 = ELAN(256, bc * 32, depth=depth, dtype=self.dtype, name="stage4")(
            p3c, training
        )
        p4_1, p4_2 = MPx3Conv(bc * 16, act=self.act, dtype=self.dtype,
                              name="stage4_1")(p4, training)
        p4c = jnp.concatenate([p4_1, p4_2], axis=-1)

        p5 = ELAN(256, bc * 32, depth=depth, dtype=self.dtype, name="stage5")(
            p4c, training
        )
        return p3, p4, p5
