"""Necks: PAFPN (YOLOv5) and PAFPN-ELAN (YOLOv7), in Flax NHWC.

Behavioral counterparts of vision_kit/models/necks/pafpn.py and
pafpn_elan.py: top-down FPN + bottom-up PAN with nearest 2x upsampling.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from vision_kit_tpu.models.layers import (
    ELAN,
    SPPCSPC,
    C3Bottleneck,
    ConvBnAct,
    DWConvModule,
    MPx3Conv,
    RepConv,
    upsample_nearest_2x,
)


class PAFPN(nn.Module):
    """YOLOv5 PANet neck (reference pafpn.py:10-96)."""

    depth_mul: float
    width_mul: float
    in_chs: Sequence[int] = (256, 512, 1024)
    act: str = "silu"
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, training: bool = False):
        c3, c4, c5 = feats
        base_depth = max(round(self.depth_mul * 3), 1)
        out_chs = [int(c * self.width_mul) for c in self.in_chs]

        def conv(outs, k, s, name):
            if self.depthwise:
                return DWConvModule(
                    outs, k, s, act=self.act, dtype=self.dtype, name=name
                )
            return ConvBnAct(
                outs, k, s, act=self.act, dtype=self.dtype, name=name
            )

        def c3block(outs, name):
            return C3Bottleneck(
                outs, n=base_depth, shortcut=False, act=self.act,
                dtype=self.dtype, name=name,
            )

        fpn_out0 = ConvBnAct(
            out_chs[1], 1, 1, act=self.act, dtype=self.dtype,
            name="lateral_conv0",
        )(c5, training)
        f_out0 = upsample_nearest_2x(fpn_out0)
        f_out0 = jnp.concatenate([f_out0, c4], axis=-1)
        f_out0 = c3block(out_chs[1], "C3_p4")(f_out0, training)

        fpn_out1 = ConvBnAct(
            out_chs[0], 1, 1, act=self.act, dtype=self.dtype,
            name="reduce_conv1",
        )(f_out0, training)
        f_out1 = upsample_nearest_2x(fpn_out1)
        f_out1 = jnp.concatenate([f_out1, c3], axis=-1)
        pan_out2 = c3block(out_chs[0], "C3_p3")(f_out1, training)

        p_out1 = conv(out_chs[0], 3, 2, "bu_conv2")(pan_out2, training)
        p_out1 = jnp.concatenate([p_out1, fpn_out1], axis=-1)
        pan_out1 = c3block(out_chs[1], "C3_n3")(p_out1, training)

        p_out0 = conv(out_chs[1], 3, 2, "bu_conv1")(pan_out1, training)
        p_out0 = jnp.concatenate([p_out0, fpn_out0], axis=-1)
        pan_out0 = c3block(out_chs[2], "C3_n4")(p_out0, training)

        return pan_out2, pan_out1, pan_out0


V7_NECK_CFG = {
    "base": {"in_chs": (512, 1024), "out_chs": (256, 512, 1024),
             "elan_depth": 4},
    "x": {"in_chs": (640, 1280), "out_chs": (320, 640, 1280),
          "elan_depth": 6},
}


class PAFPNELAN(nn.Module):
    """YOLOv7 ELAN-PAN neck (reference pafpn_elan.py:10-118)."""

    variant: str = "base"
    act: str = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats, training: bool = False):
        p3, p4, p5 = feats
        cfg = V7_NECK_CFG[self.variant.lower()]
        in_chs, out_chs, depth = cfg["in_chs"], cfg["out_chs"], cfg["elan_depth"]

        def cba(outs, k, s, name):
            return ConvBnAct(
                outs, k, s, act=self.act, dtype=self.dtype, name=name
            )

        x_sppcspc = SPPCSPC(out_chs[1], act=self.act, dtype=self.dtype,
                            name="sppcspc")(p5, training)

        fpn_out1 = cba(out_chs[0], 1, 1, "lateral_conv")(x_sppcspc, training)
        f_out1 = upsample_nearest_2x(fpn_out1)
        r_p4 = cba(out_chs[0], 1, 1, "route_p4")(p4, training)
        f_out1 = jnp.concatenate([r_p4, f_out1], axis=-1)
        f_out1 = ELAN(256, out_chs[0], act=self.act, depth=depth,
                      dtype=self.dtype, name="lateral_elan")(f_out1, training)

        fpn_out2 = cba(out_chs[0] // 2, 1, 1, "reduce_conv")(f_out1, training)
        f_out2 = upsample_nearest_2x(fpn_out2)
        r_p3 = cba(out_chs[0] // 2, 1, 1, "route_p3")(p3, training)
        f_out2 = jnp.concatenate([r_p3, f_out2], axis=-1)
        pan_out2 = ELAN(128, out_chs[0] // 2, act=self.act, depth=depth,
                        dtype=self.dtype, name="reduce_elan")(f_out2, training)

        x_79, x_77 = MPx3Conv(out_chs[0] // 2, act=self.act, dtype=self.dtype,
                              name="mp_3xconvs_1")(pan_out2, training)
        p_out1 = jnp.concatenate([x_79, x_77, f_out1], axis=-1)
        pan_out1 = ELAN(256, out_chs[0], act=self.act, depth=depth,
                        dtype=self.dtype, name="bu_elan1")(p_out1, training)

        x_92, x_90 = MPx3Conv(out_chs[0], act=self.act, dtype=self.dtype,
                              name="mp_3xconvs_2")(pan_out1, training)
        p_out2 = jnp.concatenate([x_92, x_90, x_sppcspc], axis=-1)
        pan_out0 = ELAN(512, out_chs[1], act=self.act, depth=depth,
                        dtype=self.dtype, name="bu_elan2")(p_out2, training)

        if self.variant.lower() == "base":
            pan_out2 = RepConv(out_chs[0], act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="pan_conv2")(
                pan_out2, training)
            pan_out1 = RepConv(out_chs[1], act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="pan_conv1")(
                pan_out1, training)
            pan_out0 = RepConv(out_chs[2], act=self.act, deploy=self.deploy,
                               dtype=self.dtype, name="pan_conv0")(
                pan_out0, training)
        else:
            pan_out2 = cba(out_chs[0], 3, 1, "pan_conv2")(pan_out2, training)
            pan_out1 = cba(out_chs[1], 3, 1, "pan_conv1")(pan_out1, training)
            pan_out0 = cba(out_chs[2], 3, 1, "pan_conv0")(pan_out0, training)

        return pan_out2, pan_out1, pan_out0
