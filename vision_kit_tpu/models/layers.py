"""Reusable detection blocks in Flax (NHWC, TPU-native).

Re-implements the behavior of the reference block zoo
(vision_kit/models/modules/blocks.py, bottlenecks.py) with JAX/XLA idioms:
channels-last layout, static shapes, functional BatchNorm state, and
compile-time-fused activation epilogues. Submodule attribute names mirror the
reference's torch module paths (nn.Sequential index i -> suffix `_i`) so that
`.pt` state_dicts convert by direct key translation (see convert.py).

BatchNorm matches reference init_weights (model_utils.py:52-54): eps 1e-3,
torch momentum 0.03 (flax momentum = 0.97).
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

BN_EPS = 1e-3
BN_MOMENTUM = 0.97  # flax decay == 1 - torch momentum (0.03)


def get_act(name: str) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Activation registry, mirroring model_utils.py:18-25."""
    acts = {
        "relu": jax.nn.relu,
        "relu6": lambda x: jnp.clip(x, 0.0, 6.0),
        "leaky_relu": lambda x: jax.nn.leaky_relu(x, negative_slope=0.01),
        "silu": jax.nn.silu,
        "hard_swish": jax.nn.hard_swish,
        "none": lambda x: x,
    }
    if name not in acts:
        raise ValueError(f"Activation {name!r} not implemented")
    return acts[name]


def auto_pad(kernel: int, padding: int | None = None) -> int:
    return kernel // 2 if padding is None else padding


# torch Conv2d default init: kaiming_uniform(a=sqrt(5)) == uniform scaled by
# 1/sqrt(fan_in); variance_scaling reproduces the same variance family.
conv_kernel_init = nn.initializers.variance_scaling(
    1.0 / 3.0, "fan_in", "uniform"
)


class ConvBn(nn.Module):
    """Conv + BatchNorm, no activation (reference blocks.py:12)."""

    outs: int
    kernel: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        p = auto_pad(self.kernel, self.padding)
        x = nn.Conv(
            self.outs,
            (self.kernel, self.kernel),
            strides=self.stride,
            padding=[(p, p), (p, p)],
            feature_group_count=self.groups,
            use_bias=False,
            kernel_init=conv_kernel_init,
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class _ConvKernel(nn.Module):
    """Bare conv-kernel parameter holder: scoped as `<name>/kernel` so the
    param tree matches an nn.Conv of the same name (converter-compatible)."""

    shape: tuple

    @nn.compact
    def __call__(self):
        return self.param("kernel", conv_kernel_init, self.shape, jnp.float32)


class ConvBnAct(nn.Module):
    """Conv + BN + activation (reference blocks.py:30).

    s2d=True (valid for the even-kernel strided stem, k=6 s=2 p=2) computes
    the conv through a space-to-depth decomposition: x -> (H/2, W/2, 4C),
    kernel (6,6,C,O) -> (3,3,4C,O) with ws[a,b,(ph,pw,c)] = w[2a+ph, 2b+pw,
    c]. Mathematically identical output (same receptive field and padding),
    but the MXU sees a 4x wider input-channel dim and stride-1 tiling — the
    3-channel 6x6/s2 stem is ~9x faster this way on v5e (tools/archive/bench_micro).
    The parameter stays (6,6,C,O) so checkpoints/converters are unchanged.
    """

    outs: int
    kernel: int = 1
    stride: int = 1
    padding: int | None = None
    groups: int = 1
    act: str = "silu"
    s2d: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        # Integer input = unnormalized 0-255 image: the x1/255 normalize runs
        # HERE in the compute dtype. Callers can ship uint8 batches (4x less
        # H2D) with no separate full-image f32 normalize materializing, and
        # the convert + scale fuse into one pass. Multiplication commutes
        # with the s2d transpose, so this is bit-identical to caller-side
        # `x.astype(dtype) * (1/255)`. (XLA canonicalizes the convert ahead
        # of the transpose, so the layout move itself still streams bf16 —
        # profiled; the win is the H2D size and the dropped extra pass.)
        unnorm = jnp.issubdtype(x.dtype, jnp.integer)
        p = auto_pad(self.kernel, self.padding)
        use_s2d = (
            self.s2d and self.kernel == 6 and self.stride == 2 and p == 2
            and self.groups == 1 and x.shape[1] % 2 == 0 and x.shape[2] % 2 == 0
        )
        if use_s2d:
            c = x.shape[-1]
            w = _ConvKernel((6, 6, c, self.outs), name="conv")()
            b, h, wd, _ = x.shape
            xs = x.reshape(b, h // 2, 2, wd // 2, 2, c)
            xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
            xs = xs.astype(self.dtype)
            if unnorm:
                xs = xs * jnp.asarray(1.0 / 255.0, self.dtype)
            ws = w.reshape(3, 2, 3, 2, c, self.outs)
            ws = ws.transpose(0, 2, 1, 3, 4, 5).reshape(3, 3, 4 * c, self.outs)
            x = jax.lax.conv_general_dilated(
                xs,
                ws.astype(self.dtype),
                window_strides=(1, 1),
                padding=[(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            if unnorm:
                x = x.astype(self.dtype) * jnp.asarray(1.0 / 255.0, self.dtype)
            x = nn.Conv(
                self.outs,
                (self.kernel, self.kernel),
                strides=self.stride,
                padding=[(p, p), (p, p)],
                feature_group_count=self.groups,
                use_bias=False,
                kernel_init=conv_kernel_init,
                dtype=self.dtype,
                name="conv",
            )(x)
        x = nn.BatchNorm(
            use_running_average=not training,
            momentum=BN_MOMENTUM,
            epsilon=BN_EPS,
            dtype=self.dtype,
            name="bn",
        )(x)
        return get_act(self.act)(x)


class DWConvModule(nn.Module):
    """Depthwise conv followed by pointwise conv (reference blocks.py:55)."""

    outs: int
    kernel: int
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ins = x.shape[-1]
        x = ConvBnAct(
            ins, self.kernel, stride=self.stride, groups=ins, act=self.act,
            dtype=self.dtype, name="dconv",
        )(x, training)
        x = ConvBnAct(
            self.outs, 1, 1, act=self.act, dtype=self.dtype, name="pconv"
        )(x, training)
        return x


def _shift_max_1d(x, kernel: int, axis: int):
    """k-window max along one spatial axis via shifted jnp.maximum chain."""
    p = kernel // 2
    pad = [(0, 0)] * x.ndim
    pad[axis] = (p, p)
    xp = jnp.pad(x, pad, constant_values=-jnp.inf)
    n = x.shape[axis]
    out = jax.lax.slice_in_dim(xp, 0, n, axis=axis)
    for i in range(1, kernel):
        out = jnp.maximum(out, jax.lax.slice_in_dim(xp, i, i + n, axis=axis))
    return out


def max_pool_same(x, kernel: int, stride: int = 1):
    """MaxPool with torch-style symmetric padding k//2 (stride-1 'SAME').

    Stride-1 pools are computed as separable shifted-max chains rather than
    reduce_window: the VJP is then elementwise selects instead of
    select-and-scatter, which (a) fuses better and (b) partitions correctly
    under spatial SPMD sharding (select-and-scatter across halo rows
    miscounts gradient contributions on some backends)."""
    if stride == 1:
        return _shift_max_1d(_shift_max_1d(x, kernel, 1), kernel, 2)
    p = kernel // 2
    return nn.max_pool(
        x,
        (kernel, kernel),
        strides=(stride, stride),
        padding=[(p, p), (p, p)],
    )


def max_pool_2x2(x):
    """torch MaxPool2d(kernel=2, stride=2) (reference MP block)."""
    return nn.max_pool(x, (2, 2), strides=(2, 2), padding="VALID")


def upsample_nearest_2x(x):
    """Nearest 2x upsample; jnp.repeat lowers to a cheap broadcast-reshape."""
    x = jnp.repeat(x, 2, axis=1)
    x = jnp.repeat(x, 2, axis=2)
    return x


class SPP(nn.Module):
    """Spatial pyramid pooling (reference blocks.py:140)."""

    outs: int
    kernels: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1")(
            x, training
        )
        pools = [max_pool_same(x, k) for k in self.kernels]
        x = jnp.concatenate([x] + pools, axis=-1)
        return ConvBnAct(
            self.outs, 1, 1, act=self.act, dtype=self.dtype, name="conv2"
        )(x, training)


class SPPF(nn.Module):
    """Fast SPP: three chained 5x5 maxpools (reference blocks.py:177)."""

    outs: int
    kernel: int = 5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = x.shape[-1] // 2
        x = ConvBnAct(hidden, 1, 1, dtype=self.dtype, name="conv1")(x, training)
        y1 = max_pool_same(x, self.kernel)
        y2 = max_pool_same(y1, self.kernel)
        y3 = max_pool_same(y2, self.kernel)
        x = jnp.concatenate([x, y1, y2, y3], axis=-1)
        return ConvBnAct(self.outs, 1, 1, dtype=self.dtype, name="conv2")(
            x, training
        )


class SPPCSPC(nn.Module):
    """CSP-style SPP used by the YOLOv7 neck (reference blocks.py:205)."""

    outs: int
    groups: int = 1
    epsilon: float = 0.5
    kernels: Sequence[int] = (5, 9, 13)
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = int(2 * self.outs * self.epsilon)
        cba = lambda outs, k, name: ConvBnAct(  # noqa: E731
            outs, k, 1, groups=self.groups, act=self.act, dtype=self.dtype,
            name=name,
        )
        x1 = cba(hidden, 1, "conv1")(x, training)
        x1 = cba(hidden, 3, "conv3")(x1, training)
        x1 = cba(hidden, 1, "conv4")(x1, training)
        pools = [max_pool_same(x1, k) for k in self.kernels]
        y1 = jnp.concatenate([x1] + pools, axis=-1)
        y1 = cba(hidden, 1, "conv5")(y1, training)
        y1 = cba(hidden, 3, "conv6")(y1, training)
        y2 = cba(hidden, 1, "conv2")(x, training)
        return cba(self.outs, 1, "conv7")(
            jnp.concatenate([y1, y2], axis=-1), training
        )


class RepConv(nn.Module):
    """RepVGG-style reparameterizable 3x3 conv (reference blocks.py:265).

    Train mode: 3x3 ConvBn + 1x1 ConvBn + optional identity BN, summed.
    Deploy mode: a single fused 3x3 conv with bias (`rbr_reparam`), produced
    by pure parameter folding in convert.fuse_repconv_params (the reference's
    fuse_repvgg_block, with its identity-branch bugs fixed).
    """

    outs: int
    kernel: int = 3
    stride: int = 1
    groups: int = 1
    act: str = "silu"
    deploy: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.kernel == 3
        ins = x.shape[-1]
        if self.deploy:
            y = nn.Conv(
                self.outs, (3, 3), strides=self.stride,
                padding=[(1, 1), (1, 1)], feature_group_count=self.groups,
                use_bias=True, kernel_init=conv_kernel_init,
                dtype=self.dtype, name="rbr_reparam",
            )(x)
            return get_act(self.act)(y)

        dense = ConvBn(
            self.outs, 3, self.stride, groups=self.groups, dtype=self.dtype,
            name="rbr_dense",
        )(x, training)
        one = ConvBn(
            self.outs, 1, self.stride, padding=0, groups=self.groups,
            dtype=self.dtype, name="rbr_1x1",
        )(x, training)
        y = dense + one
        if ins == self.outs and self.stride == 1:
            ident = nn.BatchNorm(
                use_running_average=not training,
                momentum=BN_MOMENTUM,
                epsilon=BN_EPS,
                dtype=self.dtype,
                name="rbr_identity",
            )(x)
            y = y + ident
        return get_act(self.act)(y)


class Focus(nn.Module):
    """Space-to-depth stem (reference blocks.py:366). Patch order matches the
    reference concat: (top-left, bottom-left, top-right, bottom-right)."""

    outs: int
    kernel: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        tl = x[:, ::2, ::2, :]
        bl = x[:, 1::2, ::2, :]
        tr = x[:, ::2, 1::2, :]
        br = x[:, 1::2, 1::2, :]
        x = jnp.concatenate([tl, bl, tr, br], axis=-1)
        return ConvBnAct(
            self.outs, self.kernel, self.stride, act=self.act,
            dtype=self.dtype, name="conv",
        )(x, training)


class StandardBottleneck(nn.Module):
    """1x1 -> 3x3 with optional residual (reference bottlenecks.py:9)."""

    outs: int
    groups: int = 1
    expansion: float = 0.5
    act: str = "silu"
    shortcut: bool = True
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ins = x.shape[-1]
        hidden = int(self.outs * self.expansion)
        y = ConvBnAct(
            hidden, 1, 1, groups=self.groups, act=self.act, dtype=self.dtype,
            name="conv1",
        )(x, training)
        if self.depthwise:
            y = DWConvModule(
                self.outs, 3, 1, act=self.act, dtype=self.dtype, name="conv2"
            )(y, training)
        else:
            y = ConvBnAct(
                self.outs, 3, 1, groups=self.groups, act=self.act,
                dtype=self.dtype, name="conv2",
            )(y, training)
        if self.shortcut and ins == self.outs:
            y = y + x
        return y


class C3Bottleneck(nn.Module):
    """CSP bottleneck with 3 convs (reference bottlenecks.py:41)."""

    outs: int
    n: int = 1
    shortcut: bool = True
    expansion: float = 0.5
    act: str = "silu"
    depthwise: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        hidden = int(self.outs * self.expansion)
        x1 = ConvBnAct(
            hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv1"
        )(x, training)
        x2 = ConvBnAct(
            hidden, 1, 1, act=self.act, dtype=self.dtype, name="conv2"
        )(x, training)
        for i in range(self.n):
            x1 = StandardBottleneck(
                hidden, expansion=1.0, act=self.act, shortcut=self.shortcut,
                depthwise=self.depthwise, dtype=self.dtype, name=f"m_{i}",
            )(x1, training)
        x = jnp.concatenate([x1, x2], axis=-1)
        return ConvBnAct(
            self.outs, 1, 1, act=self.act, dtype=self.dtype, name="conv3"
        )(x, training)


class ELAN(nn.Module):
    """E-ELAN aggregation block (reference blocks.py:400).

    depth 2: concat [x4, x3, x2, x1]           (4 * hidden)
    depth 4: concat [x6, x4, x2, x1]           (4 * hidden)
             or all six when hidden == outs    (but chs_mul stays 4; the
             reference relies on hidden == outs/2 in that branch)
    depth 6: concat [x8, x6, x4, x2, x1]       (5 * hidden)
    """

    hidden_chs: int
    outs: int
    act: str = "silu"
    depth: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        assert self.depth % 2 == 0, "ELAN depth must be a multiple of 2"
        chs_mul = 5 if self.depth == 6 else 4
        h = self.hidden_chs
        if h == self.outs:
            h1, h2 = h, h // 2
        else:
            h1 = h2 = h

        cba = lambda outs, k, name: ConvBnAct(  # noqa: E731
            outs, k, 1, act=self.act, dtype=self.dtype, name=name
        )
        x1 = cba(h, 1, "conv1")(x, training)
        x2 = cba(h, 1, "conv2")(x, training)

        x3 = cba(h2, 3, "conv3")(x2, training)
        x4 = cba(h2, 3, "conv4")(x3, training)
        concat_x = [x4, x3, x2, x1]
        if self.depth >= 4:
            x5 = cba(h2, 3, "conv5")(x4, training)
            x6 = cba(h2, 3, "conv6")(x5, training)
            concat_x = [x6, x4, x2, x1]
            if self.hidden_chs == self.outs:
                concat_x = [x6, x5, x4, x3, x2, x1]
        if self.depth >= 6:
            x7 = cba(h2, 3, "conv7")(x6, training)
            x8 = cba(h2, 3, "conv8")(x7, training)
            concat_x = [x8, x6, x4, x2, x1]

        y = jnp.concatenate(concat_x, axis=-1)
        return cba(self.outs, 1, "last_conv")(y, training)

    # h1 is unused in the reference too (conv3 consumes x2 with h channels);
    # kept for structural documentation.


class MPx3Conv(nn.Module):
    """Downsampling fork: maxpool+1x1 branch and 1x1+3x3/s2 branch
    (reference blocks.py:474). Returns (conv_branch, pool_branch)."""

    outs: int
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        x_mp = max_pool_2x2(x)
        x1 = ConvBnAct(
            self.outs, 1, 1, act=self.act, dtype=self.dtype, name="conv1"
        )(x_mp, training)
        x2 = ConvBnAct(
            self.outs, 1, 1, act=self.act, dtype=self.dtype, name="conv2"
        )(x, training)
        x3 = ConvBnAct(
            self.outs, 3, 2, act=self.act, dtype=self.dtype, name="conv3"
        )(x2, training)
        return x3, x1


class DWConv(nn.Module):
    """Depthwise Conv+BN+act, groups == channels (reference blocks.py:81 —
    there a ConvBnAct with g=gcd(ins, outs); here outs must be a multiple of
    ins, the only configuration the reference ever instantiates)."""

    outs: int
    kernel: int = 1
    stride: int = 1
    act: str = "silu"
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, training: bool = False):
        ins = x.shape[-1]
        return ConvBnAct(
            self.outs, self.kernel, self.stride, groups=ins, act=self.act,
            dtype=self.dtype, name="conv",
        )(x, training)


class DWConvTranspose2d(nn.Module):
    """Depthwise transposed conv (reference blocks.py:97). NHWC; grouped
    transpose convolution expressed as feature_group_count on the gradient
    conv."""

    outs: int
    kernel: int = 1
    stride: int = 1
    padding: int = 0
    padding_out: int = 0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        ins = x.shape[-1]
        k, s, p, po = self.kernel, self.stride, self.padding, self.padding_out
        # transposed conv as an input-dilated correlation with the spatially
        # flipped kernel: out = (in-1)*s - 2p + k + po (torch semantics;
        # output_padding lands on the bottom/right edge).
        kernel = self.param(
            "kernel", conv_kernel_init, (k, k, 1, self.outs), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros, (self.outs,), jnp.float32)
        pad = (k - 1 - p, k - 1 - p + po)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            jnp.flip(kernel, (0, 1)).astype(self.dtype),
            window_strides=(1, 1),
            padding=(pad, pad),
            lhs_dilation=(s, s),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=ins,
        )
        return y + bias.astype(self.dtype)


class Concat(nn.Module):
    """Channel concat as a module (reference blocks.py:112). Functionally
    jnp.concatenate; exists so graph definitions mirror the reference."""

    axis: int = -1

    def __call__(self, xs):
        return jnp.concatenate(list(xs), axis=self.axis)


class MP(nn.Module):
    """MaxPool k=2 s=2 (reference blocks.py:121)."""

    kernel: int = 2

    def __call__(self, x):
        return nn.max_pool(
            x, (self.kernel, self.kernel), strides=(self.kernel, self.kernel),
            padding="VALID",
        )


class SP(nn.Module):
    """Stride-1 'same' MaxPool (reference blocks.py:130)."""

    kernel: int = 3
    stride: int = 1

    def __call__(self, x):
        return max_pool_same(x, self.kernel, self.stride)


class Implicit(nn.Module):
    """Implicit knowledge: learned (1, 1, 1, C) added or multiplied
    (reference blocks.py:494). NHWC layout; init N(mean, 0.02)."""

    channel: int
    ops: str = "add"
    std: float = 0.02
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        mean = 0.0 if self.ops == "add" else 1.0
        w = self.param(
            "implicit",
            lambda key, shape: mean
            + self.std * jax.random.normal(key, shape, jnp.float32),
            (1, 1, 1, self.channel),
        )
        if self.ops == "add":
            return x + w
        return x * w
