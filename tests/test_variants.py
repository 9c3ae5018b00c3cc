"""Every model variant the reference ships (README.md:42-81 model zoo:
YOLOv5 s/m/l/x + n, YOLOv7 base/x) must construct and forward with the
right pyramid shapes. All zoo variants additionally get full torch
forward parity in test_model_parity.py; these cheap structural checks
remain as the fast first-line config-table gate."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

NC = 7
IMG = 64  # stride-32-aligned minimum that keeps every grid >= 2 cells


def _check(model, nl=3):
    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x, training=False)
    raw = model.apply(variables, x, training=True,
                      mutable=["batch_stats"])[0]
    assert len(raw) == nl
    for i, r in enumerate(raw):
        g = IMG // (8 << i)
        # native training layout (B, ny, nx, na, no)
        assert r.shape == (1, g, g, 3, NC + 5), (i, r.shape)
    decoded, _ = model.apply(variables, x, training=False)
    n_anch = sum(3 * (IMG // (8 << i)) ** 2 for i in range(nl))
    assert decoded.shape == (1, n_anch, NC + 5)
    assert bool(jnp.all(jnp.isfinite(decoded)))


@pytest.mark.parametrize("variant", ["m", "l", "x"])
def test_yolov5_large_variants_forward(variant):
    from vision_kit_tpu.models.architectures import YOLOV5

    _check(YOLOV5(variant=variant, num_classes=NC))


def test_yolov5_width_depth_table():
    """dw_multiple_generator must match the reference table
    (utils/general.py:50-70)."""
    from vision_kit_tpu.utils.general import dw_multiple_generator

    expect = {"n": (0.25, 0.33), "s": (0.50, 0.33), "m": (0.75, 0.67),
              "l": (1.00, 1.00), "x": (1.25, 1.33)}
    for v, (w, d) in expect.items():
        assert dw_multiple_generator(v) == (w, d)


def test_yolov7x_forward():
    from vision_kit_tpu.models.architectures import YOLOV7

    _check(YOLOV7(variant="x", num_classes=NC))


def test_yolov7x_param_shapes_differ_from_base():
    """The x variant widens (base_chs 40 vs 32) and deepens ELAN
    (depth 6 vs 4) — catch a config-table regression silently building
    base."""
    from vision_kit_tpu.models.architectures import YOLOV7

    x = jnp.zeros((1, IMG, IMG, 3), jnp.float32)
    vx = YOLOV7(variant="x", num_classes=NC).init(
        jax.random.PRNGKey(0), x, training=False)
    vb = YOLOV7(variant="base", num_classes=NC).init(
        jax.random.PRNGKey(0), x, training=False)

    def n_params(v):
        return sum(int(np.prod(p.shape))
                   for p in jax.tree_util.tree_leaves(v["params"]))

    assert n_params(vx) > n_params(vb)
