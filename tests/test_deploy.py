"""Deploy-time parameter folding: RepConv fusion + v7 implicit
reparameterization must preserve eval outputs exactly (pure algebra)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.convert import (
    fuse_conv_bn,
    fuse_repconv_params,
    reparameterize_v7,
)
from vision_kit_tpu.models import YOLOV7
from vision_kit_tpu.models.layers import RepConv


def test_fuse_conv_bn_algebra(rng):
    """conv+bn == fused conv with folded params on random data."""
    from flax import linen as nn

    k = jnp.asarray(rng.normal(0, 0.1, (3, 3, 8, 16)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(0.5, 1.5, 16).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, 16).astype(np.float32))
    mean = jnp.asarray(rng.normal(0, 0.5, 16).astype(np.float32))
    var = jnp.asarray(rng.uniform(0.5, 2.0, 16).astype(np.float32))
    x = jnp.asarray(rng.normal(0, 1, (2, 10, 10, 8)).astype(np.float32))

    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    eps = 1e-3
    ref = (conv - mean) / jnp.sqrt(var + eps) * scale + bias

    fk, fb = fuse_conv_bn(k, scale, bias, mean, var, eps)
    got = jax.lax.conv_general_dilated(
        x, fk, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + fb
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4,
                               atol=1e-5)


def test_repconv_fusion_preserves_output(rng):
    x = jnp.asarray(rng.normal(0, 1, (1, 16, 16, 32)).astype(np.float32))

    train_mod = RepConv(32, deploy=False)
    variables = train_mod.init(jax.random.PRNGKey(0), x, training=False)
    # randomize BN stats so fusion is non-trivial
    variables = jax.tree_util.tree_map(
        lambda a: jnp.asarray(
            rng.normal(0.5, 0.3, a.shape).astype(np.float32)
        ) if a.ndim >= 1 else a,
        variables,
    )
    ref = train_mod.apply(variables, x, training=False)

    fused = fuse_repconv_params({"params": {"rc": variables["params"]},
                                 "batch_stats": {"rc": variables["batch_stats"]}})
    deploy_mod = RepConv(32, deploy=True)
    got = deploy_mod.apply(
        {"params": fused["params"]["rc"]}, x, training=False
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-3,
                               atol=1e-4)


def test_v7_full_deploy_parity(rng):
    """YOLOv7 base: train-structure eval == deploy-structure eval after
    RepConv fusion + implicit reparameterization."""
    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))

    model = YOLOV7(variant="base", num_classes=7, deploy=False)
    variables = model.init(jax.random.PRNGKey(1), x, training=False)
    ref_decoded, _ = model.apply(variables, x, training=False)

    fused = fuse_repconv_params(variables)
    fused = reparameterize_v7(fused, num_classes=7)

    deploy_model = YOLOV7(variant="base", num_classes=7, deploy=True)
    # structure check: deploy template paths all exist in fused params
    got_decoded, _ = deploy_model.apply(fused, x, training=False)
    np.testing.assert_allclose(
        np.asarray(got_decoded), np.asarray(ref_decoded), rtol=2e-3, atol=2e-3
    )


def test_load_weights_autofolds_training_ckpt_into_deploy(rng, tmp_path):
    """load_weights on TRAINING weights with a DEPLOY template applies the
    RepConv fusion + implicit reparameterization automatically (the
    reference demo's behavior, scripts/demo.py:32-45). Regression: v7x's
    deploy tree differs from training only by the head implicits, so
    without the fold the strict load would pass and silently produce
    wrong outputs."""
    from flax import serialization

    from vision_kit_tpu.predictor import load_weights

    x = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))

    model = YOLOV7(variant="base", num_classes=7, deploy=False)
    variables = model.init(jax.random.PRNGKey(2), x, training=False)
    ref_decoded, _ = model.apply(variables, x, training=False)

    path = str(tmp_path / "train_weights.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(variables)))

    deploy_model = YOLOV7(variant="base", num_classes=7, deploy=True)
    template = deploy_model.init(jax.random.PRNGKey(3), x, training=False)
    loaded = load_weights(path, template)
    got_decoded, _ = deploy_model.apply(loaded, x, training=False)
    np.testing.assert_allclose(
        np.asarray(got_decoded), np.asarray(ref_decoded), rtol=2e-3, atol=2e-3
    )


def test_savedmodel_export_roundtrip(tmp_path):
    """jax2tf SavedModel export (the ONNX-export analog): save, reload,
    numerical agreement with the jitted forward."""
    tf = pytest.importorskip("tensorflow")
    from jax.experimental import jax2tf

    from vision_kit_tpu.models import YOLOV5

    model = YOLOV5(variant="n", num_classes=7)
    v = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                   training=False)

    def fwd(x):
        d, _ = model.apply(v, x, training=False)
        return d

    tf_fn = jax2tf.convert(fwd, with_gradient=False,
                           native_serialization_platforms=("cpu", "tpu"))
    m = tf.Module()
    m.f = tf.function(tf_fn, autograph=False,
                      input_signature=[tf.TensorSpec((1, 64, 64, 3),
                                                     tf.float32)])
    d = str(tmp_path / "sm")
    tf.saved_model.save(m, d)
    loaded = tf.saved_model.load(d)
    x = np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    out_tf = loaded.f(tf.constant(x)).numpy()
    out_jax = np.asarray(fwd(jnp.asarray(x)))
    np.testing.assert_allclose(out_tf, out_jax, atol=2e-3, rtol=1e-3)
