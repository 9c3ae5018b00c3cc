"""Numerical parity: reference torch models (random init) vs the Flax models
with converted weights, forward on the same input.

This is the strongest correctness gate: conv padding, BN eps, activation,
focus ordering, neck topology, head decode and anchor handling must ALL agree
for the decoded outputs to match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.convert import torch_to_flax
from vision_kit_tpu.models import YOLOV5, YOLOV7

IMG = 128  # stride-32-aligned, small enough for fast CPU torch forward


def _make_ref_v5(variant, num_classes=80):
    from conftest import reset_reference_defaults
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    reset_reference_defaults()
    model = RefV5(variant=variant, num_classes=num_classes)
    reset_reference_defaults()
    return model


def _run_pair(reference, jax_model, torch_model, img=IMG, batch=1, seed=0):
    import torch

    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 1, size=(batch, img, img, 3)).astype(np.float32)

    torch_model.eval()
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    variables = jax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, img, img, 3)), training=False
    )
    converted = torch_to_flax(torch_model.state_dict(), template=variables)
    got_out = jax_model.apply(converted, jnp.asarray(x), training=False)
    return ref_out, got_out


@pytest.mark.parametrize("variant", ["n", "s", "m", "l", "x"])
def test_yolov5_forward_parity(reference, variant):
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    torch_model = _make_ref_v5(variant)
    jax_model = YOLOV5(variant=variant, num_classes=80, decode_order="reference")
    ref_out, got_out = _run_pair(reference, jax_model, torch_model)

    ref_decoded = ref_out[0].numpy()
    got_decoded = np.asarray(got_out[0])
    assert got_decoded.shape == ref_decoded.shape
    np.testing.assert_allclose(got_decoded, ref_decoded, rtol=1e-3, atol=5e-3)

    # raw per-level maps too (pre-sigmoid)
    for ref_raw, got_raw in zip(ref_out[1], got_out[1]):
        np.testing.assert_allclose(
            np.asarray(got_raw), ref_raw.numpy(), rtol=1e-3, atol=5e-3
        )


@pytest.mark.parametrize("variant", ["base", "x"])
def test_yolov7_forward_parity(reference, variant):
    from vision_kit.models.architectures.yolov7 import YOLOV7 as RefV7

    torch_model = RefV7(variant=variant, num_classes=80, deploy=False)
    jax_model = YOLOV7(variant=variant, num_classes=80, deploy=False, decode_order="reference")
    ref_out, got_out = _run_pair(reference, jax_model, torch_model)

    ref_decoded = ref_out[0].numpy()
    got_decoded = np.asarray(got_out[0])
    assert got_decoded.shape == ref_decoded.shape
    np.testing.assert_allclose(got_decoded, ref_decoded, rtol=1e-3, atol=5e-3)


def test_yolov5_train_mode_raw_parity(reference):
    """Training-mode outputs (raw maps, batch-stats BN) drive the loss; check
    the raw maps match with torch in train BN mode on the same batch."""
    import torch
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    torch_model = _make_ref_v5("n", num_classes=7)
    # decode_order="reference" = anchor-major training maps (the native
    # default keeps the conv layout, which torch's maps don't match)
    jax_model = YOLOV5(variant="n", num_classes=7, decode_order="reference")

    rng = np.random.default_rng(1)
    x = rng.uniform(0, 1, size=(2, IMG, IMG, 3)).astype(np.float32)

    torch_model.train()
    with torch.no_grad():
        ref_raws = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))

    variables = jax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, IMG, IMG, 3)), training=False
    )
    converted = torch_to_flax(torch_model.state_dict(), template=variables)
    got_raws, _ = jax_model.apply(
        converted, jnp.asarray(x), training=True, mutable=["batch_stats"]
    )
    for ref_raw, got_raw in zip(ref_raws, got_raws):
        np.testing.assert_allclose(
            np.asarray(got_raw), ref_raw.detach().numpy(), rtol=1e-3, atol=5e-3
        )
