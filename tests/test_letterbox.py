"""Letterbox geometry + device/host agreement + parity with reference resize."""

import numpy as np
import pytest

import jax.numpy as jnp

from vision_kit_tpu.ops.letterbox import (
    letterbox_device,
    letterbox_np,
    letterbox_params,
    scale_coords,
)


def test_params_square_to_640():
    new_unpad, (t, b, l, r), ratio, pad = letterbox_params((480, 640), 640)
    assert new_unpad == (640, 480)
    assert ratio == pytest.approx(1.0)
    assert t + b == 160 and l + r == 0


def test_params_auto_stride():
    _, (t, b, l, r), _, _ = letterbox_params((480, 640), 640, auto=True)
    # 480*1.0 = 480; dh = 160 % 32 = 0
    assert t == b == 0


def test_host_letterbox_shape(rng):
    img = rng.integers(0, 255, size=(317, 423, 3), dtype=np.uint8)
    out, (ratio, pad) = letterbox_np(img, 640)
    assert out.shape == (640, 640, 3)
    # padded border is gray 114
    assert (out[0] == 114).all() or (out[:, 0] == 114).all()


def test_device_matches_host_geometry(rng):
    img = rng.integers(0, 255, size=(317, 423, 3), dtype=np.uint8)
    host, (r_h, p_h) = letterbox_np(img, 640)
    dev, (r_d, p_d) = letterbox_device(jnp.asarray(img), 640, normalize=False)
    assert dev.shape == (640, 640, 3)
    assert r_h == pytest.approx(r_d)
    assert p_h == pytest.approx(p_d)
    # interiors agree closely (bilinear vs cv2 INTER_LINEAR differ at edges)
    d = np.abs(np.asarray(dev) - host.astype(np.float32))
    assert np.median(d) < 2.0


def test_parity_with_reference_resize(reference, rng):
    from vision_kit.utils.image_proc import resize as ref_resize

    img = rng.integers(0, 255, size=(317, 423, 3), dtype=np.uint8)
    ref_img, (ref_ratio, ref_pad) = ref_resize((640, 640), img.copy())
    got_img, (ratio, pad) = letterbox_np(img, 640)
    assert got_img.shape == ref_img.shape
    assert ratio == pytest.approx(ref_ratio)
    assert pad == pytest.approx(ref_pad)
    np.testing.assert_array_equal(got_img, ref_img)


def test_scale_coords_roundtrip():
    # boxes in a 640-letterboxed frame from a 480x640 original
    boxes = jnp.array([[100.0, 180.0, 300.0, 400.0, 0.9, 2.0]])
    out = scale_coords((640, 640), boxes, (480, 640))
    # gain 1.0, pad (0, 80)
    np.testing.assert_allclose(
        np.asarray(out[0, :4]), [100.0, 100.0, 300.0, 320.0], rtol=1e-5
    )
    assert float(out[0, 4]) == pytest.approx(0.9)
