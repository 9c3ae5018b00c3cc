"""Native C++ loader (vkio) vs the Python letterbox: must agree exactly."""

import os

import cv2
import numpy as np
import pytest

from vision_kit_tpu.data import native
from vision_kit_tpu.ops.letterbox import letterbox_np

BUS = "/root/reference/assets/bus.jpg"


pytestmark = pytest.mark.skipif(
    not native.available(), reason="native vkio not built"
)


@pytest.fixture(scope="module")
def images(tmp_path_factory, ):
    root = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    paths = []
    for i, (h, w) in enumerate([(317, 423), (640, 480), (100, 900)]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        p = str(root / f"{i}.png")  # png: lossless, exact comparison
        cv2.imwrite(p, img)
        paths.append(p)
    return paths


def test_native_matches_python(images):
    for p in images:
        bgr = cv2.imread(p)
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        ref, (ratio, pad) = letterbox_np(rgb, (640, 640))
        out = native.decode_letterbox(p, (640, 640))
        assert out is not None
        img, (r, (dw, dh)) = out
        assert r == pytest.approx(ratio, rel=1e-6)
        assert dw == pytest.approx(pad[0], abs=1e-4)
        assert dh == pytest.approx(pad[1], abs=1e-4)
        np.testing.assert_array_equal(img, ref)


def test_native_batch(images):
    imgs, infos = native.decode_letterbox_batch(images * 3, (320, 320))
    assert imgs.shape == (9, 320, 320, 3)
    assert (infos[:, 3] == 1.0).all()
    # identical inputs -> identical outputs across the batch
    np.testing.assert_array_equal(imgs[0], imgs[3])


def test_native_bad_path(tmp_path):
    out = native.decode_letterbox(str(tmp_path / "nope.jpg"), (64, 64))
    assert out is None


def test_native_jpeg_close_to_python():
    if not os.path.exists(BUS):
        pytest.skip("bus.jpg unavailable")
    bgr = cv2.imread(BUS)
    rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
    ref, _ = letterbox_np(rgb, (640, 640))
    img, _ = native.decode_letterbox(BUS, (640, 640))
    # same libjpeg decode underneath -> exact match
    np.testing.assert_array_equal(img, ref)
