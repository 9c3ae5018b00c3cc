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


def test_native_decode_resize_matches_python(images):
    """decode_resize must reproduce the datasets' `_decode_resized` geometry
    (min-ratio resize, int() truncation, no pad) bit-for-bit."""
    for p in images:
        rgb = cv2.cvtColor(cv2.imread(p), cv2.COLOR_BGR2RGB)
        h0, w0 = rgb.shape[:2]
        for dst in [(640, 640), (96, 128)]:
            r = min(dst[0] / h0, dst[1] / w0)
            ref = rgb if r == 1 else cv2.resize(
                rgb, (int(w0 * r), int(h0 * r)),
                interpolation=cv2.INTER_LINEAR,
            )
            out = native.decode_resize(p, dst)
            assert out is not None
            img, hw0 = out
            assert hw0 == (h0, w0)
            np.testing.assert_array_equal(img, ref)


def test_native_decode_resize_batch(images):
    buf, metas = native.decode_resize_batch(
        images + [images[0] + ".missing"], (320, 320)
    )
    assert (metas[:3, 4] == 1).all() and metas[3, 4] == 0
    for k, p in enumerate(images):
        single, _ = native.decode_resize(p, (320, 320))
        h, w = int(metas[k, 0]), int(metas[k, 1])
        assert single.shape == (h, w, 3)
        np.testing.assert_array_equal(
            buf[k, : h * w * 3].reshape(h, w, 3), single
        )


def test_dataset_batch_pull_items_matches_pull_item(tmp_path):
    """batch_pull_items (native batch decode) must equal per-item pull_item
    (python decode) on a real YOLO dataset — images AND labels."""
    from vision_kit_tpu.data.datasets import YOLODataset

    rng = np.random.default_rng(1)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, (h, w) in enumerate([(317, 423), (640, 480), (100, 900), (50, 60)]):
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.png"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.3\n1 0.25 0.25 0.2 0.2"
        )
    ds = YOLODataset(str(tmp_path), img_size=(320, 320))
    batch = ds.batch_pull_items(range(4))
    for i, (img, lab, hw0, iid) in enumerate(batch):
        img_p, lab_p, hw0_p, iid_p = ds.pull_item(i)
        np.testing.assert_array_equal(img, img_p)
        np.testing.assert_array_equal(lab, lab_p)
        assert hw0 == hw0_p and iid == iid_p


def test_valloader_native_matches_python(tmp_path, monkeypatch):
    """The full ValLoader batch must be identical with and without the
    native decode path (VK_NO_NATIVE toggle)."""
    from vision_kit_tpu.data.datasets import YOLODataset
    from vision_kit_tpu.data.loader import ValLoader

    rng = np.random.default_rng(2)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(5):
        h, w = int(rng.integers(80, 400)), int(rng.integers(80, 400))
        img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.png"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5")
    ds = YOLODataset(str(tmp_path), img_size=(128, 128))

    batches_native = list(ValLoader(ds, 2, img_size=(128, 128)))
    monkeypatch.setenv("VK_NO_NATIVE", "1")
    batches_py = list(ValLoader(ds, 2, img_size=(128, 128), prefetch=0))
    assert len(batches_native) == len(batches_py) == 3
    for a, b in zip(batches_native, batches_py):
        np.testing.assert_array_equal(a["image"], b["image"])
        np.testing.assert_array_equal(a["targets"], b["targets"])
        assert a["info"] == b["info"]
        assert a["count"] == b["count"]


def test_mosaic_native_matches_python(tmp_path, monkeypatch):
    """Mosaic batches its 4 tile decodes through the native pool; output
    must equal the per-image python path exactly."""
    from vision_kit_tpu.data.datasets import YOLODataset
    from vision_kit_tpu.data.mosaic import MosaicMixupDataset

    rng0 = np.random.default_rng(4)
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i in range(6):
        h, w = int(rng0.integers(60, 200)), int(rng0.integers(60, 200))
        img = rng0.integers(0, 255, (h, w, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.png"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.5 0.5")
    ds = YOLODataset(str(tmp_path), img_size=(96, 96))
    mds = MosaicMixupDataset(ds, img_size=(96, 96), enable_mosaic=True,
                             mosaic_prob=1.0)
    img_n, lab_n = mds.getitem(np.random.default_rng(7), 0)
    monkeypatch.setenv("VK_NO_NATIVE", "1")
    img_p, lab_p = mds.getitem(np.random.default_rng(7), 0)
    np.testing.assert_array_equal(img_n, img_p)
    np.testing.assert_array_equal(lab_n, lab_p)


@pytest.mark.skipif(not native.available(), reason="native vkio not built")
def test_native_letterbox_half_pixel_rounding(tmp_path):
    """Exact .5 crossings in the letterbox new-size math: Python round()
    is half-to-EVEN; the native path must match bit-for-bit (957 * 0.5 =
    478.5 -> 478, not lround's 479)."""
    from vision_kit_tpu.ops.letterbox import letterbox_np

    img = np.linspace(0, 255, 957 * 1280 * 3).reshape(957, 1280, 3)
    img = img.astype(np.uint8)
    path = str(tmp_path / "half.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = native.decode_letterbox(path, (640, 640))
    assert out is not None
    nat_img, (nat_r, nat_pad) = out
    py_img, (py_r, py_pad) = letterbox_np(img, (640, 640))
    np.testing.assert_array_equal(nat_img, py_img)
    assert nat_pad == py_pad
