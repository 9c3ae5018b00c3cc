"""Reduced-scale JPEG decode (`fast_decode`): geometry-exact, gated, and
bit-identical between the native (vkio.cpp FastDecodeJpeg) and Python
(datasets._fast_decode_resized) implementations.

The fast path trades exact pixel parity with the full-decode path for ~3x
decode speed (measured; DESIGN.md): libjpeg's DCT-domain 1/f scaling is a
box-average the full path never applies. Everything the label/eval math
consumes — output shape, true (h0, w0), letterbox ratios — must stay
EXACTLY equal; pixels must stay close.
"""

import cv2
import numpy as np
import pytest

from vision_kit_tpu.data import native
from vision_kit_tpu.data.datasets import (
    YOLODataset,
    _fast_decode_resized,
    _probe_jpeg,
)


def _smooth(h, w):
    y, x = np.mgrid[0:h, 0:w]
    return np.stack(
        [x * 255 / w, y * 255 / h, (x + y) * 255 / (h + w)], -1
    ).astype(np.uint8)


def _write_jpg(path, img_rgb, quality=95):
    cv2.imwrite(str(path), img_rgb[..., ::-1],
                [cv2.IMWRITE_JPEG_QUALITY, quality])


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    root = tmp_path_factory.mktemp("fastjpg")
    out = {}
    for name, (h, w) in {
        "hd": (719, 1283),      # f=2 with a residual resize
        "even": (720, 1280),    # f=2, reduced == target exactly
        "big": (1080, 1920),    # f=2..4 territory
        "small": (96, 128),     # upscale target: fast path must not apply
    }.items():
        p = root / f"{name}.jpg"
        _write_jpg(p, _smooth(h, w))
        out[name] = (str(p), (h, w))
    return out


def test_probe_dims(jpegs):
    for path, (h, w) in jpegs.values():
        assert _probe_jpeg(path) == (h, w, False)


def test_probe_rejects_non_jpeg(tmp_path):
    p = tmp_path / "x.png"
    cv2.imwrite(str(p), _smooth(60, 80)[..., ::-1])
    assert _probe_jpeg(str(p)) is None
    assert _probe_jpeg(str(tmp_path / "missing.jpg")) is None


def test_probe_flags_exif(tmp_path):
    from PIL import Image

    p = tmp_path / "exif.jpg"
    ex = Image.Exif()
    ex[274] = 6  # orientation
    Image.fromarray(_smooth(200, 300)).save(p, "JPEG", exif=ex)
    probe = _probe_jpeg(str(p))
    assert probe is not None and probe[2] is True
    # gated: the fast path refuses EXIF-bearing files
    assert _fast_decode_resized(str(p), (64, 64)) is None


def _exact_resized(path, max_hw):
    rgb = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
    h0, w0 = rgb.shape[:2]
    r = min(max_hw[0] / h0, max_hw[1] / w0)
    if r != 1:
        rgb = cv2.resize(rgb, (int(w0 * r), int(h0 * r)),
                         interpolation=cv2.INTER_LINEAR)
    return rgb, (h0, w0)


def test_fast_geometry_exact_pixels_close(jpegs):
    for name in ("hd", "even", "big"):
        path, (h, w) = jpegs[name]
        out = _fast_decode_resized(path, (640, 640))
        assert out is not None, name
        img, hw0 = out
        ref, hw0_ref = _exact_resized(path, (640, 640))
        assert hw0 == hw0_ref == (h, w)
        assert img.shape == ref.shape
        diff = np.abs(img.astype(np.int16) - ref.astype(np.int16))
        assert diff.max() <= 8, f"{name}: max pixel diff {diff.max()}"
        assert diff.mean() < 2.0


def test_fast_not_applied_when_upscaling(jpegs):
    path, _ = jpegs["small"]
    assert _fast_decode_resized(path, (640, 640)) is None


def test_fast_progressive_jpeg(tmp_path):
    """Progressive JPEGs (SOF2): probe reads dims, reduced decode works."""
    from PIL import Image

    p = tmp_path / "prog.jpg"
    Image.fromarray(_smooth(719, 1283)).save(p, "JPEG", progressive=True,
                                             quality=92)
    assert _probe_jpeg(str(p)) == (719, 1283, False)
    out = _fast_decode_resized(str(p), (640, 640))
    assert out is not None
    img, hw0 = out
    assert hw0 == (719, 1283) and img.shape == (358, 640, 3)
    ref, _ = _exact_resized(str(p), (640, 640))
    diff = np.abs(img.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 8


def test_fast_grayscale_jpeg(tmp_path):
    """Grayscale JPEGs: REDUCED_COLOR decode still yields 3 channels and
    the same geometry as the exact path."""
    from PIL import Image

    p = tmp_path / "gray.jpg"
    Image.fromarray(_smooth(719, 1283)[..., 0]).save(p, "JPEG", quality=92)
    out = _fast_decode_resized(str(p), (640, 640))
    assert out is not None
    img, hw0 = out
    ref, hw0_ref = _exact_resized(str(p), (640, 640))
    assert hw0 == hw0_ref and img.shape == ref.shape == (358, 640, 3)
    diff = np.abs(img.astype(np.int16) - ref.astype(np.int16))
    assert diff.max() <= 8


@pytest.mark.skipif(not native.available(), reason="native vkio not built")
def test_native_fast_bit_identical_to_python(jpegs):
    for name in ("hd", "even", "big"):
        path, (h, w) = jpegs[name]
        py = _fast_decode_resized(path, (640, 640))
        nat = native.decode_resize(path, (640, 640), fast=True)
        assert py is not None and nat is not None
        np.testing.assert_array_equal(nat[0], py[0])
        assert nat[1] == py[1] == (h, w)


@pytest.mark.skipif(not native.available(), reason="native vkio not built")
def test_native_fast_falls_back_exactly(jpegs, tmp_path):
    """Where fast doesn't apply (upscale, EXIF, PNG) the native fast=True
    call must equal the exact path bit-for-bit."""
    from PIL import Image

    # (path, target): upscale JPEG, EXIF-bearing JPEG, PNG
    cases = [(jpegs["small"][0], (640, 640))]
    pe = tmp_path / "exif.jpg"
    ex = Image.Exif()
    ex[274] = 3
    Image.fromarray(_smooth(400, 500)).save(pe, "JPEG", exif=ex)
    cases.append((str(pe), (64, 64)))
    pp = tmp_path / "x.png"
    cv2.imwrite(str(pp), _smooth(400, 500)[..., ::-1])
    cases.append((str(pp), (64, 64)))
    for path, dst in cases:
        a = native.decode_resize(path, dst, fast=False)
        b = native.decode_resize(path, dst, fast=True)
        np.testing.assert_array_equal(a[0], b[0])
        assert a[1] == b[1]


@pytest.mark.skipif(not native.available(), reason="native vkio not built")
def test_native_fast_letterbox(jpegs):
    """Letterbox fast path: identical ratio/pad, close pixels."""
    for name in ("hd", "big"):
        path, _ = jpegs[name]
        exact = native.decode_letterbox(path, (640, 640), fast=False)
        fast = native.decode_letterbox(path, (640, 640), fast=True)
        assert exact is not None and fast is not None
        assert fast[1] == exact[1]  # (ratio, (dw, dh)) exactly equal
        diff = np.abs(fast[0].astype(np.int16) - exact[0].astype(np.int16))
        assert diff.max() <= 8


def _mk_yolo_dir(tmp_path, sizes):
    (tmp_path / "images").mkdir()
    (tmp_path / "labels").mkdir()
    for i, (h, w) in enumerate(sizes):
        _write_jpg(tmp_path / "images" / f"{i}.jpg", _smooth(h, w))
        (tmp_path / "labels" / f"{i}.txt").write_text(
            "0 0.5 0.5 0.4 0.3\n1 0.25 0.25 0.2 0.2"
        )


def test_dataset_fast_decode_same_labels_and_geometry(tmp_path):
    """fast_decode=True must yield identical shapes, (h0, w0) and labels to
    the default dataset on every item — only pixels may differ slightly."""
    _mk_yolo_dir(tmp_path, [(719, 1283), (720, 1280), (96, 128)])
    ds_slow = YOLODataset(str(tmp_path), img_size=(320, 320))
    ds_fast = YOLODataset(str(tmp_path), img_size=(320, 320),
                          fast_decode=True)
    for i in range(3):
        img_s, lab_s, hw0_s, _ = ds_slow.pull_item(i)
        img_f, lab_f, hw0_f, _ = ds_fast.pull_item(i)
        assert hw0_s == hw0_f
        assert img_s.shape == img_f.shape
        np.testing.assert_array_equal(lab_s, lab_f)
        diff = np.abs(img_s.astype(np.int16) - img_f.astype(np.int16))
        assert diff.max() <= 8


def test_valloader_fast_decode_info_identical(tmp_path):
    """The evaluator-facing info tuples (h0, w0, ratio, pad, id) must be
    IDENTICAL with fast_decode — rescale math sees no difference."""
    from vision_kit_tpu.data.loader import ValLoader

    _mk_yolo_dir(tmp_path, [(719, 1283), (720, 1280), (400, 400)])
    ds_slow = YOLODataset(str(tmp_path), img_size=(128, 128))
    ds_fast = YOLODataset(str(tmp_path), img_size=(128, 128),
                          fast_decode=True)
    bs = list(ValLoader(ds_slow, 2, img_size=(128, 128), prefetch=0))
    bf = list(ValLoader(ds_fast, 2, img_size=(128, 128), prefetch=0))
    assert len(bs) == len(bf)
    for a, b in zip(bs, bf):
        assert a["info"] == b["info"]
        assert a["count"] == b["count"]
        np.testing.assert_array_equal(a["targets"], b["targets"])


def test_dataset_fast_decode_python_fallback_matches_native(tmp_path,
                                                            monkeypatch):
    """With VK_NO_NATIVE=1 the Python fast path must produce the same batch
    as the native fast path."""
    if not native.available():
        pytest.skip("native vkio not built")
    _mk_yolo_dir(tmp_path, [(719, 1283), (640, 960)])
    ds = YOLODataset(str(tmp_path), img_size=(320, 320), fast_decode=True)
    native_items = [ds.pull_item(i) for i in range(2)]
    monkeypatch.setenv("VK_NO_NATIVE", "1")
    py_items = [ds.pull_item(i) for i in range(2)]
    for (a_img, a_lab, a_hw, _), (b_img, b_lab, b_hw, _) in zip(
        native_items, py_items
    ):
        np.testing.assert_array_equal(a_img, b_img)
        np.testing.assert_array_equal(a_lab, b_lab)
        assert a_hw == b_hw
