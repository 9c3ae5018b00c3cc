"""Data pipeline tests: synthetic YOLO-format dataset -> loaders -> batches,
mosaic/affine label round-trips, evaluator sanity."""

import os

import cv2
import numpy as np
import pytest

from vision_kit_tpu.data.augment import (
    TrainAugPipeline,
    ValAugPipeline,
    flip_lr,
    random_affine,
)
from vision_kit_tpu.data.datasets import YOLODataset
from vision_kit_tpu.data.loader import TrainLoader, ValLoader, infinite_indices, pad_targets
from vision_kit_tpu.data.mosaic import MosaicMixupDataset


@pytest.fixture(scope="module")
def yolo_dir(tmp_path_factory):
    """Synthetic dataset: colored rectangles with matching labels."""
    root = tmp_path_factory.mktemp("yolo_ds")
    img_dir = root / "images"
    lbl_dir = root / "labels"
    img_dir.mkdir()
    lbl_dir.mkdir()
    rng = np.random.default_rng(3)
    for i in range(8):
        h, w = int(rng.integers(200, 400)), int(rng.integers(200, 400))
        img = np.full((h, w, 3), 64, np.uint8)
        rows = []
        for b in range(int(rng.integers(1, 4))):
            bw, bh = int(rng.integers(30, 80)), int(rng.integers(30, 80))
            x1 = int(rng.integers(0, w - bw))
            y1 = int(rng.integers(0, h - bh))
            cls = int(rng.integers(0, 3))
            img[y1:y1 + bh, x1:x1 + bw] = (200, 50 * cls, 100)
            rows.append(
                f"{cls} {(x1 + bw / 2) / w:.6f} {(y1 + bh / 2) / h:.6f} "
                f"{bw / w:.6f} {bh / h:.6f}"
            )
        cv2.imwrite(str(img_dir / f"im{i}.jpg"), img)
        (lbl_dir / f"im{i}.txt").write_text("\n".join(rows))
    return str(root)


def test_yolo_dataset_loads(yolo_dir):
    ds = YOLODataset(yolo_dir, img_size=320)
    assert len(ds) == 8
    img, labels, (h0, w0), idx = ds.pull_item(0)
    assert img.ndim == 3 and img.dtype == np.uint8
    assert labels.shape[1] == 5
    # labels inside resized image bounds
    h, w = img.shape[:2]
    assert (labels[:, [0, 2]] <= w + 1).all()
    assert (labels[:, [1, 3]] <= h + 1).all()
    assert (labels[:, :4] >= -1).all()


@pytest.mark.parametrize("mode", ["ram", "disk"])
def test_image_cache_parity(yolo_dir, mode):
    """RAM/disk image caches must be sample-for-sample identical to the
    uncached path, and the disk cache must serve reads without touching the
    original files again."""
    import pickle

    plain = YOLODataset(yolo_dir, img_size=320)
    cached = YOLODataset(yolo_dir, img_size=320, cache_images=mode)
    for i in range(len(plain)):
        img_a, lab_a, hw0_a, _ = plain.pull_item(i)
        img_b, lab_b, hw0_b, _ = cached.pull_item(i)
        np.testing.assert_array_equal(img_a, img_b)
        np.testing.assert_array_equal(lab_a, lab_b)
        assert hw0_a == hw0_b
    # cached datasets must survive pickling (spawn-based loader workers)
    clone = pickle.loads(pickle.dumps(cached))
    img_c, _, _, _ = clone.pull_item(3)
    np.testing.assert_array_equal(img_c, plain.pull_item(3)[0])
    if mode == "disk":
        # a second instance reuses the cache file: break decode to prove it
        ds2 = YOLODataset(yolo_dir, img_size=320, cache_images="disk")
        ds2.load_image = None  # would raise if the decode path were hit
        img_d, _, _, _ = ds2.pull_item(5)
        np.testing.assert_array_equal(img_d, plain.pull_item(5)[0])


def test_label_path_under_images_ancestor(tmp_path):
    """An ancestor directory named 'images' must not hijack the
    image->label path mapping (reference yolo.py:249 uses the LAST
    /images/ occurrence)."""
    from vision_kit_tpu.data.datasets import _img2label_path

    assert (
        _img2label_path("/mnt/images/mydata/images/train/img.jpg")
        == "/mnt/images/mydata/labels/train/img.txt"
    )
    # end-to-end: labels found (not silently empty) under such a root
    root = tmp_path / "images" / "myset"
    (root / "images" / "train").mkdir(parents=True)
    (root / "labels" / "train").mkdir(parents=True)
    img = np.full((64, 64, 3), 120, np.uint8)
    img[10:40, 10:50] = (200, 30, 30)
    cv2.imwrite(str(root / "images" / "train" / "a.jpg"), img)
    (root / "labels" / "train" / "a.txt").write_text(
        "0 0.46875 0.390625 0.625 0.46875"
    )
    ds = YOLODataset(str(root), img_size=64, cache=False)
    assert len(ds) == 1
    _, labels, _, _ = ds.pull_item(0)
    assert len(labels) == 1


def test_label_cache_roundtrip(yolo_dir):
    ds1 = YOLODataset(yolo_dir, img_size=320, cache=True)
    ds2 = YOLODataset(yolo_dir, img_size=320, cache=True)  # from cache
    for a, b in zip(ds1.labels, ds2.labels):
        np.testing.assert_array_equal(a, b)


def test_random_affine_identity():
    rng = np.random.default_rng(0)
    img = np.full((100, 100, 3), 50, np.uint8)
    labels = np.array([[10.0, 20.0, 40.0, 60.0, 1.0]], np.float32)
    out_img, out_labels = random_affine(
        rng, img, labels, target_size=(100, 100),
        degrees=0.0, translate=0.0, scales=(1.0, 1.0), shear=0.0,
    )
    np.testing.assert_allclose(out_labels[:, :4], labels[:, :4], atol=1e-3)
    assert out_img.shape == (100, 100, 3)


def test_flip_lr_roundtrip():
    img = np.zeros((50, 80, 3), np.uint8)
    labels = np.array([[10.0, 5.0, 30.0, 25.0, 0.0]], np.float32)
    img2, lab2 = flip_lr(img, labels)
    img3, lab3 = flip_lr(img2, lab2)
    np.testing.assert_allclose(lab3, labels)


def test_mosaic_output_shape(yolo_dir):
    ds = YOLODataset(yolo_dir, img_size=320)
    mds = MosaicMixupDataset(ds, img_size=320, enable_mixup=True)
    rng = np.random.default_rng(5)
    img, labels = mds.getitem(rng, 0)
    assert img.shape == (320, 320, 3)
    if len(labels):
        assert (labels[:, :4] >= 0).all()
        assert (labels[:, [0, 2]] <= 320).all()
        assert (labels[:, [1, 3]] <= 320).all()


def test_infinite_indices_sharding():
    a = [next(g) for g in [infinite_indices(10, seed=1, shard=0, num_shards=2)] for _ in range(10)]
    b_gen = infinite_indices(10, seed=1, shard=1, num_shards=2)
    b = [next(b_gen) for _ in range(10)]
    # two shards of the same epoch cover disjoint halves
    assert set(a[:5]).isdisjoint(set(b[:5]))
    assert set(a[:5]) | set(b[:5]) == set(range(10))


def test_pad_targets():
    labels = [
        np.array([[0.0, 0.0, 64.0, 64.0, 2.0]], np.float32),
        np.zeros((0, 5), np.float32),
    ]
    t = pad_targets(labels, (128, 128), max_labels=4)
    assert t.shape == (2, 4, 5)
    assert t[0, 0, 0] == 2.0
    np.testing.assert_allclose(t[0, 0, 1:], [0.25, 0.25, 0.5, 0.5])
    assert (t[1] == -1).all()
    assert (t[0, 1:] == -1).all()


def test_train_loader_batches(yolo_dir):
    ds = YOLODataset(yolo_dir, img_size=128)
    loader = TrainLoader(ds, batch_size=4, img_size=128, prefetch=1,
                         aug_cfg={"enable_mosaic": True, "mosaic_prob": 1.0})
    it = iter(loader)
    batch = next(it)
    assert batch["image"].shape == (4, 128, 128, 3)
    assert batch["image"].dtype == np.uint8  # normalized on device
    assert batch["image"].min() >= 0 and batch["image"].max() <= 255
    assert batch["targets"].shape[0] == 4 and batch["targets"].shape[2] == 5
    loader.close()


def test_val_loader_batches(yolo_dir):
    ds = YOLODataset(yolo_dir, img_size=128)
    loader = ValLoader(ds, batch_size=3, img_size=128)
    batches = list(loader)
    assert len(batches) == 3  # 8 samples in batches of 3
    assert batches[-1]["count"] == 2
    for b in batches:
        assert b["image"].shape == (3, 128, 128, 3)
        assert len(b["info"]) == 3


def test_concat_dataset(yolo_dir):
    from vision_kit_tpu.data.datasets import ConcatDataset, MixConcatDataset

    ds = YOLODataset(yolo_dir, img_size=64)
    cat = ConcatDataset([ds, ds])
    assert len(cat) == 2 * len(ds)
    img0, lab0, hw0, _ = cat.pull_item(0)
    imgN, labN, hwN, _ = cat.pull_item(len(ds))
    np.testing.assert_array_equal(img0, imgN)
    np.testing.assert_array_equal(lab0, labN)

    mix = MixConcatDataset([ds, ds])
    img_t, lab_t, _, _ = mix.pull_item((True, 1))
    img_i, lab_i, _, _ = mix.pull_item(1)
    np.testing.assert_array_equal(img_t, img_i)


def test_coco_dataset(tmp_path):
    """Synthetic COCO-format dataset: json parsing, annotation cleaning,
    non-contiguous category ids, pull_item scaling."""
    import json as _json

    from vision_kit_tpu.data.datasets import COCODataset

    root = tmp_path / "coco"
    (root / "annotations").mkdir(parents=True)
    (root / "val").mkdir()
    for i in range(3):
        cv2.imwrite(str(root / "val" / f"im{i}.jpg"),
                    np.full((100, 200, 3), 90, np.uint8))
    coco = {
        "images": [
            {"id": 10 + i, "file_name": f"im{i}.jpg", "height": 100,
             "width": 200} for i in range(3)
        ],
        # non-contiguous COCO-style category ids
        "categories": [{"id": 1, "name": "a"}, {"id": 7, "name": "b"}],
        "annotations": [
            {"image_id": 10, "category_id": 7, "bbox": [10, 20, 50, 40],
             "iscrowd": 0},
            {"image_id": 10, "category_id": 1, "bbox": [0, 0, -5, 10],
             "iscrowd": 0},  # degenerate: dropped
            {"image_id": 11, "category_id": 1, "bbox": [5, 5, 20, 20],
             "iscrowd": 1},  # crowd: dropped
        ],
    }
    with open(root / "annotations" / "instances_val.json", "w") as f:
        _json.dump(coco, f)

    ds = COCODataset(str(root), json_file="instances_val.json", name="val",
                     img_size=50)
    assert len(ds) == 3
    assert ds.class_names == ["a", "b"]
    img, labels, (h0, w0), img_id = ds.pull_item(0)
    assert (h0, w0) == (100, 200) and img_id == 10
    assert labels.shape == (1, 5)
    # category 7 -> contiguous index 1; bbox scaled by r = 50/200
    r = 0.25
    np.testing.assert_allclose(labels[0], [10 * r, 20 * r, 60 * r, 60 * r, 1],
                               atol=1e-5)
    assert ds.pull_item(1)[1].shape == (0, 5)  # crowd dropped


def test_train_loader_workers_deterministic(yolo_dir):
    """num_workers>0 must reproduce the exact single-thread batch stream
    (deterministic index positions + per-sample seeds)."""
    ds = YOLODataset(yolo_dir, img_size=64)
    aug = dict(mosaic_prob=1.0, mixup_prob=0.0, hsv_prob=1.0)
    l0 = TrainLoader(ds, 4, img_size=64, aug_cfg=aug, num_workers=0)
    l2 = TrainLoader(ds, 4, img_size=64, aug_cfg=aug, num_workers=2)
    it0, it2 = iter(l0), iter(l2)
    for _ in range(4):
        b0, b2 = next(it0), next(it2)
        np.testing.assert_array_equal(b0["image"], b2["image"])
        np.testing.assert_array_equal(b0["targets"], b2["targets"])
    l0.close()
    l2.close()


def test_train_loader_worker_crash_propagates(yolo_dir, tmp_path):
    """A dying worker must surface as a RuntimeError, not a silent hang."""
    import shutil

    # dataset whose image files vanish after label caching -> decode error
    root = tmp_path / "ds"
    shutil.copytree(yolo_dir, root)
    ds = YOLODataset(str(root), img_size=64)
    for f in (root / "images").glob("*.jpg"):
        f.write_bytes(b"not a jpeg")
    loader = TrainLoader(ds, 2, img_size=64, aug_cfg={}, num_workers=1)
    with pytest.raises(RuntimeError, match="worker"):
        next(iter(loader))
    loader.close()


# -- image integrity (EXIF + corrupt JPEG), reference yolo.py:251-268 -----

def _mk_yolo_dir(root):
    (root / "images").mkdir(parents=True, exist_ok=True)
    (root / "labels").mkdir(parents=True, exist_ok=True)


def test_exif_rotated_jpeg_dims_and_decode_align(tmp_path):
    """An EXIF-rotated JPEG must decode in display orientation (labels are
    written for what the user sees) on BOTH the python and native paths."""
    from PIL import Image

    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_yolo_dir(tmp_path)
    # stored 200w x 100h, orientation 6 (90 CW) -> displayed 100w x 200h
    rng = np.random.default_rng(0)
    arr = rng.integers(0, 255, (100, 200, 3), dtype=np.uint8)
    ex = Image.Exif()
    ex[274] = 6
    Image.fromarray(arr).save(
        str(tmp_path / "images" / "r.jpg"), exif=ex.tobytes()
    )
    (tmp_path / "labels" / "r.txt").write_text("0 0.5 0.5 0.5 0.5")

    ds = YOLODataset(str(tmp_path), img_size=(64, 64), cache=False)
    img, labels, (h0, w0), _ = ds.pull_item(0)
    assert (h0, w0) == (200, 100)  # display orientation
    import os as _os

    _os.environ["VK_NO_NATIVE"] = "1"
    try:
        img_py, _, hw0_py, _ = ds.pull_item(0)
    finally:
        del _os.environ["VK_NO_NATIVE"]
    assert hw0_py == (200, 100)
    np.testing.assert_array_equal(img, img_py)


def test_truncated_jpeg_restored(tmp_path):
    """A truncated JPEG is detected at scan time, restored in place with a
    warning, and the sample stays usable (reference yolo.py:260-267)."""
    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_yolo_dir(tmp_path)
    rng = np.random.default_rng(1)
    for i in range(3):
        img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    p = tmp_path / "images" / "1.jpg"
    data = p.read_bytes()
    p.write_bytes(data[:-60])  # chop the tail incl. the EOI marker

    ds = YOLODataset(str(tmp_path), img_size=(64, 64), cache=False)
    assert len(ds) == 3  # restored, not dropped
    assert p.read_bytes()[-2:] == b"\xff\xd9"  # rewritten with EOI
    img, labels, hw0, _ = ds.pull_item(1)
    assert img is not None and hw0 == (80, 120)


def test_unreadable_image_dropped_not_crashed(tmp_path):
    """Garbage image files are logged and skipped; the dataset and loaders
    keep working on the remaining samples."""
    from vision_kit_tpu.data.datasets import YOLODataset
    from vision_kit_tpu.data.loader import ValLoader

    _mk_yolo_dir(tmp_path)
    rng = np.random.default_rng(2)
    for i in range(4):
        img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    (tmp_path / "images" / "bad.jpg").write_bytes(b"not an image at all")
    (tmp_path / "labels" / "bad.txt").write_text("0 0.5 0.5 0.4 0.4")

    ds = YOLODataset(str(tmp_path), img_size=(64, 64), cache=False)
    assert len(ds) == 4  # bad.jpg dropped
    assert not any("bad.jpg" in f for f in ds.img_files)
    batches = list(ValLoader(ds, 2, img_size=(64, 64)))
    assert sum(b["count"] for b in batches) == 4


def test_integrity_verdicts_cached(tmp_path):
    """The drop verdicts persist in the label cache: a second construction
    over the same file list skips the bad file without rescanning."""
    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_yolo_dir(tmp_path)
    rng = np.random.default_rng(3)
    for i in range(2):
        img = rng.integers(0, 255, (80, 120, 3), dtype=np.uint8)
        cv2.imwrite(str(tmp_path / "images" / f"{i}.jpg"), img)
        (tmp_path / "labels" / f"{i}.txt").write_text("0 0.5 0.5 0.4 0.4")
    (tmp_path / "images" / "bad.jpg").write_bytes(b"junk")

    ds1 = YOLODataset(str(tmp_path), img_size=(64, 64), cache=True)
    assert len(ds1) == 2
    ds2 = YOLODataset(str(tmp_path), img_size=(64, 64), cache=True)
    assert len(ds2) == 2 and ds2.img_files == ds1.img_files


def test_duplicate_labels_removed(tmp_path):
    """Duplicate label rows are deduplicated with a warning (reference
    check_label, yolo.py:283-287)."""
    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_yolo_dir(tmp_path)
    img = np.full((80, 120, 3), 100, np.uint8)
    cv2.imwrite(str(tmp_path / "images" / "0.jpg"), img)
    (tmp_path / "labels" / "0.txt").write_text(
        "0 0.5 0.5 0.4 0.4\n0 0.5 0.5 0.4 0.4\n1 0.25 0.25 0.2 0.2"
    )
    ds = YOLODataset(str(tmp_path), img_size=(64, 64), cache=False)
    assert len(ds.labels[0]) == 2


def _mk_rect_set(root, n=8):
    """n rectangle images + labels under root (YOLO layout)."""
    img_dir, lbl_dir = root / "images", root / "labels"
    img_dir.mkdir(parents=True, exist_ok=True)
    lbl_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(11)
    for i in range(n):
        h, w = int(rng.integers(100, 200)), int(rng.integers(100, 200))
        img = np.full((h, w, 3), 64, np.uint8)
        img[10:40, 10:50] = (200, 60, 30)
        cv2.imwrite(str(img_dir / f"r{i}.jpg"), img)
        (lbl_dir / f"r{i}.txt").write_text("0 0.3 0.25 0.3 0.3")


def test_disk_cache_build_is_restartable(tmp_path, monkeypatch):
    """A disk-cache build killed mid-way resumes where it stopped: only the
    missing rows are decoded on restart, and the final cache is
    sample-identical to the uncached path (VERDICT r2 #6 — at COCO scale
    the build is hours, and it used to restart from zero)."""
    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_rect_set(tmp_path, n=8)
    plain = YOLODataset(str(tmp_path), img_size=96)

    # 3-image chunks; die after the 2nd chunk (6 rows built, 2 missing)
    monkeypatch.setattr(YOLODataset, "cache_build_chunk", 3, raising=False)
    calls = {"n": 0}
    orig_batch = YOLODataset._decode_resized_batch

    def dying(self, idxs):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated kill")
        return orig_batch(self, idxs)

    monkeypatch.setattr(YOLODataset, "_decode_resized_batch", dying)
    with pytest.raises(RuntimeError, match="simulated kill"):
        YOLODataset(str(tmp_path), img_size=96, cache_images="disk")

    import glob as _glob
    metas = _glob.glob(str(tmp_path / ".vk_imgcache_*.meta.npy"))
    assert len(metas) == 1
    meta = np.load(metas[0])
    assert (meta[:, 0] > 0).sum() == 6  # two chunks of three published

    # restart: only the 2 missing rows are decoded
    decoded_rows = []

    def counting(self, idxs):
        decoded_rows.extend(idxs)
        return orig_batch(self, idxs)

    monkeypatch.setattr(YOLODataset, "_decode_resized_batch", counting)
    ds = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    assert sorted(decoded_rows) == np.flatnonzero(meta[:, 0] == 0).tolist()
    for i in range(len(plain)):
        img_a, lab_a, hw0_a, _ = plain.pull_item(i)
        img_b, lab_b, hw0_b, _ = ds.pull_item(i)
        np.testing.assert_array_equal(img_a, img_b)
        np.testing.assert_array_equal(lab_a, lab_b)
        assert hw0_a == hw0_b


def test_disk_cache_truncated_dat_rebuilds(tmp_path, monkeypatch):
    """A corrupt/truncated .dat whose meta survived (partial copy, fs
    damage) must trigger a rebuild with a warning, not crash dataset
    construction — both the complete-reuse and the mid-build-resume
    paths (round-3 review finding)."""
    import glob as _glob

    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_rect_set(tmp_path, n=4)
    plain = YOLODataset(str(tmp_path), img_size=96)
    # copies, NOT memmap views — the truncation below invalidates mappings
    expect = {i: np.array(plain.pull_item(i)[0]) for i in range(4)}
    YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    dat = _glob.glob(str(tmp_path / ".vk_imgcache_*.dat"))[0]

    # complete meta + truncated pixels -> reuse path must fall back to build
    with open(dat, "r+b") as f:
        f.truncate(1024)
    ds = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    for i in range(4):
        np.testing.assert_array_equal(expect[i], ds.pull_item(i)[0])

    # partial meta + truncated pixels -> resume path must restart the build
    meta_path = dat + ".meta.npy"
    meta = np.load(meta_path)
    meta[2:] = 0
    np.save(meta_path, meta)
    with open(dat, "r+b") as f:
        f.truncate(1024)
    ds2 = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    for i in range(4):
        np.testing.assert_array_equal(expect[i], ds2.pull_item(i)[0])


def test_disk_cache_crash_mid_rebuild_not_black(tmp_path, monkeypatch):
    """Crash AFTER the rebuild's zero-filling 'w+' open but BEFORE the first
    chunk republishes meta: the stale meta claiming rows built must have
    been deleted first, or the next construction would pass both the
    complete-meta reuse check and the size check and silently serve black
    images (round-3 advisor finding)."""
    import glob as _glob

    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_rect_set(tmp_path, n=4)
    plain = YOLODataset(str(tmp_path), img_size=96)
    expect = {i: np.array(plain.pull_item(i)[0]) for i in range(4)}
    YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    dat = _glob.glob(str(tmp_path / ".vk_imgcache_*.dat"))[0]

    # complete meta + truncated pixels -> rebuild path engages; die before
    # ANY chunk completes (the advisor's crash window)
    with open(dat, "r+b") as f:
        f.truncate(1024)

    def dying(self, idxs):
        raise RuntimeError("simulated kill mid-rebuild")

    monkeypatch.setattr(YOLODataset, "_decode_resized_batch", dying)
    with pytest.raises(RuntimeError, match="simulated kill"):
        YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    monkeypatch.undo()

    # the .dat is now full-size and zero-filled; a surviving stale meta
    # would make this construction reuse it as "complete" -> black images
    ds = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    for i in range(4):
        np.testing.assert_array_equal(expect[i], ds.pull_item(i)[0])


def test_disk_cache_shared_across_subset_split(tmp_path, monkeypatch):
    """A dataset whose file list is a subset of an already-built cache
    (same size/decode mode) adopts that cache read-only via a row map —
    zero re-decode — and still round-trips through pickling (spawn
    workers)."""
    import pickle

    from vision_kit_tpu.data.datasets import YOLODataset

    _mk_rect_set(tmp_path, n=8)
    full = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    expect = {i: full.pull_item(i) for i in range(8)}

    # drop two images -> the new file list is a strict subset
    for k in (2, 5):
        os.remove(str(tmp_path / "images" / f"r{k}.jpg"))
        os.remove(str(tmp_path / "labels" / f"r{k}.txt"))

    def no_decode(self, idxs):
        raise AssertionError("subset split must not re-decode")

    monkeypatch.setattr(YOLODataset, "_decode_resized_batch", no_decode)
    sub = YOLODataset(str(tmp_path), img_size=96, cache_images="disk")
    assert len(sub) == 6
    assert sub._mm_rows is not None
    kept = [i for i in range(8) if i not in (2, 5)]
    for j, i in enumerate(kept):
        img_b, lab_b, hw0_b, _ = sub.pull_item(j)
        np.testing.assert_array_equal(expect[i][0], img_b)
        assert expect[i][2] == hw0_b
    clone = pickle.loads(pickle.dumps(sub))
    np.testing.assert_array_equal(clone.pull_item(0)[0], expect[0][0])
