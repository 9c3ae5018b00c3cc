"""Device augmentation kernel vs host/cv2 oracles.

The device path (data/device_aug.py) is a new augmentation mode, not a
bit-clone of the host pipeline — these tests pin its semantics against
independently-constructed oracles:
  * mosaic+affine vs a materialized-canvas + cv2.warpAffine reference
    (exact for integer affines, tolerance for fractional: cv2 samples with
    5-bit fixed-point taps),
  * plain samples vs the center-pad host path (exact),
  * mixup vs a numpy replication of the reference geometry,
  * HSV vs the host cv2-LUT implementation (tolerance: LUT quantization),
  * planner labels vs pixels (painted boxes land where labels say).
"""

import numpy as np
import cv2
import pytest

from vision_kit_tpu.data.device_aug import (
    DeviceAugPlanner,
    N_PARAMS,
    N_TILES,
    P_FLIP_LR,
    P_FLIP_UD,
    P_HSV_H,
    P_HSV_S,
    P_HSV_V,
    P_MIX_FLIP,
    P_MIX_JIT,
    P_MIX_OH,
    P_MIX_OW,
    P_MIX_W,
    P_MIX_XOFF,
    P_MIX_YOFF,
    P_SCALE,
    P_TX,
    P_TY,
    P_XC,
    P_YC,
    warp_augment,
)
from vision_kit_tpu.data.mosaic import mosaic_coordinate

S = 64  # test resolution


def base_params():
    p = np.zeros(N_PARAMS, np.float32)
    p[P_SCALE] = 1.0
    p[[P_HSV_H, P_HSV_S, P_HSV_V]] = 1.0
    p[P_MIX_JIT] = 1.0
    p[P_MIX_OW] = p[P_MIX_OH] = S
    return p


def make_tiles(rng, sizes):
    """tiles buffer (1, N_TILES, S, S, 3) u8 + tile_hw; sizes: list of
    (h, w) per slot (None -> empty slot)."""
    tiles = rng.integers(0, 255, (1, N_TILES, S, S, 3), dtype=np.uint8)
    hw = np.zeros((1, N_TILES, 2), np.int32)
    imgs = []
    for t, sz in enumerate(sizes):
        if sz is None:
            imgs.append(None)
            continue
        h, w = sz
        hw[0, t] = (h, w)
        imgs.append(np.array(tiles[0, t, :h, :w]))
    return tiles, hw, imgs


def paste_canvas(imgs, hw, xc, yc):
    """Oracle: materialize the 2Sx2S canvas with the host path's own
    placement helper (data/mosaic.py mosaic_coordinate)."""
    canvas = np.full((2 * S, 2 * S, 3), 114, np.uint8)
    for t in range(4):
        h, w = int(hw[0, t, 0]), int(hw[0, t, 1])
        if h == 0:
            continue
        (lx1, ly1, lx2, ly2), (sx1, sy1, sx2, sy2) = mosaic_coordinate(
            t, xc, yc, w, h, S, S
        )
        canvas[ly1:ly2, lx1:lx2] = imgs[t][sy1:sy2, sx1:sx2]
    return canvas


def run_kernel(tiles, hw, p):
    out = np.asarray(warp_augment(tiles, hw, p[None, :]))
    return out[0] * 255.0


@pytest.mark.parametrize("seed", [0, 1])
def test_mosaic_integer_affine_exact(seed):
    rng = np.random.default_rng(seed)
    sizes = [(S, S), (S - 9, S), (S, S - 17), (S - 3, S - 5)]
    tiles, hw, imgs = make_tiles(rng, sizes + [None])
    xc = int(rng.integers(S // 2, 3 * S // 2))
    yc = int(rng.integers(S // 2, 3 * S // 2))
    p = base_params()
    p[P_XC], p[P_YC] = xc, yc
    tx, ty = int(rng.integers(-6, 7)), int(rng.integers(-6, 7))
    p[P_TX], p[P_TY] = tx, ty

    canvas = paste_canvas(imgs, hw, xc, yc)
    # integer scale-1 affine == integer crop/shift with 114 border
    oracle = np.full((S, S, 3), 114.0, np.float32)
    ys = np.arange(S) - ty
    xs = np.arange(S) - tx
    vy = (ys >= 0) & (ys < 2 * S)
    vx = (xs >= 0) & (xs < 2 * S)
    oracle[np.ix_(vy, vx)] = canvas[np.ix_(ys[vy], xs[vx])]

    got = run_kernel(tiles, hw, p)
    np.testing.assert_allclose(got, oracle, atol=1e-3)


@pytest.mark.parametrize("scale", [0.5, 0.77, 1.3])
def test_mosaic_fractional_affine_vs_cv2(scale):
    rng = np.random.default_rng(3)
    sizes = [(S, S), (S - 9, S), (S, S - 17), (S - 3, S - 5)]
    tiles, hw, imgs = make_tiles(rng, sizes + [None])
    xc, yc = 70, 61
    p = base_params()
    p[P_XC], p[P_YC] = xc, yc
    p[P_SCALE] = scale
    p[P_TX], p[P_TY] = 3.25, -2.5

    canvas = paste_canvas(imgs, hw, xc, yc)
    M = np.array([[scale, 0, p[P_TX]], [0, scale, p[P_TY]]], np.float64)
    oracle = cv2.warpAffine(
        canvas, M, dsize=(S, S), borderValue=(114, 114, 114)
    ).astype(np.float32)

    got = run_kernel(tiles, hw, p)
    diff = np.abs(got - oracle)
    # cv2 uses 5-bit fixed-point bilinear taps; allow small drift
    assert np.mean(diff) < 1.0, np.mean(diff)
    assert np.quantile(diff, 0.999) <= 16.0


def test_plain_center_pad_exact():
    rng = np.random.default_rng(5)
    h, w = 40, 64
    tiles, hw, imgs = make_tiles(rng, [(h, w), None, None, None, None])
    left, top = (S - w) // 2, (S - h) // 2
    p = base_params()
    p[P_XC], p[P_YC] = 2 * S, 2 * S
    p[P_TX] = left - (2 * S - w)
    p[P_TY] = top - (2 * S - h)

    oracle = np.full((S, S, 3), 114.0, np.float32)
    oracle[top:top + h, left:left + w] = imgs[0]
    got = run_kernel(tiles, hw, p)
    np.testing.assert_allclose(got, oracle, atol=1e-3)


@pytest.mark.parametrize("jit_s,flip", [(0.6, False), (1.4, True)])
def test_mixup_vs_numpy_oracle(jit_s, flip):
    rng = np.random.default_rng(7)
    h4, w4 = 50, 60
    tiles, hw, imgs = make_tiles(
        rng, [(S, S), (S, S), (S, S), (S, S), (h4, w4)]
    )
    # contract: slot 4's margin reads as the reference's 114-gray
    # letterbox canvas (the loader fills it)
    tiles[0, 4, h4:, :] = 114
    tiles[0, 4, :, w4:] = 114
    p = base_params()
    p[P_XC], p[P_YC] = S, S
    ow, oh = int(S * jit_s), int(S * jit_s)
    x_off = max(ow - S, 0) // 2
    y_off = max(oh - S, 0) // 3
    p[P_MIX_W] = 0.5
    p[P_MIX_JIT] = jit_s
    p[P_MIX_OW], p[P_MIX_OH] = ow, oh
    p[P_MIX_FLIP] = float(flip)
    p[P_MIX_XOFF], p[P_MIX_YOFF] = x_off, y_off

    # oracle mixup half (reference mosiac_dataset.py:177-254): content
    # letterboxed onto a 114-gray canvas, jit-resized, zero-padded, cropped
    cp = np.full((S, S, 3), 114, np.uint8)
    cp[:h4, :w4] = imgs[4]
    resized = cv2.resize(cp, (ow, oh), interpolation=cv2.INTER_LINEAR)
    if flip:
        resized = resized[:, ::-1]
    padded = np.zeros((max(oh, S), max(ow, S), 3), np.uint8)
    padded[:oh, :ow] = resized
    crop = padded[y_off:y_off + S, x_off:x_off + S].astype(np.float32)

    base = run_kernel(tiles, hw, base_params_like(p))
    got = run_kernel(tiles, hw, p)
    oracle = 0.5 * base + 0.5 * crop
    diff = np.abs(got - oracle)
    assert np.mean(diff) < 1.0, np.mean(diff)
    assert np.quantile(diff, 0.999) <= 16.0


def base_params_like(p):
    q = p.copy()
    q[P_MIX_W] = 0.0
    q[P_MIX_JIT] = 1.0
    q[P_MIX_OW] = q[P_MIX_OH] = S
    q[P_MIX_FLIP] = 0.0
    q[P_MIX_XOFF] = q[P_MIX_YOFF] = 0.0
    return q


def test_hsv_vs_cv2_lut():
    from vision_kit_tpu.data.augment import augment_hsv

    rng = np.random.default_rng(11)
    img = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
    gains = np.array([1.012, 1.31, 0.78])

    class FixedRng:
        def uniform(self, lo, hi, n=None):
            return (gains - 1.0) / np.array([0.015, 0.7, 0.4])

    oracle = augment_hsv(
        FixedRng(), img, h_gain=0.015, s_gain=0.7, v_gain=0.4
    ).astype(np.float32)

    tiles = np.zeros((1, N_TILES, S, S, 3), np.uint8)
    tiles[0, 0] = img
    hw = np.zeros((1, N_TILES, 2), np.int32)
    hw[0, 0] = (S, S)
    p = base_params()
    p[P_XC], p[P_YC] = 2 * S, 2 * S
    p[P_TX] = -(2 * S - S)
    p[P_TY] = -(2 * S - S)
    p[P_HSV_H], p[P_HSV_S], p[P_HSV_V] = gains
    got = run_kernel(tiles, hw, p)
    diff = np.abs(got - oracle)
    # LUT quantization + hue-wrap pixels: compare distributionally
    assert np.mean(diff) < 3.0, np.mean(diff)
    assert (diff > 12).mean() < 0.01


def test_hsv_unity_gains_bit_exact():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
    tiles = np.zeros((1, N_TILES, S, S, 3), np.uint8)
    tiles[0, 0] = img
    hw = np.zeros((1, N_TILES, 2), np.int32)
    hw[0, 0] = (S, S)
    p = base_params()
    p[P_XC], p[P_YC] = 2 * S, 2 * S
    p[P_TX] = -(2 * S - S)
    p[P_TY] = -(2 * S - S)
    got = run_kernel(tiles, hw, p)
    np.testing.assert_allclose(got, img.astype(np.float32), atol=1e-3)


def test_flips_exact():
    rng = np.random.default_rng(17)
    img = rng.integers(0, 255, (S, S, 3), dtype=np.uint8)
    tiles = np.zeros((1, N_TILES, S, S, 3), np.uint8)
    tiles[0, 0] = img
    hw = np.zeros((1, N_TILES, 2), np.int32)
    hw[0, 0] = (S, S)
    p = base_params()
    p[P_XC], p[P_YC] = 2 * S, 2 * S
    p[P_TX] = -(2 * S - S)
    p[P_TY] = -(2 * S - S)
    p[P_FLIP_LR] = 1.0
    got = run_kernel(tiles, hw, p)
    np.testing.assert_allclose(got, img[:, ::-1].astype(np.float32),
                               atol=1e-3)
    p[P_FLIP_LR], p[P_FLIP_UD] = 0.0, 1.0
    got = run_kernel(tiles, hw, p)
    np.testing.assert_allclose(got, img[::-1].astype(np.float32), atol=1e-3)


class _BoxDataset:
    """Synthetic pull_item dataset: each image has one colored box whose
    color encodes its index; labels mark the box."""

    def __init__(self, n=8, hw=(S, S)):
        self.n = n
        self.hw = hw
        self.labels = [np.zeros((1, 5), np.float32) for _ in range(n)]

    def __len__(self):
        return self.n

    def pull_item(self, idx):
        h, w = self.hw
        img = np.zeros((h, w, 3), np.uint8)
        x1, y1, x2, y2 = 10, 14, w - 12, h - 9
        img[y1:y2, x1:x2] = (50 + 20 * (idx % 8), 200, 90)
        lab = np.array([[x1, y1, x2, y2, float(idx % 3)]], np.float32)
        return img, lab, (h, w), idx

    def load_anno(self, idx):
        return self.pull_item(idx)[1]


def test_planner_labels_match_pixels():
    ds = _BoxDataset()
    planner = DeviceAugPlanner(
        ds, img_size=(S, S), enable_mosaic=True, enable_mixup=False,
        mosaic_prob=1.0, hsv_prob=0.0, flip_lr_prob=0.5,
        translate=0.1, mosaic_scale=(0.6, 1.4),
    )
    for seed in range(4):
        rng = np.random.default_rng([seed, 77, 5])
        tile_idxs, draws = planner.plan(rng, 2)
        items = [ds.pull_item(i) for i in tile_idxs]
        params, tile_hw, labels, tile_imgs = planner.finalize(draws, items)

        tiles = np.zeros((1, N_TILES, S, S, 3), np.uint8)
        hw = np.zeros((1, N_TILES, 2), np.int32)
        for t, img in enumerate(tile_imgs):
            if img is None:
                continue
            h, w = img.shape[:2]
            tiles[0, t, :h, :w] = img
            hw[0, t] = (h, w)
        out = run_kernel(tiles, hw, params)

        # every surviving label box must cover green-ish pixels
        for x1, y1, x2, y2, _ in labels:
            cx = int((x1 + x2) / 2)
            cy = int((y1 + y2) / 2)
            if (x2 - x1) < 6 or (y2 - y1) < 6:
                continue  # too small to probe the interior robustly
            pix = out[cy - 1:cy + 2, cx - 1:cx + 2]
            assert pix[..., 1].mean() > 100, (
                f"seed {seed}: label at {(x1, y1, x2, y2)} not on a box, "
                f"pixel {pix.mean(axis=(0, 1))}"
            )


def test_planner_determinism():
    ds = _BoxDataset()
    planner = DeviceAugPlanner(ds, img_size=(S, S), enable_mixup=True)

    def make(seed):
        rng = np.random.default_rng([seed, 77, 3])
        tile_idxs, draws = planner.plan(rng, 1)
        items = [ds.pull_item(i) for i in tile_idxs]
        return planner.finalize(draws, items)

    p1, hw1, l1, _ = make(0)
    p2, hw2, l2, _ = make(0)
    np.testing.assert_array_equal(p1, p2)
    np.testing.assert_array_equal(hw1, hw2)
    np.testing.assert_array_equal(l1, l2)
    p3, _, _, _ = make(1)
    assert not np.array_equal(p1, p3)


def test_four_slot_tiles_skip_mixup():
    """A 4-slot tiles buffer (loader with mixup off) must produce exactly
    the 5-slot result at P_MIX_W = 0."""
    rng = np.random.default_rng(19)
    sizes = [(S, S), (S - 9, S), (S, S - 17), (S - 3, S - 5)]
    tiles, hw, _ = make_tiles(rng, sizes + [None])
    p = base_params()
    p[P_XC], p[P_YC] = 70, 61
    p[P_SCALE], p[P_TX], p[P_TY] = 0.9, 3.25, -2.5
    full = run_kernel(tiles, hw, p)
    cut = run_kernel(tiles[:, :4], hw[:, :4], p)
    np.testing.assert_allclose(cut, full, atol=1e-3)


def test_planner_rejects_rotation():
    with pytest.raises(ValueError):
        DeviceAugPlanner(_BoxDataset(), degrees=10.0)


def test_spawn_workers_match_inline():
    """Spawn-worker device-aug batches are bit-identical to the inline
    path (determinism is per batch id, independent of worker count)."""
    from vision_kit_tpu.data.loader import TrainLoader

    def batches(num_workers, n=3):
        loader = TrainLoader(
            _BoxDataset(), batch_size=2, img_size=(S, S),
            aug_cfg={"enable_mosaic": True, "enable_mixup": True},
            prefetch=1, device_aug=True, num_workers=num_workers,
        )
        try:
            it = iter(loader)
            return [next(it) for _ in range(n)]
        finally:
            loader.close()

    inline = batches(0)
    workered = batches(1)
    for a, b in zip(inline, workered):
        for k in ("tiles", "tile_hw", "params", "targets"):
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_loader_device_mode_and_train_step():
    """End-to-end: TrainLoader(device_aug=True) yields the tiles schema, and
    make_train_step(device_aug=True) on it produces the same losses as the
    standard step fed the identical warp precomputed outside the jit."""
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.data.loader import TrainLoader
    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.train.losses import YoloLoss
    from vision_kit_tpu.train.optim import make_optimizer
    from vision_kit_tpu.train.step import create_train_state, make_train_step

    hyp = {
        "lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
        "warmup_epochs": 3.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
        "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
        "anchor_t": 4.0, "label_smoothing": 0.0,
    }
    ds = _BoxDataset()
    loader = TrainLoader(
        ds, batch_size=2, img_size=(S, S),
        aug_cfg={"enable_mosaic": True, "enable_mixup": True},
        prefetch=1, device_aug=True,
    )
    try:
        it = iter(loader)
        batch = next(it)
        assert batch["tiles"].shape == (2, N_TILES, S, S, 3)
        assert batch["tiles"].dtype == np.uint8
        assert batch["tile_hw"].shape == (2, N_TILES, 2)
        assert batch["params"].shape == (2, N_PARAMS)
        assert batch["targets"].shape[0] == 2 and batch["targets"].shape[2] == 5

        model = YOLOV5(variant="n", num_classes=3)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3)), training=False
        )
        tx = make_optimizer(variables["params"], hyp, max_epochs=10,
                            steps_per_epoch=50)
        loss = YoloLoss(3, model.grid_anchors, hyp)

        step_da = make_train_step(model, loss, tx, donate=False,
                                  device_aug=True)
        step_host = make_train_step(model, loss, tx, donate=False)
        host_batch = {
            "image": np.asarray(warp_augment(
                batch["tiles"], batch["tile_hw"], batch["params"]
            )),
            "targets": batch["targets"],
        }
        state_da = create_train_state(variables, tx)
        state_host = create_train_state(variables, tx)
        for _ in range(3):
            state_da, m_da = step_da(state_da, batch)
            state_host, m_host = step_host(state_host, host_batch)
            assert np.isfinite(float(m_da["loss"]))
            # identical math, in-jit vs precomputed warp
            np.testing.assert_allclose(
                float(m_da["loss"]), float(m_host["loss"]),
                rtol=2e-3, atol=2e-4,
            )
    finally:
        loader.close()
