"""Round-4 regression tests."""

import numpy as np

import jax.numpy as jnp


def test_grid_save_accepts_xla_layout_arrays(tmp_path):
    """grid_save must draw on arrays converted straight from jax: XLA's CPU
    layout can be channel-major (strides like (64, 1, 4096) for HWC), which
    numpy's astype/copy preserve under the default order='K' and
    OpenCV >= 5 rejects as a drawing destination. Regression: the at-scale
    run's device-aug sample grids all failed with 'Layout of the output
    array img is incompatible with cv::Mat'."""
    from vision_kit_tpu.utils.drawing import grid_save

    rng = np.random.default_rng(0)
    imgs = np.asarray(jnp.asarray(
        rng.random((4, 64, 64, 3), dtype=np.float32)))
    targets = np.tile(
        np.array([[[0, 0.5, 0.5, 0.3, 0.3]]], np.float32), (4, 1, 1))
    path = str(tmp_path / "grid.jpg")
    grid = grid_save(imgs, targets, path)
    assert grid.shape == (128, 128, 3)
    import os

    assert os.path.getsize(path) > 0
    # boxes actually landed on the canvas (drawing didn't no-op)
    ref = (np.clip(np.asarray(imgs[0]), 0, 1) * 255).astype(np.uint8)
    assert np.abs(grid[:64, :64].astype(int) - ref.astype(int)).max() > 30


def test_grid_save_does_not_deface_caller_batch(tmp_path):
    """The copy-before-draw contract holds for plain C-order uint8 input."""
    from vision_kit_tpu.utils.drawing import grid_save

    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), dtype=np.uint8)
    before = imgs.copy()
    targets = np.tile(
        np.array([[[1, 0.5, 0.5, 0.4, 0.4]]], np.float32), (2, 1, 1))
    grid_save(imgs, targets, str(tmp_path / "g.jpg"))
    np.testing.assert_array_equal(imgs, before)
