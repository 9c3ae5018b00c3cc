"""Round-4 regression tests."""

import os

TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")

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


def test_zoo_module_event_parser_tie_break(tmp_path):
    """bench_zoo's trace parser must pick the DETECTOR module when a small
    helper program executes the same number of times (regression: the
    in-trace input-perturbation add shadowed the detector on the
    max-by-count tie, reporting 0.01 ms 'device latency')."""
    import sys

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, TOOLS)
    from bench_zoo import _module_exec_times_ms

    @jax.jit
    def heavy(x):
        for _ in range(4):
            x = jnp.tanh(x @ x)
        return x

    @jax.jit
    def tiny(k):
        return k + 1

    x = jnp.ones((256, 256), jnp.float32)
    heavy(x).block_until_ready()
    tiny(jnp.int32(0)).block_until_ready()
    trace_dir = str(tmp_path / "trace")
    with jax.profiler.trace(trace_dir):
        acc = jnp.int32(0)
        for _ in range(8):
            y = heavy(x)
            acc = tiny(acc)
        y.block_until_ready()
        acc.block_until_ready()
    times = _module_exec_times_ms(trace_dir)
    assert len(times) >= 8
    # the heavy module's per-exec time dwarfs the tiny add's; if the
    # parser picked `tiny`, the median would be ~microseconds
    med_heavy = sorted(times)[len(times) // 2]
    with jax.profiler.trace(str(tmp_path / "trace2")):
        acc = jnp.int32(0)
        for _ in range(8):
            acc = tiny(acc)
        acc.block_until_ready()
    tiny_times = _module_exec_times_ms(str(tmp_path / "trace2"))
    med_tiny = sorted(tiny_times)[len(tiny_times) // 2]
    assert med_heavy > med_tiny * 3, (med_heavy, med_tiny)
