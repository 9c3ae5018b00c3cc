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

    assert os.path.getsize(path) > 0
    # boxes actually landed on the canvas (drawing didn't no-op)
    ref = (np.clip(np.asarray(imgs[0]), 0, 1) * 255).astype(np.uint8)
    assert np.abs(grid[:64, :64].astype(int) - ref.astype(int)).max() > 30

    # XLA:CPU may legally hand back a row-major buffer, in which case the
    # path above never exercises the strided-destination fix — feed a
    # deterministically non-C-contiguous view too (ADVICE r4)
    strided = np.moveaxis(
        rng.random((4, 3, 64, 64), dtype=np.float32), 1, 3)
    assert not strided.flags["C_CONTIGUOUS"]
    grid2 = grid_save(strided, targets, str(tmp_path / "grid2.jpg"))
    assert grid2.shape == (128, 128, 3)
    ref2 = (np.clip(np.asarray(strided[0]), 0, 1) * 255).astype(np.uint8)
    assert np.abs(grid2[:64, :64].astype(int) - ref2.astype(int)).max() > 30


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
    max-by-count tie, reporting 0.01 ms 'device latency'). The CPU backend
    emits no 'XLA Modules' line, so the xplane is synthesized — this pins
    the proto schema the parser reads AND the tie-break."""
    import sys

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    sys.path.insert(0, TOOLS)
    from bench_zoo import _module_exec_times_ms

    xspace = xplane_pb2.XSpace()
    plane = xspace.planes.add(name="/device:TPU:0")
    plane.event_metadata[1].id = 1
    plane.event_metadata[1].name = "jit_step"
    plane.event_metadata[2].id = 2
    plane.event_metadata[2].name = "jit_add"
    line = plane.lines.add(name="XLA Modules")
    for k in range(8):  # same count; detector ~2 ms, helper ~10 us
        ev = line.events.add(metadata_id=1)
        ev.duration_ps = int(2e9 + k * 1e6)
        ev = line.events.add(metadata_id=2)
        ev.duration_ps = int(1e7)
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with open(d / "host.xplane.pb", "wb") as f:
        f.write(xspace.SerializeToString())

    times = _module_exec_times_ms(str(tmp_path))
    assert len(times) == 8
    # picked jit_step (ms scale), not the equally-frequent jit_add (10 us)
    assert min(times) > 1.0, times
