"""Tests for the auxiliary block-zoo entries (DWConv, DWConvTranspose2d,
Concat, MP, SP) and the demo I/O readers."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_dwconv_shapes_and_grouping():
    from vision_kit_tpu.models.layers import DWConv

    m = DWConv(outs=16, kernel=3, stride=2)
    x = jnp.ones((1, 8, 8, 16))
    v = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(v, x)
    assert y.shape == (1, 4, 4, 16)
    # depthwise: kernel has in-feature dim ins/groups == 1
    k = v["params"]["conv"]["conv"]["kernel"]
    assert k.shape == (3, 3, 1, 16)


@pytest.mark.parametrize("k,s,p,po", [(2, 2, 0, 0), (3, 2, 1, 1), (4, 2, 1, 0)])
def test_dwconv_transpose_matches_torch(k, s, p, po):
    import torch

    from vision_kit_tpu.models.layers import DWConvTranspose2d

    c, hw = 8, 6
    tm = torch.nn.ConvTranspose2d(
        c, c, k, stride=s, padding=p, output_padding=po, groups=c
    )
    x = np.random.default_rng(0).normal(size=(1, c, hw, hw)).astype(np.float32)
    with torch.no_grad():
        ref = tm(torch.from_numpy(x)).numpy()

    m = DWConvTranspose2d(outs=c, kernel=k, stride=s, padding=p, padding_out=po)
    xj = jnp.asarray(x.transpose(0, 2, 3, 1))
    v = m.init(jax.random.PRNGKey(0), xj)
    # torch weight (in, out/groups, kh, kw) -> (kh, kw, 1, c); the module
    # flips spatially internally (transposed-conv semantics), so the raw
    # torch layout converts by pure transpose
    w = tm.weight.detach().numpy()  # (c, 1, k, k), groups=c
    wj = w.transpose(2, 3, 1, 0)  # (k, k, 1, c)
    params = {"params": {"kernel": jnp.asarray(wj),
                         "bias": jnp.asarray(tm.bias.detach().numpy())}}
    y = m.apply(params, xj)
    assert y.shape[1:3] == ref.shape[2:], (y.shape, ref.shape)
    np.testing.assert_allclose(
        np.asarray(y).transpose(0, 3, 1, 2), ref, atol=1e-5
    )


def test_concat_mp_sp():
    from vision_kit_tpu.models.layers import MP, SP, Concat

    x = jnp.arange(32, dtype=jnp.float32).reshape(1, 4, 4, 2)
    y = Concat()([x, x])
    assert y.shape == (1, 4, 4, 4)
    z = MP().apply({}, x) if hasattr(MP(), "apply") else MP()(x)
    z = MP()(x)
    assert z.shape == (1, 2, 2, 2)
    s = SP()(x)
    assert s.shape == x.shape
    # SP is 3x3 max with SAME pad: interior equals local max
    import torch

    ref = torch.nn.functional.max_pool2d(
        torch.from_numpy(np.asarray(x).transpose(0, 3, 1, 2)), 3, 1, 1
    ).numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(np.asarray(s), ref)


def test_image_reader(tmp_path):
    import cv2

    from vision_kit_tpu.utils.readers import ImageReader

    d = tmp_path / "imgs"
    d.mkdir()
    for i in range(3):
        cv2.imwrite(str(d / f"x{i}.jpg"), np.full((8, 8, 3), i * 10, np.uint8))
    (d / "skip.txt").write_text("not an image")
    r = ImageReader(str(d), save_path=str(tmp_path / "out"))
    frames = [img for ok, img in r if ok]
    assert len(r) == 3 and len(frames) == 3
    out = r.save(frames[0], "x0.jpg")
    assert out.endswith("x0_res.jpg")
    import os

    assert os.path.exists(out)


def test_video_reader(tmp_path):
    import cv2

    from vision_kit_tpu.utils.readers import VideoReader

    path = str(tmp_path / "v.mp4")
    w = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    for i in range(5):
        w.write(np.full((24, 32, 3), i * 20, np.uint8))
    w.release()

    for threaded in (False, True):
        r = VideoReader(path, use_thread=threaded)
        n = sum(1 for ok, f in r if ok)
        assert n == 5, (threaded, n)
        assert len(r) == 5
        r.stop()


def test_s2d_stem_exact_equivalence():
    """The space-to-depth stem decomposition must produce the exact same
    output as the plain 6x6/s2 conv from the same (6,6,C,O) parameter."""
    from vision_kit_tpu.models.layers import ConvBnAct

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
    plain = ConvBnAct(16, kernel=6, stride=2, padding=2)
    s2d = ConvBnAct(16, kernel=6, stride=2, padding=2, s2d=True)
    v = plain.init(jax.random.PRNGKey(0), x, training=False)
    v2 = s2d.init(jax.random.PRNGKey(0), x, training=False)
    # identical param trees (same names/shapes) -> checkpoints interchange
    assert jax.tree_util.tree_structure(v) == jax.tree_util.tree_structure(v2)
    y1 = plain.apply(v, x, training=False)
    y2 = s2d.apply(v, x, training=False)
    assert y1.shape == y2.shape == (2, 32, 32, 16)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=2e-5)


def test_uint8_input_normalizes_in_stem():
    """Integer input to the model = unnormalized image: the stem's internal
    x1/255 (after the s2d transpose) must be bit-identical to caller-side
    normalize, for both stem kinds and for the full model."""
    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.models.layers import ConvBnAct

    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (2, 64, 64, 3), dtype=np.uint8)
    x_u8 = jnp.asarray(img)
    # multiply-by-reciprocal, matching the stem (x/255.0 differs by an ULP)
    x_f = x_u8.astype(jnp.float32) * (1.0 / 255.0)

    for kwargs in (dict(kernel=6, stride=2, padding=2, s2d=True),
                   dict(kernel=3, stride=2, padding=1)):
        m = ConvBnAct(16, **kwargs)
        v = m.init(jax.random.PRNGKey(0), x_f, training=False)
        y_f = m.apply(v, x_f, training=False)
        y_u = m.apply(v, x_u8, training=False)
        np.testing.assert_array_equal(np.asarray(y_f), np.asarray(y_u))

    model = YOLOV5(variant="n", num_classes=4)
    v = model.init(jax.random.PRNGKey(0), x_f, training=False)
    dec_f, _ = model.apply(v, x_f, training=False)
    dec_u, _ = model.apply(v, x_u8, training=False)
    np.testing.assert_array_equal(np.asarray(dec_f), np.asarray(dec_u))
