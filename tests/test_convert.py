"""Converter tests: key translation, shape checking, checkpoint file
round-trip, missing-key detection."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vision_kit_tpu.convert import (
    _translate_key,
    _untranslate_name,
    flax_to_torch,
    load_torch_checkpoint,
    load_upstream_checkpoint,
    torch_to_flax,
    upstream_to_vision_kit,
    vision_kit_key_order,
)
from vision_kit_tpu.models import YOLOV5, YOLOV7


def test_translate_key():
    assert _translate_key("backbone.stage1.0.conv.weight") == [
        "backbone", "stage1_0", "conv", "weight"
    ]
    assert _translate_key("head.m.0.bias") == ["head", "m_0", "bias"]
    assert _translate_key("head.ia.0.implicit") == ["head", "ia_0", "implicit"]
    # v7 backbone attribute that already contains an underscore
    assert _translate_key("backbone.stage2_1.conv1.conv.weight") == [
        "backbone", "stage2_1", "conv1", "conv", "weight"
    ]
    assert _translate_key("backbone.stem.bn.num_batches_tracked") is None


def test_untranslate_name():
    # Sequential index: `stage1_0` splits because `stage1_0` (index 0) exists
    sibs = {"stage1_0", "stage1_1", "stem"}
    assert _untranslate_name("stage1_1", sibs) == ["stage1", "1"]
    assert _untranslate_name("stage1_0", sibs) == ["stage1", "0"]
    # v7 literal attribute (yolov7.py:60): no `stage2_0` sibling -> no split
    sibs = {"stage2", "stage2_1", "stage3"}
    assert _untranslate_name("stage2_1", sibs) == ["stage2_1"]
    # non-digit suffix untouched
    assert _untranslate_name("rbr_1x1", {"rbr_1x1", "rbr_dense"}) == ["rbr_1x1"]


@pytest.mark.parametrize("family,variant", [("v5", "n"), ("v7", "base")])
def test_reverse_roundtrip_bitexact(family, variant):
    """flax -> torch -> flax is the identity on a random-init model."""
    if family == "v5":
        model = YOLOV5(variant=variant, num_classes=7)
    else:
        model = YOLOV7(variant=variant, num_classes=7, deploy=False)
    variables = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 64, 64, 3)), training=False
    )
    sd = flax_to_torch(variables, half=False)
    back = torch_to_flax(sd, template=variables, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(variables),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("family", ["v5", "v7"])
def test_reverse_strict_loads_into_reference(reference, family):
    """The reverse-converted state_dict strict-loads into the reference torch
    model (key-for-key coverage incl. num_batches_tracked) and the two models
    then agree on a forward pass."""
    import torch
    from conftest import reset_reference_defaults

    if family == "v5":
        from vision_kit.models.architectures.yolov5 import YOLOV5 as Ref
        reset_reference_defaults()
        torch_model = Ref(variant="n", num_classes=7)
        reset_reference_defaults()
        jax_model = YOLOV5(variant="n", num_classes=7,
                           decode_order="reference")
    else:
        from vision_kit.models.architectures.yolov7 import YOLOV7 as Ref
        reset_reference_defaults()
        torch_model = Ref(variant="base", num_classes=7, deploy=False)
        reset_reference_defaults()
        jax_model = YOLOV7(variant="base", num_classes=7, deploy=False,
                           decode_order="reference")

    variables = jax_model.init(
        jax.random.PRNGKey(4), jnp.zeros((1, 64, 64, 3)), training=False
    )
    sd = flax_to_torch(variables, half=False)
    torch_model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )

    rng = np.random.default_rng(5)
    x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    torch_model.eval()
    with torch.no_grad():
        ref_out = torch_model(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_out = jax_model.apply(variables, jnp.asarray(x), training=False)
    np.testing.assert_allclose(
        np.asarray(got_out[0]), ref_out[0].numpy(), rtol=1e-3, atol=5e-3
    )


def test_full_model_roundtrip(reference):
    """Every torch key of the reference v5n maps into the flax template and
    nothing in the template is left uncovered (strict mode passes)."""
    from conftest import reset_reference_defaults
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    reset_reference_defaults()
    torch_model = RefV5(variant="n", num_classes=7)
    reset_reference_defaults()
    jax_model = YOLOV5(variant="n", num_classes=7)
    template = jax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False
    )
    variables = torch_to_flax(torch_model.state_dict(), template=template)
    # converted tree has the same leaves as the template
    t_leaves = jax.tree_util.tree_leaves(template["params"])
    c_leaves = jax.tree_util.tree_leaves(variables["params"])
    assert len(t_leaves) == len(c_leaves)


def test_shape_mismatch_detected(reference):
    from conftest import reset_reference_defaults
    from vision_kit.models.architectures.yolov5 import YOLOV5 as RefV5

    reset_reference_defaults()
    torch_model = RefV5(variant="n", num_classes=7)
    reset_reference_defaults()
    jax_model = YOLOV5(variant="n", num_classes=80)  # wrong class count
    template = jax_model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False
    )
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_to_flax(torch_model.state_dict(), template=template)


def test_load_torch_checkpoint_file(tmp_path):
    import torch

    sd = {
        "backbone.stem.conv.weight": torch.randn(8, 3, 6, 6).half(),
        "backbone.stem.bn.weight": torch.randn(8),
    }
    path = str(tmp_path / "w.pt")
    torch.save(sd, path)
    loaded = load_torch_checkpoint(path)
    assert set(loaded) == set(sd)
    assert loaded["backbone.stem.conv.weight"].dtype == np.float32  # upcast


def test_load_lightning_style_checkpoint(tmp_path):
    import torch

    sd = {
        "state_dict": {
            "model.backbone.stem.conv.weight": torch.randn(4, 3, 3, 3),
            "ema_model.module.backbone.stem.conv.weight": torch.randn(4, 3, 3, 3),
        }
    }
    path = str(tmp_path / "l.ckpt")
    torch.save(sd, path)
    loaded = load_torch_checkpoint(path)
    assert "backbone.stem.conv.weight" in loaded


def test_partial_load_shape_checked(tmp_path):
    """partial=True load: matching-shape leaves copied, mismatched (e.g.
    different num_classes head) keep their fresh init (reference load_ckpt,
    model_utils.py:126-137)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.predictor import load_weights

    src_model = YOLOV5(variant="n", num_classes=80)
    v80 = src_model.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                         training=False)
    path = str(tmp_path / "w80.msgpack")
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(v80)))

    dst_model = YOLOV5(variant="n", num_classes=7)
    v7 = dst_model.init(jax.random.PRNGKey(2), jnp.zeros((1, 64, 64, 3)),
                        training=False)
    merged = load_weights(path, v7, partial=True)
    # backbone conv copied from the 80-class checkpoint
    a = merged["params"]["backbone"]["stem"]["conv"]["kernel"]
    b = v80["params"]["backbone"]["stem"]["conv"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # head conv (nc-dependent shape) kept from the 7-class init
    h = merged["params"]["head"]["m_0"]["kernel"]
    h7 = v7["params"]["head"]["m_0"]["kernel"]
    np.testing.assert_array_equal(np.asarray(h), np.asarray(h7))


# ---------------------------------------------------------------------------
# Upstream (ultralytics / WongKinYiu) positional import
# ---------------------------------------------------------------------------

def _ref_and_template(family, variant):
    from conftest import reset_reference_defaults

    if family == "v5":
        from vision_kit.models.architectures.yolov5 import YOLOV5 as Ref

        reset_reference_defaults()
        ref = Ref(variant=variant)
        jm = YOLOV5(variant=variant)
    else:
        from vision_kit.models.architectures.yolov7 import YOLOV7 as Ref

        reset_reference_defaults()
        ref = Ref(variant=variant, deploy=False)
        reset_reference_defaults()
        jm = YOLOV7(variant=variant, deploy=False)
    template = jm.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                       training=False)
    return ref, jm, template


@pytest.mark.parametrize("family,variant", [
    ("v5", "n"), ("v5", "s"), ("v5", "m"), ("v5", "l"), ("v5", "x"),
    ("v7", "base"), ("v7", "x"),
])
def test_vision_kit_key_order_matches_reference(reference, family, variant):
    """The offline key-order reconstruction is byte-identical to the
    reference torch model's state_dict().keys() for every zoo variant —
    the invariant the positional upstream zip-map rests on (reference
    scripts/convert.py:22-23,50-51 relies on declaration order alone)."""
    ref, _, template = _ref_and_template(family, variant)
    assert vision_kit_key_order(template) == list(ref.state_dict().keys())


def test_upstream_import_positional_zipmap(reference, tmp_path):
    """Synthesized upstream-shaped checkpoint (reference v5n state_dict with
    opaque renamed keys, order preserved, anchors buffers inserted — the
    shape torch.hub's ultralytics model yields): --from-upstream machinery
    reproduces the structural conversion exactly, and the jax forward on the
    imported weights matches the reference torch forward."""
    import torch
    from conftest import reset_reference_defaults

    ref, _, template = _ref_and_template("v5", "n")
    ref_sd = ref.state_dict()

    # upstream-shaped: ultralytics-style names, SAME order, fp16 values
    # (upstream releases save half), plus the anchors buffer the reference
    # pops (convert.py:20) spliced in mid-stream
    up = {}
    for i, (k, v) in enumerate(ref_sd.items()):
        if i == len(ref_sd) - 6:  # before the head convs, like module 24
            up["model.model.24.anchors"] = torch.zeros(3, 3, 2)
            up["model.model.24.anchor_grid"] = torch.zeros(3, 1, 3, 1, 1, 2)
        up[f"model.model.{i}.u{i}"] = (
            v.half() if torch.is_floating_point(v) else v
        )
    path = str(tmp_path / "upstream.pt")
    torch.save({"model": up}, path)

    sd = upstream_to_vision_kit(load_upstream_checkpoint(path), template)
    got = torch_to_flax(sd, template=template, strict=True)

    # identical to converting the reference state_dict directly (modulo the
    # fp16 save, mirrored on the direct path)
    want = torch_to_flax({k: (v.half().float() if torch.is_floating_point(v)
                              else v).numpy() for k, v in ref_sd.items()},
                         template=template, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # and the imported weights drive a forward that matches the reference
    # torch model carrying the same (fp16-rounded) values
    reset_reference_defaults()
    jax_model = YOLOV5(variant="n", decode_order="reference")
    ref.load_state_dict({k: (v.half().float() if torch.is_floating_point(v)
                             else v) for k, v in ref_sd.items()}, strict=True)
    rng = np.random.default_rng(11)
    x = rng.uniform(0, 1, size=(1, 128, 128, 3)).astype(np.float32)
    ref.eval()
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    got_out = jax_model.apply(got, jnp.asarray(x), training=False)
    np.testing.assert_allclose(
        np.asarray(got_out[0]), ref_out[0].numpy(), rtol=1e-3, atol=5e-3
    )


def test_upstream_count_mismatch_raises(reference):
    """A wrong-variant upstream checkpoint fails loudly with the unmatched
    keys named, never silently mis-mapping positionally. (A depth mismatch
    — e.g. m vs n — trips the count check here; a same-depth width mismatch
    — s vs n — zips positionally and is caught by torch_to_flax's per-leaf
    shape check instead.)"""
    import torch

    ref_m, _, _ = _ref_and_template("v5", "m")
    _, _, template_n = _ref_and_template("v5", "n")
    up = {f"model.model.{i}.u{i}": v.numpy()
          for i, (k, v) in enumerate(ref_m.state_dict().items())}
    with pytest.raises(ValueError, match="wrong variant"):
        upstream_to_vision_kit(up, template_n)

    # same-depth width mismatch: zip succeeds, strict shape check catches it
    ref_s, _, _ = _ref_and_template("v5", "s")
    up_s = {f"model.model.{i}.u{i}": v.numpy()
            for i, (k, v) in enumerate(ref_s.state_dict().items())}
    sd = upstream_to_vision_kit(up_s, template_n)
    with pytest.raises(ValueError, match="shape mismatch"):
        torch_to_flax(sd, template=template_n, strict=True)


@pytest.mark.slow
def test_convert_cli_from_upstream(reference, tmp_path):
    """CLI e2e: `convert.py --from-upstream` on a local upstream-shaped .pt
    writes a msgpack equal to the direct structural conversion."""
    import subprocess
    import sys as _sys

    import torch
    from flax import serialization

    ref, jm, template = _ref_and_template("v5", "n")
    ref_sd = ref.state_dict()
    up = {f"model.model.{i}.u{i}": v for i, (k, v) in enumerate(ref_sd.items())}
    up["model.model.24.anchors"] = torch.zeros(3, 3, 2)
    path = str(tmp_path / "upstream.pt")
    torch.save(up, path)  # raw state_dict shape (no wrapper dict)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out = str(tmp_path / "w.msgpack")
    r = subprocess.run(
        [_sys.executable, os.path.join(repo, "scripts/convert.py"), path,
         "-m", "yolov5", "-v", "n", "--from-upstream", "-o", out],
        env=dict(os.environ, JAX_PLATFORMS="cpu"), capture_output=True,
        text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(out, "rb") as f:
        got = serialization.from_bytes(template, f.read())
    want = torch_to_flax(ref_sd, template=template, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(want),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
