"""Torch-ecosystem interop: import the original Vision-Kit torch package
and export ONNX through it.

The ONNX interchange artifact (reference scripts/main.py:83-97: opset 13,
input "images", output "output", dynamic batch/height/width axes) is defined
by the *torch* model graph, so producing it requires the torch model
definition. This module locates the original Vision-Kit package (installed,
or via $VISION_KIT_TORCH_ROOT), loads OUR trained weights into it through
the structural converter (vision_kit_tpu.convert.flax_to_torch), and drives
`torch.onnx.export` — giving `main.py export --onnx` the same one-command,
checked `.onnx` the reference ships, from a jax checkpoint.

Everything here is optional interop: the framework itself never depends on
the torch package being present (export falls back to msgpack/StableHLO/
SavedModel artifacts).
"""

from __future__ import annotations

import importlib.util
import io
import os
import sys
import types

import numpy as np

from vision_kit_tpu.utils.logging_utils import logger

#: default search path for the original torch package in this environment
_DEFAULT_ROOTS = ("/root/reference",)


def install_torch_ecosystem_stubs() -> None:
    """Stub the original package's third-party imports that are absent here
    (omegaconf, torchvision, pycocotools) with just enough behavior for
    model construction + forward. The torchvision.ops.nms stub implements
    the exact greedy semantics so the reference's full postprocess path also
    works (parity tests share these stubs via tests/conftest.py)."""
    if "omegaconf" not in sys.modules and not importlib.util.find_spec("omegaconf"):
        omegaconf = types.ModuleType("omegaconf")
        dictconfig = types.ModuleType("omegaconf.dictconfig")

        class DictConfig(dict):
            pass

        dictconfig.DictConfig = DictConfig
        omegaconf.dictconfig = dictconfig
        omegaconf.DictConfig = DictConfig
        sys.modules["omegaconf"] = omegaconf
        sys.modules["omegaconf.dictconfig"] = dictconfig

    if "torchvision" not in sys.modules and not importlib.util.find_spec("torchvision"):
        torchvision = types.ModuleType("torchvision")
        tv_ops = types.ModuleType("torchvision.ops")

        def _torch_nms(boxes, scores, iou_threshold):
            """Exact torchvision.ops.nms semantics (greedy by score,
            suppress IoU > threshold, kept indices in score order)."""
            import torch

            order = torch.argsort(scores, descending=True, stable=True)
            suppressed = torch.zeros(len(scores), dtype=torch.bool)
            keep = []
            areas = (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])
            for i in order.tolist():
                if suppressed[i]:
                    continue
                keep.append(i)
                lt = torch.max(boxes[i, :2], boxes[:, :2])
                rb = torch.min(boxes[i, 2:], boxes[:, 2:])
                wh = (rb - lt).clamp(min=0)
                inter = wh[:, 0] * wh[:, 1]
                iou = inter / (areas[i] + areas - inter)
                suppressed |= iou > iou_threshold
            return torch.as_tensor(keep, dtype=torch.long)

        def _torch_box_iou(a, b):
            import torch

            lt = torch.max(a[:, None, :2], b[None, :, :2])
            rb = torch.min(a[:, None, 2:], b[None, :, 2:])
            wh = (rb - lt).clamp(min=0)
            inter = wh[..., 0] * wh[..., 1]
            area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
            area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
            return inter / (area_a[:, None] + area_b[None, :] - inter)

        tv_ops.nms = _torch_nms
        tv_boxes = types.ModuleType("torchvision.ops.boxes")
        tv_boxes.box_iou = _torch_box_iou
        tv_ops.box_iou = _torch_box_iou
        tv_ops.boxes = tv_boxes
        torchvision.ops = tv_ops
        sys.modules["torchvision"] = torchvision
        sys.modules["torchvision.ops"] = tv_ops
        sys.modules["torchvision.ops.boxes"] = tv_boxes

    if "pycocotools" not in sys.modules and not importlib.util.find_spec("pycocotools"):
        pycocotools = types.ModuleType("pycocotools")
        coco_mod = types.ModuleType("pycocotools.coco")

        class COCO:
            def __init__(self, *a, **k):
                raise RuntimeError("pycocotools stub")

        coco_mod.COCO = COCO
        pycocotools.coco = coco_mod
        sys.modules["pycocotools"] = pycocotools
        sys.modules["pycocotools.coco"] = coco_mod


def reset_reference_defaults() -> None:
    """Original-package bug workaround: PAFPN mutates its mutable-default
    in_chs list in place (pafpn.py:23-24), so constructing a second model in
    one process gets corrupted channel widths. Restore the default."""
    try:
        import vision_kit.models.necks.pafpn as ref_pafpn
    except Exception:
        return
    for d in ref_pafpn.PAFPN.__init__.__defaults__ or ():
        if isinstance(d, list) and len(d) == 3:
            d[:] = [256, 512, 1024]


def _purge_vision_kit_modules() -> None:
    """Drop the whole cached `vision_kit` tree from sys.modules. A failed
    import can leave partially-initialized SUBmodules behind (the package
    __init__ imported some children before raising); a later root's import
    would then resolve those names from the stale cache and bind a mixed
    tree. (`vision_kit_tpu` does not match the dotted prefix.)"""
    for k in [k for k in sys.modules
              if k == "vision_kit" or k.startswith("vision_kit.")]:
        sys.modules.pop(k, None)


def import_vision_kit_torch(root: str | None = None):
    """Import the original Vision-Kit torch package, or return None.

    Resolution order: already importable `vision_kit` (pip-installed) ->
    explicit `root` -> $VISION_KIT_TORCH_ROOT -> known local checkouts."""
    if importlib.util.find_spec("torch") is None:
        return None
    install_torch_ecosystem_stubs()
    try:
        import vision_kit  # noqa: F401  (already on sys.path / installed)

        return vision_kit
    except Exception:
        _purge_vision_kit_modules()
    roots = [r for r in (root, os.environ.get("VISION_KIT_TORCH_ROOT"))
             if r] + list(_DEFAULT_ROOTS)
    for r in roots:
        if not os.path.isdir(os.path.join(r, "vision_kit")):
            continue
        added = r not in sys.path
        if added:
            sys.path.insert(0, r)
        try:
            import vision_kit  # noqa: F401

            return vision_kit
        except Exception as e:
            # a stale/broken checkout must not shadow a later working root,
            # nor leave itself on sys.path or in the module cache
            logger.warning("vision_kit torch package at %s failed to "
                           "import: %s", r, e)
            if added and r in sys.path:
                sys.path.remove(r)
            _purge_vision_kit_modules()
    return None


def build_torch_model(cfg, variables, root: str | None = None):
    """Construct the original torch model for `cfg` and strict-load OUR
    weights into it via the structural converter. Returns an eval-mode
    nn.Module whose forward's first output is the decoded (B, A, 5+nc)
    prediction tensor, or None when the torch package is unavailable."""
    vk = import_vision_kit_torch(root)
    if vk is None:
        return None
    import torch

    from vision_kit_tpu.convert import flax_to_torch

    reset_reference_defaults()
    name = cfg.model.name
    if name == "YOLOv5":
        from vision_kit.models.architectures.yolov5 import YOLOV5 as TorchV5

        model = TorchV5(variant=cfg.model.version, act=cfg.model.act,
                        num_classes=cfg.model.num_classes)
    elif name == "YOLOv7":
        from vision_kit.models.architectures.yolov7 import YOLOV7 as TorchV7

        model = TorchV7(variant=cfg.model.version, act=cfg.model.act,
                        num_classes=cfg.model.num_classes,
                        deploy=bool(cfg.model.deploy))
        if cfg.model.deploy:
            # the original package's deploy flag reaches only the head
            # (yolov7.py:28-30 — PAFPNELAN takes no deploy), so its neck
            # RepConvs stay in training shape and cannot receive a
            # deploy-folded tree (convert.fuse_repconv_params). Swap them
            # for deploy-constructed RepConvs (blocks.py:288-294), the
            # fused form its own fuse_repvgg_block is supposed to reach.
            from vision_kit.models.modules.blocks import RepConv

            for attr in ("pan_conv0", "pan_conv1", "pan_conv2"):
                old = getattr(model.neck, attr, None)
                if old is not None and isinstance(old, RepConv):
                    outs, ins = old.rbr_dense.conv.weight.shape[:2]
                    setattr(model.neck, attr,
                            RepConv(ins, outs, act=cfg.model.act,
                                    deploy=True))
    else:
        raise NotImplementedError(name)
    reset_reference_defaults()
    sd = flax_to_torch(variables, half=False)
    model.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()},
        strict=True,
    )
    model.eval()
    return model


def _decoded_only(inner):
    """Export wrapper: the torch heads return (decoded, raws) at eval; the
    ONNX artifact exposes only the decoded tensor, named "output" with
    dynamic (batch, anchors) axes like the reference's export."""
    import torch.nn as nn

    class W(nn.Module):
        def __init__(self):
            super().__init__()
            self.inner = inner

        def forward(self, x):
            out = self.inner(x)
            return out[0] if isinstance(out, (tuple, list)) else out

    return W()


def export_onnx(torch_model, img_size, path: str, opset: int = 13) -> str:
    """torch.onnx.export with the reference's interchange contract
    (scripts/main.py:83-97): opset 13, input "images" (dynamic batch/h/w),
    output "output" (dynamic batch/anchors).

    Caveat, inherited from the reference's own export (it traces the same
    torch heads): the TorchScript trace bakes the decode GRIDS as constants
    at the export size, so of the declared dynamic axes only BATCH is
    actually safe to vary at inference; feeding a different H/W misaligns
    the baked grids. The numeric export check (export.py) covers the
    export-size input. Re-export per input size for other resolutions.

    Runs the TorchScript exporter. When the `onnx` python package is absent,
    its final `_add_onnxscript_fn` post-pass (which merely scans the
    finished proto for custom onnxscript functions — none exist in a pure
    conv/SiLU graph) cannot import; we bypass that single step and write the
    already-serialized proto. With `onnx` installed the standard path (and
    onnx.checker, in export.py) runs instead."""
    import torch

    wrapped = _decoded_only(torch_model)
    h, w = img_size
    x = torch.zeros(1, 3, h, w)
    kw = dict(
        opset_version=opset,
        input_names=["images"],
        output_names=["output"],
        dynamic_axes={
            "images": {0: "batch", 2: "height", 3: "width"},
            "output": {0: "batch", 1: "anchors"},
        },
        dynamo=False,
    )
    try:
        torch.onnx.export(wrapped, x, path, **kw)
    except Exception as e:
        if "onnx is not installed" not in str(e):
            raise
        from torch.onnx._internal.torchscript_exporter import (
            onnx_proto_utils as _opu,
        )

        orig = _opu._add_onnxscript_fn
        _opu._add_onnxscript_fn = lambda model_bytes, custom_opsets: model_bytes
        try:
            torch.onnx.export(wrapped, x, path, **kw)
        finally:
            _opu._add_onnxscript_fn = orig
    return path


def export_torchscript(torch_model, img_size, path: str) -> str:
    """torch.jit.trace of the converted torch model — the reference's traced
    artifact (core/train/base_trainer.py:49-79, emitted by its export task,
    scripts/main.py:98). Traces the decoded-only wrapper at the export size
    and saves the ScriptModule.

    Same baked-constant caveat as the ONNX trace (which runs through the
    same TorchScript tracer): the decode grids are constants at the export
    resolution, so batch is the only input axis safe to vary at inference;
    re-trace per resolution. The caller (export.py) replays the saved
    module from disk at batch 1 AND batch 2 against the jit forward before
    declaring the artifact good."""
    import torch

    wrapped = _decoded_only(torch_model)
    wrapped.eval()
    h, w = img_size
    x = torch.zeros(1, 3, h, w)
    with torch.no_grad():
        traced = torch.jit.trace(wrapped, x)
    torch.jit.save(traced, path)
    return path


def simplify_onnx(path: str) -> bool:
    """Reference's onnxsim pass (core/train/base_trainer.py:110-118): run
    onnx-simplifier over the exported proto when the package is importable.

    Returns False when onnxsim (or onnx) is unavailable — the caller
    degrades gracefully, like the TF leg. Raises when onnxsim ran but its
    own output check failed. The original proto is NEVER corrupted: the
    simplified model is written to a tmp path, structurally validated, and
    atomically swapped in only then."""
    try:
        import onnx
        import onnxsim
    except ImportError:
        return False
    model = onnx.load(path)
    simplified, ok = onnxsim.simplify(model)
    if not ok:
        raise RuntimeError("onnxsim simplified-model check failed")
    tmp = path + ".simplified.tmp"
    try:
        onnx.save(simplified, tmp)
        verify_onnx_file(tmp)
        os.replace(tmp, path)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)
    return True


def verify_onnx_file(path: str) -> None:
    """Structural validation of the exported proto. Full onnx.checker when
    the package exists; otherwise parse the ModelProto wire format far
    enough to confirm it is a well-formed ONNX model with our io names."""
    try:
        import onnx

        onnx.checker.check_model(onnx.load(path))
        return
    except ImportError:
        pass
    with open(path, "rb") as f:
        data = f.read()
    # ModelProto field 1 (ir_version) is varint-tagged 0x08 at offset 0
    if not data or data[0] != 0x08:
        raise ValueError(f"{path}: not an ONNX ModelProto")
    if b"images" not in data or b"output" not in data:
        raise ValueError(f"{path}: exported graph io names missing")
