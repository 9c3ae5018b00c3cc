"""Weight conversion: reference `.pt` / torch state_dicts -> Flax variables.

Counterpart of the reference's scripts/convert.py, but instead of fragile
positional state_dict zipping (convert.py:22-23) it translates keys
structurally: this package's module names mirror the reference's torch paths
(nn.Sequential index i -> `_i` suffix), so every torch key maps to a unique
Flax path, with OIHW -> HWIO kernel transposes and BN parameter splitting,
shape-checked against the model's init template.

Also implements the deploy-time parameter foldings as pure pytree math:
  * conv+BN fusion (reference model_utils.py:84-123)
  * YOLOv7 implicit-knowledge reparameterization (architectures/yolov7.py:82-103)
  * RepConv branch fusion (blocks.py:310-363, with its identity-branch bugs
    fixed)
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Key translation
# ---------------------------------------------------------------------------

def _translate_key(key: str) -> list[str] | None:
    """torch dotted key -> flax path (list of names), or None to skip."""
    parts = key.split(".")
    if parts[-1] == "num_batches_tracked":
        return None
    out: list[str] = []
    for p in parts:
        if p.isdigit() and out:
            out[-1] = f"{out[-1]}_{p}"
        else:
            out.append(p)
    return out


def _leaf_entries(path: list[str], tensor: np.ndarray):
    """Yield (collection, flax_path, value) for one torch tensor."""
    name = path[-1]
    parent = path[:-1]
    arr = np.asarray(tensor, dtype=np.float32)
    if name == "weight":
        if arr.ndim == 4:  # conv OIHW -> HWIO
            yield "params", parent + ["kernel"], arr.transpose(2, 3, 1, 0)
        elif arr.ndim == 1:  # BN gamma
            yield "params", parent + ["scale"], arr
        else:
            raise ValueError(f"Unexpected weight ndim {arr.ndim} at {path}")
    elif name == "bias":
        yield "params", parent + ["bias"], arr
    elif name == "running_mean":
        yield "batch_stats", parent + ["mean"], arr
    elif name == "running_var":
        yield "batch_stats", parent + ["var"], arr
    elif name == "implicit":  # (1, C, 1, 1) -> (1, 1, 1, C)
        yield "params", parent + ["implicit"], arr.transpose(0, 2, 3, 1)
    elif name in ("anchors", "anchor_grid", "stride"):
        return  # static in this package
    else:
        raise ValueError(f"Unhandled tensor {'.'.join(path)}")


def torch_to_flax(
    state_dict: Mapping[str, Any],
    template: Mapping[str, Any] | None = None,
    strict: bool = True,
) -> dict:
    """Convert a torch state_dict (tensors or ndarrays) to flax variables.

    Args:
      state_dict: torch-style flat dict. Values may be torch tensors (any
        dtype incl. fp16; upcast to fp32 per SURVEY.md BN-parity note) or
        numpy arrays.
      template: optional variables dict from `model.init(...)` used to
        shape-check and to detect missing/extra keys.
      strict: raise on shape mismatch / unknown keys when template given.
    """
    out: dict = {"params": {}, "batch_stats": {}}

    def insert(col, path, value):
        node = out[col]
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(value)

    for key, val in state_dict.items():
        if hasattr(val, "detach"):
            val = val.detach().to("cpu").float().numpy()
        path = _translate_key(key)
        if path is None:
            continue
        skip = False
        for col, fpath, arr in _leaf_entries(path, val):
            if template is not None:
                tnode = template.get(col, {})
                ok = True
                for p in fpath:
                    if not isinstance(tnode, Mapping) or p not in tnode:
                        ok = False
                        break
                    tnode = tnode[p]
                if not ok:
                    if strict:
                        raise KeyError(
                            f"{key} -> {col}/{'/'.join(fpath)} not in model"
                        )
                    skip = True
                    continue
                if tuple(tnode.shape) != tuple(arr.shape):
                    if strict:
                        raise ValueError(
                            f"shape mismatch at {key}: torch {arr.shape} vs "
                            f"model {tuple(tnode.shape)}"
                        )
                    # non-strict: shape-checked partial load (reference
                    # model_utils.py:126-137) — keep the template's leaf
                    skip = True
                    continue
            if not skip:
                insert(col, fpath, arr)

    if template is not None and strict:
        missing = _missing_paths(template, out)
        if missing:
            raise KeyError(f"model paths not covered by checkpoint: {missing[:10]}"
                           f" (+{max(0, len(missing)-10)} more)")
    return out


def _missing_paths(template, got, prefix=()):
    missing = []
    for col in ("params", "batch_stats"):
        if col not in template:
            continue
        missing += _walk_missing(template[col], got.get(col, {}), (col,))
    return missing


def _walk_missing(tnode, gnode, prefix):
    missing = []
    if hasattr(tnode, "shape"):
        if not hasattr(gnode, "shape"):
            missing.append("/".join(prefix))
        return missing
    for k, v in tnode.items():
        missing += _walk_missing(v, gnode.get(k, {}) if isinstance(gnode, Mapping) else {}, prefix + (k,))
    return missing


# ---------------------------------------------------------------------------
# Reverse conversion: Flax variables -> torch state_dict
# ---------------------------------------------------------------------------

_DIGIT_SUFFIX = re.compile(r"^(.*)_(\d+)$")


def _untranslate_name(name: str, siblings: set[str]) -> list[str]:
    """One flax module name -> torch dotted parts (inverse of _translate_key).

    _translate_key merges every pure-digit torch part into its predecessor
    (`stage1.0` -> `stage1_0`), but the reference ALSO has literal attribute
    names with digit suffixes (v7 backbone `stage2_1`, yolov7.py:60-72) that
    collide with that encoding. Disambiguation: a torch Sequential/ModuleList
    index always has an index-0 sibling, so `base_N` splits into `base.N`
    only when `base_0` is among the node's siblings (`stage1_1` splits
    because `stage1_0` exists; `stage2_1` stays literal because `stage2_0`
    doesn't). Applied repeatedly for nested containers. Round-trip identity
    vs the reference models' own state_dict keys is test-enforced
    (tests/test_convert.py).
    """
    m = _DIGIT_SUFFIX.match(name)
    if m and f"{m.group(1)}_0" in siblings:
        # Single-level split only: in these model trees a container's child
        # is always a *named* module, so torch keys never merge two digit
        # parts into one flax name (no `m_0_1`).
        return [m.group(1), m.group(2)]
    return [name]


def flax_to_torch(variables: Mapping[str, Any], half: bool = False) -> dict:
    """Convert Flax variables back to a torch-layout state_dict.

    Inverse of `torch_to_flax`: HWIO kernels -> OIHW `weight`, BN
    {scale,bias}+{mean,var} -> {weight,bias,running_mean,running_var} (+ a
    zero `num_batches_tracked`, which torch BN checkpoints carry), Implicit
    (1,1,1,C) -> (1,C,1,1). Values are numpy (fp16 when `half`, mirroring
    the reference's `.half()` save, scripts/convert.py:27); wrap with torch
    via `torch.save({"model": sd}, path)` for a reference-loadable artifact
    (its `load_ckpt`, utils/model_utils.py:126-137, consumes this layout).

    The static anchor/stride tables are not emitted — this package keeps
    them static (see _leaf_entries); the reference's shape-checked partial
    loader skips them.
    """
    dtype = np.float16 if half else np.float32
    sd: dict = {}
    bn_paths = set()

    def emit(torch_parts, leaf, value, stats):
        arr = np.asarray(value, dtype=dtype)
        if leaf == "kernel":
            if arr.ndim != 4:
                raise ValueError(
                    f"non-conv kernel at {'.'.join(torch_parts)}: ndim {arr.ndim}")
            sd[".".join(torch_parts + ["weight"])] = arr.transpose(3, 2, 0, 1)
        elif leaf == "scale":
            sd[".".join(torch_parts + ["weight"])] = arr
            bn_paths.add(tuple(torch_parts))
        elif leaf == "bias":
            sd[".".join(torch_parts + ["bias"])] = arr
        elif leaf == "implicit":
            sd[".".join(torch_parts + ["implicit"])] = arr.transpose(0, 3, 1, 2)
        elif leaf == "mean" and stats:
            sd[".".join(torch_parts + ["running_mean"])] = arr
            bn_paths.add(tuple(torch_parts))
        elif leaf == "var" and stats:
            sd[".".join(torch_parts + ["running_var"])] = arr
            bn_paths.add(tuple(torch_parts))
        else:
            raise ValueError(
                f"Unhandled flax leaf {'.'.join(torch_parts)}/{leaf}")

    def walk(node, torch_prefix, stats):
        siblings = set(node.keys())
        for name, child in node.items():
            if isinstance(child, Mapping):
                walk(child, torch_prefix + _untranslate_name(name, siblings),
                     stats)
            else:
                emit(torch_prefix, name, child, stats)

    walk(variables.get("params", {}), [], stats=False)
    walk(variables.get("batch_stats", {}), [], stats=True)

    for parts in bn_paths:
        sd[".".join(parts) + ".num_batches_tracked"] = np.zeros((), np.int64)
    return sd


# ---------------------------------------------------------------------------
# Upstream (ultralytics / WongKinYiu) checkpoint import
# ---------------------------------------------------------------------------

_CONV_M_CHILD = re.compile(r"^(conv|m_)(\d+)$")
_HEAD_CHILD = re.compile(r"^(m|ia|im)_(\d+)$")


def _declaration_order(names: list[str]) -> list[str]:
    """Child-module emission order for `vision_kit_key_order`.

    Flax params-dict insertion order is forward-CALL order; torch state_dict
    order is __init__ REGISTRATION order. They differ in exactly three
    reference blocks, where forward interleaves the declared modules:
      * C3Bottleneck declares conv1, conv2, conv3, m (bottlenecks.py:41-57)
        but forward uses m between conv1 and conv3;
      * SPPCSPC declares conv1..conv7 in numeric order (blocks.py:205-236)
        but forward consumes them out of order;
      * YoloV7Head declares the m conv list before ia/im (heads/yolov7.py:
        46-58) while forward applies ia -> m -> im.
    When a node's children all match one of those shapes, reorder to the
    declaration order; everything else keeps insertion order.
    """
    if names and all(_CONV_M_CHILD.match(n) for n in names):
        return sorted(
            names,
            key=lambda n: (0 if n.startswith("conv") else 1,
                           int(_CONV_M_CHILD.match(n).group(2))),
        )
    if names and all(_HEAD_CHILD.match(n) for n in names):
        rank = {"m": 0, "ia": 1, "im": 2}
        return sorted(
            names,
            key=lambda n: (rank[_HEAD_CHILD.match(n).group(1)],
                           int(_HEAD_CHILD.match(n).group(2))),
        )
    return names


def vision_kit_key_order(variables: Mapping[str, Any]) -> list[str]:
    """Reconstruct the reference torch model's state_dict key ORDER from the
    flax init template alone (no torch, no reference package).

    torch emits, per module in registration order: parameters (weight before
    bias), then buffers (running_mean, running_var, num_batches_tracked),
    then children recursively. Test-pinned byte-identical to
    `vision_kit.models.*.state_dict().keys()` for every zoo variant
    (tests/test_convert.py) — this is what makes the reference's positional
    upstream zip-map (scripts/convert.py:22-23,50-51) reproducible offline.
    """
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    keys: list[str] = []

    def emit(pnode, snode, prefix):
        if "kernel" in pnode:
            keys.append(".".join(prefix + ["weight"]))
        if "scale" in pnode:  # BN gamma
            keys.append(".".join(prefix + ["weight"]))
        if "bias" in pnode:
            keys.append(".".join(prefix + ["bias"]))
        if "implicit" in pnode:
            keys.append(".".join(prefix + ["implicit"]))
        if isinstance(snode, Mapping) and "mean" in snode:
            keys.append(".".join(prefix + ["running_mean"]))
            keys.append(".".join(prefix + ["running_var"]))
            keys.append(".".join(prefix + ["num_batches_tracked"]))

    def walk(pnode, snode, prefix):
        siblings = set(pnode.keys())
        if any(not isinstance(v, Mapping) for v in pnode.values()):
            emit(pnode, snode, prefix)
        children = [n for n in pnode if isinstance(pnode[n], Mapping)]
        for name in _declaration_order(children):
            sc = snode.get(name, {}) if isinstance(snode, Mapping) else {}
            walk(pnode[name], sc, prefix + _untranslate_name(name, siblings))

    walk(params, stats, [])
    return keys


def upstream_to_vision_kit(
    upstream_sd: Mapping[str, Any], template: Mapping[str, Any]
) -> dict:
    """Positional zip-map of an upstream (ultralytics YOLOv5 / WongKinYiu
    YOLOv7) state_dict onto vision_kit-format keys — the reference's
    model-zoo import (scripts/convert.py:9-54), for LOCAL files instead of
    torch.hub.

    The correspondence relies on module declaration order alone (both
    architectures are ports of the upstream ones, module for module): the
    upstream `anchors`/`anchor_grid` buffers are dropped (reference
    convert.py:20,44-48), then upstream values are zipped onto this
    package's reconstructed vision_kit key order. Tensor counts must match
    exactly — a mismatch (wrong variant, wrong family, extra buffers) is a
    hard error naming the leftovers, not a silent mis-map. Feed the result
    to `torch_to_flax(..., template=..., strict=True)`, which shape-checks
    every leaf.
    """
    dropped_suffixes = (".anchors", ".anchor_grid")
    up_items = [
        (k, v) for k, v in upstream_sd.items()
        if not k.endswith(dropped_suffixes)
    ]
    vk_keys = vision_kit_key_order(template)
    if len(up_items) != len(vk_keys):
        up_tail = [k for k, _ in up_items[len(vk_keys):]][:5]
        vk_tail = vk_keys[len(up_items):][:5]
        raise ValueError(
            f"upstream checkpoint has {len(up_items)} tensors but the model "
            f"expects {len(vk_keys)} — wrong variant/family? "
            f"(unmatched upstream: {up_tail or 'none'}, "
            f"unmatched model: {vk_tail or 'none'})"
        )
    return {new: val for new, (_, val) in zip(vk_keys, up_items)}


# ---------------------------------------------------------------------------
# Checkpoint loading
# ---------------------------------------------------------------------------

def load_upstream_checkpoint(path: str) -> dict:
    """Load a local upstream `.pt` (ultralytics YOLOv5 / WongKinYiu YOLOv7)
    into an ORDER-PRESERVING flat numpy state_dict for the positional
    zip-map (`upstream_to_vision_kit`).

    Accepts the shapes upstream releases come in: a raw state_dict, a
    checkpoint dict carrying one under "model"/"ema"/"state_dict", or a
    pickled nn.Module under those keys (the torch.hub shape the reference
    feeds, scripts/convert.py:17,39 — unpickling a Module needs the
    upstream package importable; a plain state_dict does not). Unlike
    `load_torch_checkpoint` this does NOT strip prefixes or merge EMA keys
    — any re-keying would scramble the declaration order the zip-map
    relies on.
    """
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict):
        for key in ("ema", "model", "state_dict"):
            inner = obj.get(key)
            if inner is not None and (isinstance(inner, dict)
                                      or hasattr(inner, "state_dict")):
                obj = inner
                break
    if hasattr(obj, "state_dict") and not isinstance(obj, dict):
        obj = obj.state_dict()
    if not isinstance(obj, dict):
        raise ValueError(f"{path}: no state_dict found in checkpoint")
    out = {}
    for k, v in obj.items():
        if hasattr(v, "detach"):
            out[k] = v.detach().float().cpu().numpy()
    if not out:
        raise ValueError(f"{path}: checkpoint contains no tensors")
    return out


def load_torch_checkpoint(path: str) -> dict:
    """Load a .pt/.ckpt file into a flat numpy state_dict (handles the
    reference's Lightning checkpoints: 'state_dict'/'model' keys, 'model.'
    and 'ema_model.' prefixes — model_utils.py:140-150)."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(ckpt, dict):
        for key in ("model", "state_dict", "ema"):
            if key in ckpt and isinstance(ckpt[key], dict):
                ckpt = ckpt[key]
                break
    sd, ema = {}, {}
    for k, v in ckpt.items():
        if not hasattr(v, "numpy"):
            continue
        arr = v.detach().float().cpu().numpy()
        if k.startswith("ema_model."):
            k = k[len("ema_model."):]
            if k.startswith("module."):
                k = k[len("module."):]
            ema[k] = arr
        elif k.startswith("model."):
            sd[k[len("model."):]] = arr
        else:
            sd[k] = arr
    # EMA weights take precedence: the reference restores EMA for eval
    # (base_trainer.py:34-47)
    sd.update(ema)
    return sd


# ---------------------------------------------------------------------------
# Deploy-time parameter folding (pure pytree math)
# ---------------------------------------------------------------------------

def fuse_conv_bn(kernel, bn_scale, bn_bias, bn_mean, bn_var, eps=1e-3,
                 conv_bias=None):
    """Fold BN into a conv: returns (kernel', bias').

    kernel is HWIO. Same algebra as reference model_utils.py:84-123.
    """
    std = jnp.sqrt(bn_var + eps)
    factor = bn_scale / std                     # (O,)
    fused_kernel = kernel * factor[None, None, None, :]
    bias = conv_bias if conv_bias is not None else 0.0
    fused_bias = (bias - bn_mean) * factor + bn_bias
    return fused_kernel, fused_bias


def fuse_repconv_params(variables: dict, eps: float = 1e-3) -> dict:
    """Fold every RepConv's three branches into a single 3x3 conv+bias.

    Pure-params version of the reference fuse_repvgg_block
    (blocks.py:310-363) with its identity-branch bugs fixed (:331-338 build
    the identity kernel incorrectly and contain the `functaionl` typo):

      fused = fuse(rbr_dense) + pad1(fuse(rbr_1x1)) + fuse(Id, rbr_identity)

    Produces `rbr_reparam: {kernel, bias}` entries and drops the branch
    params/stats; apply the model with deploy=True afterwards.
    """

    def walk(params, stats):
        out_p = {}
        for key, node in params.items():
            if not isinstance(node, Mapping):
                out_p[key] = node
                continue
            snode = stats.get(key, {}) if isinstance(stats, Mapping) else {}
            if "rbr_dense" in node:  # a RepConv
                dk, db = fuse_conv_bn(
                    node["rbr_dense"]["conv"]["kernel"],
                    node["rbr_dense"]["bn"]["scale"],
                    node["rbr_dense"]["bn"]["bias"],
                    snode["rbr_dense"]["bn"]["mean"],
                    snode["rbr_dense"]["bn"]["var"],
                    eps,
                )
                ok, ob = fuse_conv_bn(
                    node["rbr_1x1"]["conv"]["kernel"],
                    node["rbr_1x1"]["bn"]["scale"],
                    node["rbr_1x1"]["bn"]["bias"],
                    snode["rbr_1x1"]["bn"]["mean"],
                    snode["rbr_1x1"]["bn"]["var"],
                    eps,
                )
                ok3 = jnp.pad(ok, ((1, 1), (1, 1), (0, 0), (0, 0)))
                kernel = dk + ok3
                bias = db + ob
                if "rbr_identity" in node:
                    ins = dk.shape[2]
                    ident = jnp.zeros_like(ok)
                    ident = ident.at[
                        0, 0, jnp.arange(ins), jnp.arange(ins)
                    ].set(1.0)
                    ik, ib = fuse_conv_bn(
                        ident,
                        node["rbr_identity"]["scale"],
                        node["rbr_identity"]["bias"],
                        snode["rbr_identity"]["mean"],
                        snode["rbr_identity"]["var"],
                        eps,
                    )
                    kernel = kernel + jnp.pad(
                        ik, ((1, 1), (1, 1), (0, 0), (0, 0))
                    )
                    bias = bias + ib
                out_p[key] = {"rbr_reparam": {"kernel": kernel, "bias": bias}}
            else:
                out_p[key] = walk(node, snode)
        return out_p

    params = walk(variables["params"], variables.get("batch_stats", {}))

    # drop batch_stats subtrees belonging to fused RepConvs, keep the rest
    def prune_stats(stats, params):
        out = {}
        for key, node in stats.items():
            pnode = params.get(key) if isinstance(params, Mapping) else None
            if isinstance(pnode, Mapping) and "rbr_reparam" in pnode:
                continue
            if isinstance(node, Mapping):
                sub = prune_stats(node, pnode if isinstance(pnode, Mapping) else {})
                if sub:
                    out[key] = sub
            else:
                out[key] = node
        return out

    new_vars = dict(variables)
    new_vars["params"] = params
    new_vars["batch_stats"] = prune_stats(
        variables.get("batch_stats", {}), params
    )
    return new_vars


def reparameterize_v7(variables: dict, num_classes: int = 80, na: int = 3) -> dict:
    """Fold head Implicit layers into the 1x1 head convs (pure math version
    of reference architectures/yolov7.py:82-103).

    y = im * (W @ (x + ia) + b) = (im*W) @ x + im*(W @ ia + b)
    Returns new variables with ia_i/im_i removed and m_i updated; apply the
    model with deploy=True afterwards.
    """
    params = jax.tree_util.tree_map(lambda x: x, variables["params"])  # copy
    head = dict(params["head"])
    for i in range(3):
        ia = head.get(f"ia_{i}", {}).get("implicit")
        im = head.get(f"im_{i}", {}).get("implicit")
        if ia is None or im is None:
            continue
        m = dict(head[f"m_{i}"])
        kernel, bias = m["kernel"], m["bias"]      # (1,1,I,O), (O,)
        ia_c = ia.reshape(-1)                       # (I,)
        im_c = im.reshape(-1)                       # (O,)
        # bias += W @ ia  (sum over input channels)
        bias = bias + jnp.einsum("hwio,i->o", kernel, ia_c)
        # scale output channels by im
        kernel = kernel * im_c[None, None, None, :]
        bias = bias * im_c
        m["kernel"], m["bias"] = kernel, bias
        head[f"m_{i}"] = m
        head.pop(f"ia_{i}")
        head.pop(f"im_{i}")
    params["head"] = head
    new_vars = dict(variables)
    new_vars["params"] = params
    return new_vars
