"""Weight converter CLI: torch `.pt`/`.ckpt` <-> flax `.msgpack`.

Counterpart of reference scripts/convert.py. Two import modes:

  * default: a vision_kit-format checkpoint (`.pt`/`.ckpt`), translated via
    the structural key map in vision_kit_tpu.convert (OIHW->HWIO transpose,
    BN split, anchor-buffer drop) with full shape checking.
  * `--from-upstream`: a LOCAL upstream ultralytics/WongKinYiu `.pt` — the
    reference's model-zoo source. The reference pulls these via torch.hub
    and zip-maps state_dict keys by declaration order (convert.py:22-23,
    50-51); this replicates the positional zip-map (anchors/anchor_grid
    buffers dropped) against an offline reconstruction of the vision_kit
    key order, then runs the same shape-checked structural translation.

`--to-torch` runs the other direction: a `.msgpack` weights file becomes a
reference-loadable `{"model": state_dict}` `.pt` (fp16 like the reference's
save, convert.py:27; `--fp32` keeps full precision), giving a path back to
the torch/ONNX export ecosystem (docs/MIGRATION.md "Export").
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser("vision-kit-tpu weight converter")
    parser.add_argument("weights", type=str, help=".pt/.ckpt file to convert")
    parser.add_argument("--model", "-m", type=str, default="yolov5",
                        choices=["yolov5", "yolov7"])
    parser.add_argument("--variant", "-v", type=str, default="s")
    parser.add_argument("--num-classes", "-n", type=int, default=80)
    parser.add_argument("--output", "-o", type=str, default=None)
    parser.add_argument("--from-upstream", action="store_true",
                        help="input is an upstream ultralytics/WongKinYiu "
                             ".pt: positional zip-map (reference "
                             "convert.py:22-23,50-51) before translation")
    parser.add_argument("--reparameterize", action="store_true",
                        help="fold v7 implicit layers into head convs")
    parser.add_argument("--to-torch", action="store_true",
                        help="reverse direction: .msgpack -> torch .pt")
    parser.add_argument("--fp32", action="store_true",
                        help="with --to-torch, keep fp32 (default fp16)")
    args = parser.parse_args()

    from vision_kit_tpu.utils.jax_platform import honor_platform_env

    honor_platform_env()  # explicit JAX_PLATFORMS=cpu must win (see module)

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vision_kit_tpu.convert import (
        flax_to_torch,
        load_torch_checkpoint,
        load_upstream_checkpoint,
        reparameterize_v7,
        torch_to_flax,
        upstream_to_vision_kit,
    )
    from vision_kit_tpu.models import YOLOV5, YOLOV7

    if args.model == "yolov5":
        model = YOLOV5(variant=args.variant, num_classes=args.num_classes)
    else:
        model = YOLOV7(variant=args.variant, num_classes=args.num_classes,
                       deploy=False)
    template = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)), training=False
    )

    if args.to_torch:
        import torch

        with open(args.weights, "rb") as f:
            variables = serialization.from_bytes(template, f.read())
        sd = flax_to_torch(variables, half=not args.fp32)
        out = args.output or os.path.splitext(args.weights)[0] + ".pt"
        torch.save({"model": {k: torch.from_numpy(np.ascontiguousarray(v))
                              for k, v in sd.items()}}, out)
        print(f"converted {args.weights} -> {out}")
        return

    if args.from_upstream:
        sd = upstream_to_vision_kit(load_upstream_checkpoint(args.weights),
                                    template)
    else:
        sd = load_torch_checkpoint(args.weights)
    variables = torch_to_flax(sd, template=template)
    if args.reparameterize and args.model == "yolov7":
        variables = reparameterize_v7(variables, args.num_classes)

    out = args.output or os.path.splitext(args.weights)[0] + ".msgpack"
    with open(out, "wb") as f:
        f.write(serialization.to_bytes(variables))
    print(f"converted {args.weights} -> {out}")


if __name__ == "__main__":
    main()
