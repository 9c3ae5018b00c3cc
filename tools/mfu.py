"""MFU (model FLOPs utilization) for the headline throughput claims.

VERDICT r2 #7: every throughput number needs a utilization denominator.
This tool computes the ANALYTIC FLOPs of the exact programs the benches
run — XLA's own HLO cost analysis of (a) bench.py's inference step
(normalize + forward + candidate-select + NMS, v5s@640 bf16) and (b) the
b-batch train step (forward + loss + backward + SGD + EMA) — and divides
the measured img/s by them against the chip's peak:

    MFU = img_per_sec * flops_per_img / peak_flops_per_sec

FLOPs come from a CPU lowering (conv/dot FLOP counts in HLO cost analysis
are platform-independent; only the measured img/s comes from the TPU).
Peaks: TPU v5e bf16 spec peak 197e12; the chip's *measured* conv roofline
is ~134e12 (tools/archive/bench_int8_conv.py — large mid-network convs),
so both denominators are reported.

    python tools/mfu.py [--infer-ips 3984.6] [--train-ips 610] [--batch 8]

Defaults are the recorded round-2 measurements (BENCH_r02.json, DESIGN.md
"Measured" train table). Runs entirely on CPU in seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12     # spec sheet
V5E_CONV_ROOFLINE = 134e12  # measured on this chip (DESIGN.md int8 study)


def _deregister_axon():
    from vision_kit_tpu.utils.jax_platform import honor_platform_env

    honor_platform_env()  # the axon hook overrides JAX_PLATFORMS; undo


def _flops(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):  # older jax returns [dict]
        ca = ca[0]
    return float(ca["flops"])


def infer_flops_per_image(batch: int, family: str = "v5",
                          variant: str | None = None) -> float:
    """FLOPs/img of bench.py's streamed step (stream_bench.run_detector_bench
    protocol, minus the scan wrapper — flops scale linearly in batch).
    family="v7" uses the tools/bench_v7.py program (deploy-fused)."""
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5, YOLOV7
    from vision_kit_tpu.ops.nms import postprocess_raw

    if family == "v7":
        model = YOLOV7(variant=variant or "base", num_classes=80,
                       deploy=True, dtype=jnp.bfloat16)
    else:
        model = YOLOV5(variant=variant or "s", num_classes=80,
                       dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), training=False
    )

    def step(x_u8):
        _, raws = model.apply(variables, x_u8, training=False)
        dets, valid = postprocess_raw(
            raws, model.anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32)
        )

    compiled = jax.jit(step).lower(
        jax.ShapeDtypeStruct((batch, 640, 640, 3), jnp.uint8)
    ).compile()
    return _flops(compiled) / batch


def train_flops_per_image(batch: int, family: str = "v5",
                          variant: str | None = None,
                          ota: bool = False) -> float:
    """FLOPs/img of the bench_train.py-protocol train step (@640 bf16
    compute, YoloLoss or SimOTA, SGD + EMA). MFU numerators use the plain
    (no remat/accum) program — the standard model-FLOPs convention: remat
    recompute is overhead, not model work. variant=None resolves the
    family-appropriate default ("s" / "base") — "s" is not a v7 variant."""
    if variant is None:
        variant = "base" if family == "v7" else "s"
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5, YOLOV7
    from vision_kit_tpu.train.losses import YoloLoss
    from vision_kit_tpu.train.optim import make_optimizer
    from vision_kit_tpu.train.step import create_train_state, make_train_step

    hyp = {
        "lr0": 0.01, "lrf": 0.01, "momentum": 0.937, "weight_decay": 0.0005,
        "warmup_epochs": 3.0, "warmup_bias_lr": 0.1, "warmup_momentum": 0.8,
        "box": 0.05, "cls": 0.5, "obj": 1.0, "cls_pw": 1.0, "obj_pw": 1.0,
        "anchor_t": 4.0, "label_smoothing": 0.0,
    }
    if family == "v7":
        model = YOLOV7(variant=variant, num_classes=80, dtype=jnp.bfloat16)
    else:
        model = YOLOV5(variant=variant, num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), training=False
    )
    tx = make_optimizer(variables["params"], hyp, 300, 1000)
    if ota:
        from vision_kit_tpu.train.ota import YoloLossOTA

        loss = YoloLossOTA(80, model.grid_anchors, hyp, layout="native")
    else:
        loss = YoloLoss(80, model.grid_anchors, hyp)
    state = create_train_state(variables, tx)
    step = make_train_step(model, loss, tx, donate=False)

    batch_spec = {
        "image": jax.ShapeDtypeStruct((batch, 640, 640, 3), jnp.uint8),
        "targets": jax.ShapeDtypeStruct((batch, 32, 5), jnp.float32),
    }
    state_spec = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype),
        state,
    )
    compiled = jax.jit(step).lower(state_spec, batch_spec).compile()
    return _flops(compiled) / batch


def annotate_zoo(path: str, batch: int):
    """Per-variant MFU for a tools/bench_zoo.py JSON: FLOPs/img from the
    CPU lowering of the exact benched program, peak denominators as in the
    headline numbers."""
    with open(path) as f:
        payload = json.load(f)
    print("| variant | batch | img/s | GFLOPs/img | TFLOP/s | MFU spec | "
          "MFU conv-roofline |")
    print("|---" * 7 + "|")
    for rec in payload["zoo"]:
        if "img_per_sec" not in rec:
            continue
        fpi = infer_flops_per_image(batch, family=rec["family"],
                                    variant=rec["variant"])
        achieved = fpi * rec["img_per_sec"]
        rec["gflops_per_img"] = round(fpi / 1e9, 2)
        rec["mfu_vs_spec_peak"] = round(achieved / V5E_BF16_PEAK, 4)
        rec["mfu_vs_conv_roofline"] = round(
            achieved / V5E_CONV_ROOFLINE, 4)
        print(f"| {rec['family']}-{rec['variant']} | {rec.get('batch')} | "
              f"{rec['img_per_sec']:.0f} | {fpi / 1e9:.2f} | "
              f"{achieved / 1e12:.2f} | {achieved / V5E_BF16_PEAK:.1%} | "
              f"{achieved / V5E_CONV_ROOFLINE:.1%} |")
    with open(path, "w") as f:
        json.dump(payload, f, indent=1)
    print(f"\nannotated {path}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--infer-ips", type=float, default=3984.6,
                    help="measured inference img/s (BENCH_r02.json)")
    ap.add_argument("--train-ips", type=float, default=610.0,
                    help="measured b64 train img/s (DESIGN.md)")
    ap.add_argument("--batch", type=int, default=8,
                    help="batch for the analytic lowering (flops scale "
                         "linearly; small = fast CPU compile)")
    ap.add_argument("--v7-ips", type=float, default=None,
                    help="also compute v7-base inference MFU at this "
                         "measured img/s (tools/bench_v7.py)")
    ap.add_argument("--zoo", default=None, metavar="BENCH_ZOO_JSON",
                    help="annotate a tools/bench_zoo.py result file with "
                         "per-variant MFU (writes back + prints a table)")
    ap.add_argument("--train-family", default="v5", choices=("v5", "v7"))
    ap.add_argument("--train-variant", default=None,
                    help="variant for the train-MFU row (v5 n/s/m/l/x, "
                         "v7 base/x; default: s / base by family)")
    ap.add_argument("--train-ota", action="store_true",
                    help="train row uses the SimOTA loss program")
    args = ap.parse_args()

    _deregister_axon()

    if args.zoo:
        annotate_zoo(args.zoo, args.batch)
        return

    rows = []
    fi = infer_flops_per_image(args.batch)
    rows.append(("inference (bench.py b128 protocol)", fi, args.infer_ips))
    ft = train_flops_per_image(args.batch, family=args.train_family,
                               variant=args.train_variant, ota=args.train_ota)
    shown_variant = args.train_variant or (
        "base" if args.train_family == "v7" else "s")
    tname = (f"train step ({args.train_family}-{shown_variant}"
             f"{'+ota' if args.train_ota else ''})")
    rows.append((tname, ft, args.train_ips))
    if args.v7_ips:
        f7 = infer_flops_per_image(args.batch, family="v7")
        rows.append(("v7-base inference (bench_v7.py b64 protocol)", f7,
                     args.v7_ips))

    out = {}
    for name, fpi, ips in rows:
        achieved = fpi * ips
        out[name] = {
            "gflops_per_img": round(fpi / 1e9, 2),
            "img_per_sec": ips,
            "achieved_tflops": round(achieved / 1e12, 2),
            "mfu_vs_spec_peak": round(achieved / V5E_BF16_PEAK, 4),
            "mfu_vs_measured_conv_roofline": round(
                achieved / V5E_CONV_ROOFLINE, 4),
        }
        print(f"{name}: {fpi / 1e9:.2f} GFLOPs/img x {ips:.1f} img/s = "
              f"{achieved / 1e12:.2f} TFLOP/s  ->  "
              f"MFU {achieved / V5E_BF16_PEAK:.1%} of spec peak, "
              f"{achieved / V5E_CONV_ROOFLINE:.1%} of measured conv roofline")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
