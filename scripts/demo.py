"""Demo: image / video / webcam inference with the fused one-program
predictor (counterpart of reference scripts/demo.py -p -m -v -w CLI).

Per-frame timing prints the single fused number (the reference prints
pre/inf/post separately — here all three stages are one XLA program, which
is the point)."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import cv2
import numpy as np


def load_model(model_name: str, variant: str, weights: str | None,
               num_classes: int = 80, img_size: tuple[int, int] = (640, 640)):
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV5, YOLOV7
    from vision_kit_tpu.predictor import load_weights

    if model_name == "yolov5":
        model = YOLOV5(variant=variant, num_classes=num_classes)
    elif model_name == "yolov7":
        model = YOLOV7(variant=variant, num_classes=num_classes, deploy=True)
    else:
        raise ValueError(model_name)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, *img_size, 3)), training=False
    )
    if weights:
        variables = load_weights(weights, variables)
    return model, variables


def resolve_model_spec(args):
    """model/variant/num_classes/labels/img_size from -m/-v defaults,
    --config, and the --num-classes/--labels overrides (shared by the
    demo and serve CLIs, which take the same flags)."""
    from vision_kit_tpu.classes import COCO

    model_name, variant = args.model, args.variant
    num_classes, labels, img_size = 80, list(COCO), (640, 640)
    if args.config:
        from vision_kit_tpu.utils.config import load_config

        cfg = load_config(args.config)
        model_name = "yolov7" if "7" in str(cfg.model.name) else "yolov5"
        variant = str(cfg.model.version)
        num_classes = int(cfg.model.num_classes)
        labels = list(cfg.data.class_labels)
        img_size = tuple(cfg.model.input_size)
    if args.num_classes is not None:
        num_classes = args.num_classes
        if len(labels) != num_classes:
            labels = [str(i) for i in range(num_classes)]
    if args.labels is not None:
        labels = [s.strip() for s in args.labels.split(",") if s.strip()]
        if args.num_classes is None:
            num_classes = len(labels)
    return model_name, variant, num_classes, labels, img_size


def main():
    from vision_kit_tpu.predictor import Predictor
    from vision_kit_tpu.utils.drawing import Drawing
    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()  # explicit JAX_PLATFORMS=cpu must win (see module)
    setup_compilation_cache()  # repeat runs skip the multi-minute compile

    parser = argparse.ArgumentParser("vision-kit-tpu demo")
    parser.add_argument("--path", "-p", type=str, required=True,
                        help="image/video path or webcam index")
    parser.add_argument("--model", "-m", type=str, default="yolov5",
                        choices=["yolov5", "yolov7"])
    parser.add_argument("--variant", "-v", type=str, default="s")
    parser.add_argument("--weights", "-w", type=str, default=None)
    parser.add_argument("--config", "-c", type=str, default=None,
                        help="training config YAML: model name/variant/"
                             "num_classes/input_size/class_labels are read "
                             "from it (a trained custom-dataset checkpoint "
                             "demos with the config it was trained with)")
    parser.add_argument("--num-classes", type=int, default=None,
                        help="override the head's class count (default 80, "
                             "or the config's model.num_classes)")
    parser.add_argument("--labels", type=str, default=None,
                        help="comma-separated class names for drawing "
                             "(default COCO, or the config's "
                             "data.class_labels)")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--iou", type=float, default=0.45)
    parser.add_argument("--output", "-o", type=str, default=None)
    parser.add_argument("--show", action="store_true")
    args = parser.parse_args()

    model_name, variant, num_classes, labels, img_size = resolve_model_spec(
        args
    )

    model, variables = load_model(
        model_name, variant, args.weights, num_classes=num_classes,
        img_size=img_size,
    )
    predictor = Predictor(
        model, variables, img_size=img_size,
        conf_thres=args.conf, iou_thres=args.iou,
    )
    drawer = Drawing(labels)

    from vision_kit_tpu.utils.readers import IMAGE_EXT, ImageReader, VideoReader

    is_image = os.path.isdir(args.path) or args.path.lower().endswith(IMAGE_EXT)
    if is_image:
        # --output: an exact file path for a single image (back-compat with
        # `-p img.jpg -o result.jpg`), a directory otherwise
        single_file_out = (
            args.output
            if args.output and not os.path.isdir(args.path)
            and args.output.lower().endswith(IMAGE_EXT)
            else None
        )
        reader = ImageReader(
            args.path,
            save_path=(None if single_file_out else args.output)
            or (args.path if os.path.isdir(args.path)
                else os.path.dirname(args.path) or "."),
        )
        warm = False
        for (ok, bgr), path in zip(reader, reader.files):
            if not ok:
                print(f"cannot read {path}")
                continue
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            if not warm:
                predictor.warmup(rgb.shape[:2])
                warm = True
            dets, ms = predictor(rgb)
            print(f"{path}: {len(dets)} detections in {ms:.2f} ms (fused e2e)")
            out = drawer.draw(bgr, dets)
            if single_file_out:
                parent = os.path.dirname(single_file_out)
                if parent:
                    os.makedirs(parent, exist_ok=True)
                if not cv2.imwrite(single_file_out, out):
                    raise RuntimeError(f"failed to write {single_file_out}")
                out_path = single_file_out
            else:
                out_path = reader.save(out, path)
            print(f"saved {out_path}")
    else:
        reader = VideoReader(args.path, save_path=args.output)
        assert reader.cap.isOpened(), f"cannot open {args.path}"
        n, total_ms = 0, 0.0
        for ok, bgr in reader:
            if not ok:
                break
            rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
            dets, ms = predictor(rgb)
            n += 1
            total_ms += ms
            out = drawer.draw(bgr, dets)
            if args.output:
                reader.save(out)
            if args.show:
                cv2.imshow("vision-kit-tpu", out)
                if cv2.waitKey(1) & 0xFF == ord("q"):
                    break
            if n % 30 == 0:
                print(f"frame {n}: {ms:.1f} ms ({1000 * n / total_ms:.1f} fps avg)")
        reader.stop()
        if n:
            print(f"avg {total_ms / n:.2f} ms/frame over {n} frames")


if __name__ == "__main__":
    main()
