"""Serve: batched HTTP inference daemon over the fused predictor.

Production-serving counterpart of the reference's demo loop (reference
scripts/demo.py drives one frame at a time from a camera; this serves
many clients against one fixed-shape compiled program with dynamic
batching — see vision_kit_tpu/serve.py).

    python scripts/serve.py -m yolov5 -v s -w yolov5s.pt --port 8000
    curl -s -X POST --data-binary @bus.jpg localhost:8000/predict | jq .
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from vision_kit_tpu.predictor import Predictor
    from vision_kit_tpu.serve import InferenceServer
    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()

    parser = argparse.ArgumentParser("vision-kit-tpu serve")
    parser.add_argument("--model", "-m", type=str, default="yolov5",
                        choices=["yolov5", "yolov7"])
    parser.add_argument("--variant", "-v", type=str, default="s")
    parser.add_argument("--weights", "-w", type=str, default=None)
    parser.add_argument("--config", "-c", type=str, default=None,
                        help="training config YAML: model/classes/img-size "
                             "read from it")
    parser.add_argument("--num-classes", type=int, default=None)
    parser.add_argument("--labels", type=str, default=None,
                        help="comma-separated class names")
    parser.add_argument("--conf", type=float, default=0.25)
    parser.add_argument("--iou", type=float, default=0.45)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--batch-size", type=int, default=8,
                        help="serving batch (one fixed compiled program; "
                             "partial batches are padded)")
    parser.add_argument("--max-wait-ms", type=float, default=5.0,
                        help="max dispatcher wait for batch coalescing "
                             "after the first request arrives")
    args = parser.parse_args()

    # scripts/demo.py: shared model loading + flag resolution (same flags)
    from demo import load_model, resolve_model_spec

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
    server = InferenceServer(
        predictor, class_labels=labels, batch_size=args.batch_size,
        max_wait_ms=args.max_wait_ms, host=args.host, port=args.port,
    )
    print(f"compiling serving program (batch={args.batch_size}, "
          f"img={img_size}) ...")
    server.start()
    print(f"serving {model_name}-{variant} on http://{args.host}:{server.port}"
          f"  (POST /predict, GET /healthz, GET /stats)")
    server.wait()  # blocks; KeyboardInterrupt shuts down cleanly


if __name__ == "__main__":
    main()
