"""YOLOv7-base@640 streaming inference throughput (deploy-fused), same
measurement protocol as bench.py (vision_kit_tpu/utils/stream_bench.py)."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV7
    from vision_kit_tpu.utils.stream_bench import run_detector_bench

    model = YOLOV7(variant="base", num_classes=80, deploy=True,
                   dtype=jnp.bfloat16)
    print(json.dumps(run_detector_bench(
        model, "yolov7base_640_images_per_sec", batch=64, chunk=8, iters=2
    )))


if __name__ == "__main__":
    main()
