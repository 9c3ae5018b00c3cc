"""YOLOv7-base@640 streaming inference throughput (deploy-fused), same
measurement protocol as bench.py."""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH, CHUNK, ITERS = 64, 8, 2


def main():
    import jax
    import jax.numpy as jnp

    from vision_kit_tpu.models import YOLOV7
    from vision_kit_tpu.ops.nms import postprocess_raw

    size = 640
    model = YOLOV7(variant="base", num_classes=80, deploy=True,
                   dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, size, size, 3)), training=False
    )
    anchors_px = model.anchors_px

    from vision_kit_tpu.utils.stream_bench import measure_streaming

    def step(x_u8):
        x = x_u8.astype(jnp.bfloat16) * jnp.bfloat16(1.0 / 255.0)
        _, raws = model.apply(variables, x, training=False)
        dets, valid = postprocess_raw(
            raws, anchors_px, conf_thres=0.25, iou_thres=0.45,
            max_det=300, max_cand=512, approx_topk=True,
        )
        return jnp.sum(valid.astype(jnp.int32)) + jnp.sum(
            dets[:, 0, 0].astype(jnp.int32))

    rng = np.random.default_rng(0)
    images = jnp.asarray(
        rng.integers(0, 255, (BATCH, size, size, 3), dtype=np.uint8))
    ips = measure_streaming(step, images, CHUNK, ITERS)
    print(json.dumps({
        "metric": "yolov7base_640_images_per_sec",
        "value": round(ips, 2),
        "unit": "img/s",
    }))


if __name__ == "__main__":
    main()
