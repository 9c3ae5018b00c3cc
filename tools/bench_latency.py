"""p50/p90 end-to-end single-image latency of the fused predictor on TPU.

Measures the BASELINE.md north-star "p50 e2e latency: letterbox + forward +
decode + NMS as one on-device program, zero host round-trips". Each sample
times upload -> fused program -> result download (the complete user-visible
path, exactly what scripts/demo.py runs per frame).

NOTE: on this test harness the TPU sits behind a network tunnel whose
round-trip (~20 ms) is included in every sample; on a locally attached chip
the same program's latency is the device compute (~1-2 ms at 640) plus PCIe
transfer.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    import jax
    from vision_kit_tpu.models import YOLOV5
    from vision_kit_tpu.predictor import Predictor

    model = YOLOV5(variant="s", num_classes=80, dtype=jnp.bfloat16)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 640, 640, 3)), training=False
    )
    pred = Predictor(model, variables)

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1080, 810, 3), dtype=np.uint8)  # bus.jpg dims
    pred.warmup(img.shape[:2])

    samples = []
    for _ in range(50):
        t0 = time.perf_counter()
        dets, _ = pred(img)
        samples.append((time.perf_counter() - t0) * 1000)
    samples.sort()
    print(json.dumps({
        "metric": "yolov5s_e2e_latency_ms",
        "p50": round(samples[len(samples) // 2], 2),
        "p90": round(samples[int(len(samples) * 0.9)], 2),
        "min": round(samples[0], 2),
        "n": len(samples),
    }))


if __name__ == "__main__":
    main()
