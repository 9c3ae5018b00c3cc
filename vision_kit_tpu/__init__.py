"""vision-kit-tpu: a TPU-native object detection framework.

Re-implements the capabilities of Vision-Kit (ArkarPhyo1310/Vision-Kit) from
scratch on JAX/XLA/Pallas: YOLOv5 (n/s/m/l/x) and YOLOv7 (base/x) anchor-based
detectors, a fused device-side inference path (letterbox -> forward -> decode
-> NMS in one XLA program), a fixed-shape training stack (assigner/loss/EMA)
under pjit over a device mesh, and train/eval/export/demo entry points with
YAML configs compatible with the reference.
"""

from vision_kit_tpu._malloc import tune_for_batch_buffers as _tune_malloc

_tune_malloc()  # see _malloc.py: batch-sized allocs must reuse the arena

__version__ = "0.1.0"
