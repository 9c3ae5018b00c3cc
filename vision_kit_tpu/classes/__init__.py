from vision_kit_tpu.classes.coco import COCO

__all__ = ["COCO"]
