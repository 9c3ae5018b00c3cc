"""Round-5 regression tests."""

import argparse
import os
import sys

TOOLS = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
REPO = os.path.dirname(TOOLS)


def _args(**over):
    base = dict(root="/tmp/x", images=8, val_images=4, epochs=1, batch=4,
                img=640, workers=0, no_device_aug=False, no_cache=False,
                v7=False, ota=False, out="/tmp/o.json")
    base.update(over)
    return argparse.Namespace(**base)


def test_train_at_scale_cfg_flag_gating():
    """--v7 must CLEAR loss_ota (configs/yolov7.yaml defaults it to 1, so
    without the explicit clear the --ota flag is a no-op and the payload's
    model label misreports the loss used), --ota must set it, and the two
    regimes must write DISTINCT output dirs (round-5 review findings)."""
    sys.path.insert(0, TOOLS)
    from train_at_scale import build_cfg

    cfg_v5, out_v5 = build_cfg(_args(), REPO)
    assert out_v5.endswith("/out")
    assert cfg_v5["model"]["name"] == "YOLOv5"

    cfg_v7, out_v7 = build_cfg(_args(v7=True), REPO)
    assert cfg_v7["model"]["name"] == "YOLOv7"
    assert cfg_v7["hypermeters"]["loss_ota"] == 0  # yaml default is 1
    assert out_v7.endswith("/out_v7")

    cfg_ota, out_ota = build_cfg(_args(v7=True, ota=True), REPO)
    assert cfg_ota["hypermeters"]["loss_ota"] == 1
    assert out_ota.endswith("/out_v7ota")
    assert out_ota != out_v7 != out_v5

    # device_aug regime forces the warp-compatible aug params
    assert cfg_v5["data"]["device_aug"] is True
    assert cfg_v5["augmentations"]["degrees"] == 0.0
    assert cfg_v5["augmentations"]["shear"] == 0.0
    cfg_host, _ = build_cfg(_args(no_device_aug=True, no_cache=True), REPO)
    assert "device_aug" not in cfg_host["data"]
    assert "cache_images" not in cfg_host["data"]
