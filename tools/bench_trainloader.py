"""Train-loader host throughput: the mosaic/augment batch path with the
native C++ batch decode vs the Python cv2 path, cached vs uncached.

Builds a synthetic uncached JPEG dataset (train-realistic sizes), then
times TrainLoader batch production (mosaic 4-tile decode + affine + HSV +
flip + collate) in the four decode regimes. Counterpart of
tools/bench_valloader.py for the training input path (reference hot loop:
mosiac_dataset.py:55-110 inside DataLoader workers).

    python tools/bench_trainloader.py [--n 256] [--batch 16] [--size 640]

Pure host benchmark — no TPU, safe to run anywhere (JAX_PLATFORMS=cpu).
"""

import argparse
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_dataset(root, n, hw, texture="natural"):
    os.makedirs(os.path.join(root, "images"))
    os.makedirs(os.path.join(root, "labels"))
    rng = np.random.default_rng(0)
    for i in range(n):
        if texture == "noise":
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        else:
            # photo-like low-frequency content: decode cost is IDCT-bound
            # like real camera JPEGs (noise JPEGs are Huffman-bound and
            # unrepresentative — see tools/bench_valloader.py)
            small = rng.integers(0, 255, (hw[0] // 8, hw[1] // 8, 3),
                                 dtype=np.uint8)
            img = cv2.resize(small, (hw[1], hw[0]),
                             interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, "images", f"{i}.jpg"), img)
        with open(os.path.join(root, "labels", f"{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.4 0.3\n1 0.3 0.3 0.2 0.2")


def run(root, batch, size, n_batches, cache, mosaic=True, device_aug=False,
        fast=False):
    from vision_kit_tpu.data.datasets import YOLODataset
    from vision_kit_tpu.data.loader import TrainLoader

    ds = YOLODataset(root, img_size=(size, size),
                     cache_images="ram" if cache else None,
                     fast_decode=fast)
    loader = TrainLoader(
        ds, batch, img_size=(size, size),
        aug_cfg={"enable_mosaic": mosaic, "enable_mixup": False},
        prefetch=0, device_aug=device_aug,
    )
    it = iter(loader)
    next(it)  # warm (label cache, native pool spin-up, heap growth)
    next(it)
    gaps = []
    t_last = time.perf_counter()
    for _ in range(n_batches):
        next(it)
        now = time.perf_counter()
        gaps.append(now - t_last)
        t_last = now
    loader.close()
    # median batch gap: robust to the host's intermittent page-fault
    # stalls (see DESIGN.md "Host allocation behavior")
    return batch / float(np.median(gaps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--texture", choices=("natural", "noise"),
                    default="natural")
    args = ap.parse_args()

    with tempfile.TemporaryDirectory() as root:
        build_dataset(root, args.n, tuple(args.hw), texture=args.texture)

        os.environ["VK_NO_NATIVE"] = "1"
        py = run(root, args.batch, args.size, args.batches, cache=False)
        print(f"python cv2 decode:    {py:8.1f} img/s")
        del os.environ["VK_NO_NATIVE"]
        nat = run(root, args.batch, args.size, args.batches, cache=False)
        print(f"native batch decode:  {nat:8.1f} img/s  ({nat / py:.2f}x)")
        fast = run(root, args.batch, args.size, args.batches, cache=False,
                   fast=True)
        print(f"native fast_decode:   {fast:8.1f} img/s  ({fast / py:.2f}x)"
              "  (reduced-scale JPEG decode, data.fast_decode)")
        ram = run(root, args.batch, args.size, args.batches, cache=True)
        print(f"ram image cache:      {ram:8.1f} img/s  ({ram / py:.2f}x)"
              "  (aug/mosaic cost only)")
        # device-aug batches: host = decode + RNG + label math only (the
        # pixel warp runs inside the train step, data/device_aug.py)
        da = run(root, args.batch, args.size, args.batches, cache=False,
                 device_aug=True)
        print(f"device-aug uncached:  {da:8.1f} img/s  ({da / py:.2f}x)")
        da_ram = run(root, args.batch, args.size, args.batches, cache=True,
                     device_aug=True)
        print(f"device-aug ram cache: {da_ram:8.1f} img/s  "
              f"({da_ram / py:.2f}x)")


if __name__ == "__main__":
    main()
