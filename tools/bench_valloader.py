"""Val-loader throughput: native C++ batch decode vs the Python cv2 path.

Builds a synthetic uncached JPEG dataset (val-realistic sizes), then times
ValLoader iteration (decode + letterbox + collate) both ways.

    python tools/bench_valloader.py [--n 256] [--size 640] [--hw 720 1280]

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
            # per-pixel noise: pathological for JPEG — the Huffman stream
            # dominates decode cost, which reduced-scale decode can't skip
            img = rng.integers(0, 255, (*hw, 3), dtype=np.uint8)
        else:
            # photo-like low-frequency content (noise upsampled 8x): decode
            # cost is IDCT/upsampling-dominated like real camera images
            small = rng.integers(0, 255, (hw[0] // 8, hw[1] // 8, 3),
                                 dtype=np.uint8)
            img = cv2.resize(small, (hw[1], hw[0]),
                             interpolation=cv2.INTER_CUBIC)
        cv2.imwrite(os.path.join(root, "images", f"{i}.jpg"), img)
        with open(os.path.join(root, "labels", f"{i}.txt"), "w") as f:
            f.write("0 0.5 0.5 0.4 0.3")


def run(ds, batch, size, prefetch):
    """Median per-batch rate: the host stalls intermittently (multi-second
    page-fault storms, see DESIGN.md "Host allocation behavior"), so
    wall-clock totals over a handful of batches are noise-dominated —
    the median batch gap is the robust stat."""
    from vision_kit_tpu.data.loader import ValLoader

    loader = ValLoader(ds, batch, img_size=(size, size), prefetch=prefetch)
    for b in loader:  # warm pass: heap growth, native pool spin-up
        pass
    gaps = []
    t_last = time.perf_counter()
    for b in loader:
        now = time.perf_counter()
        gaps.append(now - t_last)
        t_last = now
    return batch / float(np.median(gaps))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=256)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--size", type=int, default=640)
    ap.add_argument("--hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--texture", choices=("natural", "noise"),
                    default="natural")
    args = ap.parse_args()

    from vision_kit_tpu.data.datasets import YOLODataset

    with tempfile.TemporaryDirectory() as root:
        build_dataset(root, args.n, tuple(args.hw), texture=args.texture)
        ds = YOLODataset(root, img_size=(args.size, args.size))

        os.environ["VK_NO_NATIVE"] = "1"
        py = run(ds, args.batch, args.size, prefetch=0)
        print(f"python cv2 path:      {py:8.1f} img/s")
        del os.environ["VK_NO_NATIVE"]
        nat = run(ds, args.batch, args.size, prefetch=0)
        print(f"native batch decode:  {nat:8.1f} img/s  ({nat / py:.2f}x)")
        nat_pf = run(ds, args.batch, args.size, prefetch=2)
        print(f"native + prefetch:    {nat_pf:8.1f} img/s  ({nat_pf / py:.2f}x)"
              " (prefetch overlaps device work, not visible host-only)")

        ds_fast = YOLODataset(root, img_size=(args.size, args.size),
                              fast_decode=True)
        fast = run(ds_fast, args.batch, args.size, prefetch=0)
        print(f"native fast_decode:   {fast:8.1f} img/s  ({fast / py:.2f}x)"
              " (reduced-scale JPEG decode, data.fast_decode)")


if __name__ == "__main__":
    main()
