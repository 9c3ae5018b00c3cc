"""Produce the trained-v7 test fixture cache (.test_cache/).

Trains v7-base@64 on the deterministic 12-rectangle set (the exact recipe
tests/conftest.py's `trained_v7` fixture uses — shared via
tests/fixture_lib.py) and writes the EMA weights + meta where the pytest
fixtures load them. Run WITHOUT JAX_PLATFORMS override to use the TPU
(minutes); the same run takes hours on this single-core host, which is why
the fixture prefers consuming this cache.

    python tools/train_v7_fixture.py            # both ota and plain legs
    python tools/train_v7_fixture.py --ota-only
    JAX_PLATFORMS=cpu python tools/train_v7_fixture.py   # CPU fallback
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ota-only", action="store_true")
    ap.add_argument("--plain-only", action="store_true")
    ap.add_argument("--force", action="store_true",
                    help="retrain even if a valid cache exists")
    ap.add_argument("--max-epochs", type=int, default=None)
    args = ap.parse_args()

    import logging

    logging.basicConfig(level=logging.INFO, force=True)
    logging.getLogger("vision_kit_tpu").setLevel(logging.INFO)

    from vision_kit_tpu.utils.jax_platform import (
        honor_platform_env,
        setup_compilation_cache,
    )

    honor_platform_env()
    setup_compilation_cache()

    import fixture_lib as fl

    legs = [1, 0]
    if args.ota_only:
        legs = [1]
    if args.plain_only:
        legs = [0]
    for loss_ota in legs:
        if not args.force and fl.load_v7_cache(REPO, loss_ota) is not None:
            print(f"loss_ota={loss_ota}: valid cache exists, skipping "
                  "(--force to retrain)")
            continue
        work = tempfile.mkdtemp(prefix=f"v7fix_{loss_ota}_")
        t0 = time.monotonic()
        variables, result, steps = fl.train_v7(
            work, REPO, loss_ota, max_epochs=args.max_epochs)
        dt = time.monotonic() - t0
        import jax

        meta = {
            "map50": float(result["map50"]),
            "map50_95": float(result["map50_95"]),
            "steps": steps,
            "train_seconds": round(dt, 1),
            "platform": jax.devices()[0].platform,
            "loss_ota": int(loss_ota),
        }
        fl.save_v7_cache(REPO, loss_ota, variables, meta)
        print(f"loss_ota={loss_ota}: trained {steps} steps in {dt:.0f}s on "
              f"{meta['platform']}, map50={meta['map50']:.3f} -> cached")


if __name__ == "__main__":
    main()
