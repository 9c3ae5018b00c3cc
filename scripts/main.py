"""Entry point: train / eval / export (counterpart of reference
scripts/main.py — same CLI surface: task, --config, --ckpt-dir, --seed).

Export (vision_kit_tpu/export.py) writes TPU-native artifacts (flax msgpack
weights, StableHLO text, and a runnable jax.export serialized program —
the TorchScript-trace counterpart) plus the interchange artifacts — TF
SavedModel and, via the structural weight converter + the original torch
package, the reference's checked ONNX (opset 13, dynamic axes). Every
runnable artifact is numerically compared against the jit forward before
export succeeds.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vision_kit_tpu.utils.config import load_config
from vision_kit_tpu.utils.general import mk_output_dir, update_loss_cfg
from vision_kit_tpu.utils.jax_platform import (
    honor_platform_env,
    setup_compilation_cache,
)
from vision_kit_tpu.utils.logging_utils import logger, setup_logger


def main(cfg, opt):
    honor_platform_env()  # explicit JAX_PLATFORMS=cpu must win (see module)
    setup_compilation_cache()  # repeat runs skip the multi-minute compile

    from vision_kit_tpu.parallel.distributed import init_distributed

    init_distributed()  # no-op on single host

    import jax

    from vision_kit_tpu.train.evaluator import DetEvaluator
    from vision_kit_tpu.train.trainer import Trainer

    cfg = update_loss_cfg(cfg)
    evaluator = DetEvaluator(
        class_labels=list(cfg.data.class_labels),
        img_size=tuple(cfg.model.input_size),
        # optional: COCO gt annotations json enables the pycocotools-style
        # evaluation path (reference det_evaluator.py:105,246-271 — which the
        # reference CLI never actually wires up; we expose it via config)
        gt_json=getattr(cfg.data, "gt_json", None),
    )

    ckpt_path = None
    if opt.ckpt_dir:
        name = "last" if opt.task == "train" else "best"
        ckpt_path = os.path.join(opt.ckpt_dir, name)

    if opt.task == "train":
        trainer = Trainer(cfg, evaluator=evaluator, seed=opt.seed)
        logger.info("Start Training...")
        trainer.fit(resume=ckpt_path)
        trainer.test()
    elif opt.task == "eval":
        trainer = Trainer(cfg, evaluator=evaluator, seed=opt.seed)
        if ckpt_path and os.path.exists(ckpt_path):
            trainer.load_checkpoint(ckpt_path)
        trainer.test()
    elif opt.task == "export":
        import jax.numpy as jnp

        from vision_kit_tpu.export import run_export
        from vision_kit_tpu.models import build_model

        model = build_model(cfg, export=True)
        size = tuple(cfg.model.input_size)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, *size, 3)), training=False
        )
        if ckpt_path and os.path.exists(ckpt_path):
            from vision_kit_tpu.predictor import load_weights

            variables = load_weights(ckpt_path, variables)
        weight = getattr(cfg.model, "weight", None)
        if weight and os.path.exists(str(weight)):
            from vision_kit_tpu.predictor import load_weights

            variables = load_weights(str(weight), variables)

        save_dir = os.path.join(cfg.data.output_dir, "weights")
        onnx = True if getattr(opt, "onnx", False) else "auto"
        ts = True if getattr(opt, "torchscript", False) else "auto"
        result = run_export(cfg, variables, save_dir, onnx=onnx,
                            torchscript=ts)
        for kind, path in result.artifacts.items():
            delta = result.checks.get(
                kind, result.checks.get(f"{kind}_torch_forward"))
            suffix = f" (checked, max |delta| {delta:.2e})" if delta is not None else ""
            logger.info("exported %s -> %s%s", kind, path, suffix)
        for kind, reason in result.skipped.items():
            logger.info("export %s skipped: %s", kind, reason)
    else:
        raise ValueError(opt.task)


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="vision-kit-tpu train/eval/export")
    parser.add_argument("task", type=str, choices=["train", "eval", "export"])
    parser.add_argument("--config", "-c", type=str,
                        default="./configs/yolov5.yaml")
    parser.add_argument("--ckpt-dir", "-d", type=str, default=None)
    # default None so a config's data.seed is honored; 21 is the final
    # fallback (the reference's pl.seed_everything(21), scripts/main.py:113)
    parser.add_argument("--seed", "-s", type=int, default=None)
    parser.add_argument("--onnx", action="store_true",
                        help="export task: require the checked ONNX "
                             "artifact (fails if the torch package is "
                             "unavailable; default: export when available)")
    parser.add_argument("--torchscript", action="store_true",
                        help="export task: require the checked TorchScript "
                             "trace (reference base_trainer.py:49-79; "
                             "default: export when available)")
    opt = parser.parse_args()

    import numpy as np

    cfg = load_config(opt.config)
    if opt.seed is None:
        cfg_seed = getattr(cfg.data, "seed", None)
        opt.seed = int(cfg_seed) if cfg_seed is not None else 21
    np.random.seed(opt.seed)

    output_dir = mk_output_dir(cfg.data.output_dir, cfg.model.name, opt.task)
    setup_logger(output_dir)
    cfg.data.output_dir = output_dir
    logger.info("Global seed set to %d", opt.seed)
    main(cfg, opt)
