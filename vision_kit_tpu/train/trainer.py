"""Host-side training orchestration: the thin imperative loop around the
jitted train/eval steps.

Counterpart of the reference's Lightning stack (core/train/det_trainer.py +
scripts/main.py pl.Trainer config): epochs over an infinite sharded loader,
val every `val_interval` epochs with EMA weights, best/last checkpoints
monitored on mAP@.5, early stopping (patience 5), sample-grid images, rich
per-class tables, TensorBoard scalars. All device work happens inside the
two compiled step functions; this loop only feeds numpy batches and logs.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

import jax

from vision_kit_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_batch
from vision_kit_tpu.train.evaluator import DetEvaluator
from vision_kit_tpu.train.losses import YoloLoss
from vision_kit_tpu.train.optim import make_optimizer
from vision_kit_tpu.train.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_train_step,
)
from vision_kit_tpu.utils.logging_utils import logger
from vision_kit_tpu.utils.table import RichTable


def _wandb_netrc_login() -> bool:
    """True when `wandb login` stored credentials in ~/.netrc."""
    try:
        import netrc

        return netrc.netrc().authenticators("api.wandb.ai") is not None
    except Exception:
        return False


class Trainer:
    def __init__(self, cfg, evaluator: DetEvaluator | None = None,
                 mesh=None, use_tensorboard: bool = True,
                 seed: int | None = None):
        import jax.numpy as jnp

        from vision_kit_tpu.models import build_model

        self.cfg = cfg
        # one seed drives model init, the loader's index stream and every
        # per-sample augmentation rng (counterpart of the reference's
        # pl.seed_everything, scripts/main.py:113); CLI --seed lands here
        if seed is None:
            seed = getattr(cfg.data, "seed", None)  # cfg seed 0 is valid
        self.seed = int(seed) if seed is not None else 21
        # bf16 compute / fp32 params by default — the TPU counterpart of the
        # reference's AMP fp16 training (scripts/main.py:41 precision=16).
        # Set model.precision: fp32 in the config to disable.
        precision = str(getattr(cfg.model, "precision", "bf16"))
        dtype = jnp.bfloat16 if precision in ("bf16", "bfloat16", "16") \
            else jnp.float32
        self.model = build_model(cfg, dtype=dtype)
        self.img_size = tuple(cfg.model.input_size)
        self.max_epochs = int(cfg.data.max_epochs)
        self.val_interval = int(cfg.testing.val_interval)
        self.output_dir = cfg.data.output_dir
        os.makedirs(os.path.join(self.output_dir, "ckpts"), exist_ok=True)

        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = self.mesh.shape["data"]
        self.batch_size = int(cfg.data.batch_size)
        if self.batch_size % n_data:
            self.batch_size = max(self.batch_size // n_data, 1) * n_data

        # optional extra over the reference schema: data.device_aug moves
        # the mosaic/mixup/HSV/flip pixel work into the jitted train step
        # (data/device_aug.py) — the host only decodes and does label math.
        # Rotation/shear need the host pipeline; fall back with a warning.
        aug = dict(cfg.augmentations)
        self.device_aug = bool(getattr(cfg.data, "device_aug", False))
        if self.device_aug and (
            float(aug.get("degrees", 0) or 0) or float(aug.get("shear", 0) or 0)
        ):
            logger.warning(
                "data.device_aug disabled: degrees/shear require the host "
                "augmentation pipeline"
            )
            self.device_aug = False

        # data
        self.train_loader, self.val_loader = self._build_loaders()
        steps_per_epoch = self.train_loader.steps_per_epoch

        # model/optimizer/loss
        variables = self.model.init(
            jax.random.PRNGKey(self.seed),
            jnp.zeros((1, *self.img_size, 3)),
            training=False,
        )
        # sync init to host immediately: downstream jit lowerings must not
        # await an async device computation (stall point on flaky backends)
        variables = jax.device_get(variables)
        weight = getattr(cfg.model, "weight", None)
        if weight and os.path.exists(str(weight)):
            from vision_kit_tpu.predictor import load_weights

            try:
                # shape-checked partial load (reference load_ckpt,
                # model_utils.py:126-137): mismatched heads (e.g. different
                # num_classes) keep their fresh init
                variables = load_weights(str(weight), variables, partial=True)
                logger.info("loaded pretrained weights from %s", weight)
            except Exception as e:
                logger.warning("pretrained load failed (%s); training from scratch", e)

        cosine = cfg.model.name == "YOLOv7"
        self.tx = make_optimizer(
            variables["params"], dict(cfg.hypermeters), self.max_epochs,
            steps_per_epoch, cosine=cosine,
        )
        use_ota = (
            cfg.model.name == "YOLOv7"
            and int(dict(cfg.hypermeters).get("loss_ota", 0))
        )
        # explicit layout (the head's training maps follow decode_order);
        # auto-detection is ambiguous when a grid is exactly na cells wide
        layout = (
            "anchor_major"
            if getattr(self.model, "decode_order", "native") == "reference"
            else "native"
        )
        if use_ota:
            from vision_kit_tpu.train.ota import YoloLossOTA

            self.loss = YoloLossOTA(
                int(cfg.model.num_classes), self.model.grid_anchors,
                dict(cfg.hypermeters), layout=layout,
            )
        else:
            self.loss = YoloLoss(
                int(cfg.model.num_classes), self.model.grid_anchors,
                dict(cfg.hypermeters), layout=layout,
            )
        self.state = jax.device_put(
            create_train_state(variables, self.tx),
            replicated_sharding(self.mesh),
        )
        self.train_step = make_train_step(
            self.model, self.loss, self.tx, mesh=self.mesh,
            # optional extras over the reference schema: grad accumulation
            # (the cfg batch is SPLIT into accum_steps microbatches of
            # batch_size/accum_steps each — raise data.batch_size yourself to
            # grow the effective batch; activation memory stays one
            # microbatch's worth) and rematerialization
            accum_steps=int(getattr(cfg.data, "accum_steps", 1) or 1),
            remat=bool(getattr(cfg.data, "remat", False)),
            device_aug=self.device_aug,
        )
        # optional extra: multi-scale training (cfg data.multiscale:
        # true -> base +/- {64, 128}; or an explicit list of sizes). The
        # batch resizes ON DEVICE inside the step (host pipeline + H2D stay
        # at the base size); one cached compile per size, re-drawn every
        # MS_INTERVAL steps from a seeded stream (deterministic under
        # --seed, like everything else).
        self.ms_sizes = self._parse_multiscale(cfg)
        self._ms_steps: dict[int, object] = {}
        self.eval_step = make_eval_step(
            self.model, mesh=self.mesh,
            postprocess_kwargs=dict(
                conf_thres=float(cfg.testing.conf_thresh),
                iou_thres=float(cfg.testing.iou_thresh),
            ),
        )
        self.evaluator = evaluator or DetEvaluator(
            list(cfg.data.class_labels), self.img_size,
            gt_json=getattr(cfg.data, "gt_json", None),
        )
        self.steps_per_epoch = steps_per_epoch
        self.ckpt_interval = int(getattr(cfg.data, "ckpt_interval", 1) or 1)
        self.best_map50 = -1.0
        self.epochs_no_improve = 0
        # early-stop patience (reference EarlyStopping(patience=5),
        # training_helpers.py:91-95); optional cfg override testing.patience
        self.patience = int(getattr(cfg.testing, "patience", 5) or 5)
        # completed train steps reflected in self.state — the exact-position
        # resume cursor (persisted in checkpoint meta)
        self.global_step = 0
        # True while a validation's side effects (best ckpt, patience) are
        # in flight; persisted so a crash inside validate() re-runs it
        self._val_pending = False

        self.tb = None
        if use_tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self.tb = SummaryWriter(os.path.join(self.output_dir, "tb"))
            except Exception:
                self.tb = None
        # WandB (project "VisionKit", reference training_helpers.py:118-129),
        # gated on availability like the TB writer above
        # WandB only when credentials/mode are configured (an unconditional
        # wandb.init blocks on an interactive login prompt on fresh machines)
        self.wandb = None
        if (os.environ.get("WANDB_API_KEY") or os.environ.get("WANDB_MODE")
                or _wandb_netrc_login()):
            try:
                import wandb

                self.wandb = wandb.init(
                    project="VisionKit", dir=self.output_dir,
                    config=dict(cfg), reinit=True,
                )
            except Exception:
                self.wandb = None

    MS_INTERVAL = 10  # steps between size re-draws (ultralytics cadence)

    def _parse_multiscale(self, cfg):
        """cfg data.multiscale -> sorted size list or None (off)."""
        ms = getattr(cfg.data, "multiscale", False)
        if not ms:
            return None
        if self.img_size[0] != self.img_size[1]:
            raise ValueError("data.multiscale requires a square input_size")
        base = int(self.img_size[0])
        if isinstance(ms, (list, tuple)):
            sizes = sorted({int(s) for s in ms})
        else:
            sizes = sorted({max(64, base + d)
                            for d in (-128, -64, 0, 64, 128)})
        for s in sizes:
            if s % 32:
                # the stride-32 pyramid needs whole cells at every level
                raise ValueError(f"multiscale size {s} not a multiple of 32")
        if base not in sizes:
            sizes.append(base)
            sizes.sort()
        return sizes

    def _train_step_for(self, gstep: int):
        """The (possibly size-jittered) train step for global step `gstep`."""
        if not self.ms_sizes:
            return self.train_step
        rng = np.random.default_rng([self.seed, 4242, gstep // self.MS_INTERVAL])
        size = self.ms_sizes[int(rng.integers(len(self.ms_sizes)))]
        if size == int(self.img_size[0]):
            return self.train_step
        step = self._ms_steps.get(size)
        if step is None:
            step = self._ms_steps[size] = make_train_step(
                self.model, self.loss, self.tx, mesh=self.mesh,
                accum_steps=int(getattr(self.cfg.data, "accum_steps", 1) or 1),
                remat=bool(getattr(self.cfg.data, "remat", False)),
                device_aug=self.device_aug,
                scale_to=size,
            )
        return step

    def _log_scalar(self, name: str, value: float, step: int):
        if self.tb:
            self.tb.add_scalar(name, value, step)
        if self.wandb:
            self.wandb.log({name: value}, step=step)

    def _log_image(self, tag: str, img_rgb, step: int):
        """Push an HWC uint8 RGB image to TB/WandB (reference pushes the
        per-split sample grids to both loggers, det_trainer.py:110-143)."""
        if self.tb:
            try:
                self.tb.add_image(tag, img_rgb, step, dataformats="HWC")
            except Exception as e:
                logger.warning("tb image log failed: %s", e)
        if self.wandb:
            try:
                import wandb

                self.wandb.log({tag: wandb.Image(img_rgb)})
            except Exception as e:
                logger.warning("wandb image log failed: %s", e)

    # -- data -------------------------------------------------------------
    def _build_loaders(self):
        from vision_kit_tpu.data.datasets import COCODataset, YOLODataset
        from vision_kit_tpu.data.loader import TrainLoader, ValLoader

        cfg = self.cfg
        fmt = cfg.data.data_format
        # optional RAM/disk image cache (reference yolo.py:112-143 /
        # coco.py:77-125); cfg key `data.cache_images: ram|disk`
        cache_images = getattr(cfg.data, "cache_images", None) or None
        # cfg `data.fast_decode`: reduced-scale JPEG decode in the loaders
        # (exact geometry, distribution-level pixel change — datasets.py
        # _fast_decode_resized)
        fast_decode = bool(getattr(cfg.data, "fast_decode", False))
        if fmt == "yolo":
            train_ds = YOLODataset(
                os.path.join(cfg.data.data_dir, cfg.data.train_path),
                img_size=self.img_size,
                filter_classes=list(cfg.data.filter_classes or []),
                cache_images=cache_images,
                fast_decode=fast_decode,
            )
        elif fmt == "coco":
            train_ds = COCODataset(
                cfg.data.data_dir, json_file="instances_train2017.json",
                name=cfg.data.train_path, img_size=self.img_size,
                filter_classes=list(cfg.data.filter_classes or []),
                cache_images=cache_images,
                fast_decode=fast_decode,
            )
        else:
            raise ValueError(f"unknown data_format {fmt!r}")
        val_ds = self._eval_dataset(str(cfg.data.val_path))

        train_loader = TrainLoader(
            train_ds, self.batch_size, img_size=self.img_size,
            aug_cfg=dict(self.cfg.augmentations),
            seed=self.seed,
            shard=jax.process_index(), num_shards=jax.process_count(),
            num_workers=int(getattr(cfg.data, "num_workers", 0) or 0),
            device_aug=self.device_aug,
        )
        val_loader = ValLoader(val_ds, self.batch_size, img_size=self.img_size)
        return train_loader, val_loader

    def _eval_dataset(self, split_path: str):
        """Eval-split dataset for a `val_path`/`test_path` config value
        (reference get_dataset, datamodule.py:44-56)."""
        from vision_kit_tpu.data.datasets import COCODataset, YOLODataset

        cfg = self.cfg
        cache_images = getattr(cfg.data, "cache_images", None) or None
        fast_decode = bool(getattr(cfg.data, "fast_decode", False))
        if cfg.data.data_format == "yolo":
            return YOLODataset(
                os.path.join(cfg.data.data_dir, split_path),
                img_size=self.img_size,
                filter_classes=list(cfg.data.filter_classes or []),
                cache_images=cache_images,
                fast_decode=fast_decode,
            )
        # coco: prefer the conventional instances_<split>.json, keeping the
        # val2017 default name as a fallback for the standard COCO layout
        candidates = [f"instances_{split_path}.json", "instances_val2017.json"]
        for json_file in candidates:
            if os.path.exists(
                os.path.join(cfg.data.data_dir, "annotations", json_file)
            ):
                break
        return COCODataset(
            cfg.data.data_dir, json_file=json_file, name=split_path,
            img_size=self.img_size,
            filter_classes=list(cfg.data.filter_classes or []),
            cache_images=cache_images,
            fast_decode=fast_decode,
        )

    # -- checkpointing ----------------------------------------------------
    @property
    def _ckptr(self):
        # async checkpointer: the save streams in the background while
        # training continues (the TPU-idiomatic pattern; the reference's PL
        # ModelCheckpoint blocks the loop every epoch)
        import orbax.checkpoint as ocp

        if not hasattr(self, "_ckptr_inst"):
            self._ckptr_inst = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler()
            )
        return self._ckptr_inst

    def save_checkpoint(self, name: str, epoch: int, blocking: bool = False):
        path = os.path.abspath(os.path.join(self.output_dir, "ckpts", name))
        # one outstanding save at a time (a second save to the same name
        # must not race the first)
        self._ckptr.wait_until_finished()
        self._ckptr.save(path, args=self._save_args(self.state), force=True)
        if blocking:
            self._ckptr.wait_until_finished()
        with open(path + ".meta.json", "w") as f:
            json.dump({"epoch": epoch, "step": self.global_step,
                       "best_map50": self.best_map50,
                       "epochs_no_improve": self.epochs_no_improve,
                       "val_pending": self._val_pending}, f)

    @staticmethod
    def _save_args(state):
        import orbax.checkpoint as ocp

        return ocp.args.StandardSave(jax.device_get(state))

    def load_checkpoint(self, path: str):
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(path), jax.device_get(self.state)
        )
        self.state = jax.device_put(
            TrainState(*restored) if not isinstance(restored, TrainState)
            else restored,
            replicated_sharding(self.mesh),
        )
        meta_path = path + ".meta.json"
        step = 0
        if os.path.exists(meta_path):
            with open(meta_path) as f:
                meta = json.load(f)
            self.best_map50 = float(meta.get("best_map50", -1.0))
            # early-stopping patience survives resume (an uninterrupted run
            # would still be counting)
            self.epochs_no_improve = int(meta.get("epochs_no_improve", 0))
            step = meta.get("step")
            if step is None:  # pre-step-meta checkpoint: epoch granularity
                step = (int(meta.get("epoch", -1)) + 1) * self.steps_per_epoch
            step = int(step)
            self._val_pending = bool(meta.get("val_pending", False))
        self.global_step = step
        return step

    # -- loops ------------------------------------------------------------
    def fit(self, resume: str | None = None):
        """Training loop. On any exception the current state is saved as the
        `last` checkpoint and the best weights re-exported before re-raising
        (reference ModelCkpt.on_exception, training_helpers.py:40-55).

        The crash-save records `global_step` — the number of train steps
        reflected in the saved state — so `fit(resume=...)` continues the
        data stream, LR schedule, optimizer/EMA state at the EXACT step,
        even mid-epoch. A crash inside validate() additionally marks the
        validation pending; resume re-runs it (same weights, deterministic
        eval) before training continues, so best-checkpoint/patience side
        effects are reproduced too."""
        try:
            self._fit(resume)
        except BaseException:
            try:
                # epoch field is informational (last COMPLETED epoch); the
                # resume cursor is meta["step"]
                self.save_checkpoint(
                    "last", self.global_step // self.steps_per_epoch - 1,
                    blocking=True,
                )
                if self.best_map50 > 0:
                    self._export_best_weights(self.best_map50)
                logger.warning("exception: saved last checkpoint before exit")
            except Exception as e:
                logger.warning("crash-save failed: %s", e)
            raise

    def _fit(self, resume: str | None = None):
        from vision_kit_tpu.train.optim import lr_schedules

        start_step = 0
        if resume:
            start_step = self.load_checkpoint(resume)
            logger.info(
                "resumed from %s at step %d (epoch %d)", resume, start_step,
                start_step // self.steps_per_epoch,
            )
            # Continue the exact data stream an uninterrupted run would see:
            # batches are deterministic per batch id and the checkpointed
            # state has consumed exactly `start_step` of them. close() makes
            # the loader idle so seek is valid even on a re-fit Trainer —
            # silently training from the wrong stream position would defeat
            # the exact-position contract.
            self.train_loader.close()
            self.train_loader.seek(start_step)
        self.global_step = start_step
        start_epoch = start_step // self.steps_per_epoch

        lr_weight, _, _ = lr_schedules(
            dict(self.cfg.hypermeters), self.max_epochs, self.steps_per_epoch,
            cosine=self.cfg.model.name == "YOLOv7",
        )
        it = iter(self.train_loader)

        # a crash inside validate() left its side effects (best ckpt,
        # patience counter) unapplied — replay the interrupted epoch tail
        if (resume and self._val_pending and start_step
                and start_step % self.steps_per_epoch == 0):
            logger.info("resume: re-running the interrupted validation")
            self._cur_epoch = start_epoch - 1
            if self._epoch_tail(start_epoch - 1):
                self._finish_fit()
                return

        for epoch in range(start_epoch, self.max_epochs):
            self._cur_epoch = epoch
            t0 = time.time()
            first = max(start_step - epoch * self.steps_per_epoch, 0)
            losses = None
            for step in range(first, self.steps_per_epoch):
                batch = next(it)
                if step == first:
                    # batch-0 sample grid EVERY epoch (reference
                    # det_trainer.py:47-49)
                    self._save_grid(batch, "train", step=epoch)
                sharded = shard_batch(self.mesh, batch)
                step_fn = self._train_step_for(
                    epoch * self.steps_per_epoch + step
                )
                self.state, losses = step_fn(self.state, sharded)
                self.global_step += 1
            # one sync per epoch
            losses = jax.device_get(losses)
            dt = time.time() - t0
            n_steps = self.steps_per_epoch - first
            logger.info(
                "epoch %d/%d loss %.4f (box %.4f obj %.4f cls %.4f) "
                "%.1fs %.1f img/s",
                epoch + 1, self.max_epochs, float(losses["loss"]),
                float(losses["loss_box"]), float(losses["loss_obj"]),
                float(losses["loss_cls"]), dt,
                n_steps * self.batch_size / dt,
            )
            self._log_scalar("loss", float(losses["loss"]), epoch)
            # loss components each epoch (box/obj/cls)
            self._log_scalar("loss/box", float(losses["loss_box"]), epoch)
            self._log_scalar("loss/obj", float(losses["loss_obj"]), epoch)
            self._log_scalar("loss/cls", float(losses["loss_cls"]), epoch)
            # LR monitor (reference LearningRateMonitor per epoch,
            # training_helpers.py:111-113)
            self._log_scalar(
                "lr", float(lr_weight((epoch + 1) * self.steps_per_epoch)),
                epoch,
            )
            if self._epoch_tail(epoch):
                break
        self._finish_fit()

    def _epoch_tail(self, epoch: int) -> bool:
        """Per-epoch validation + checkpointing; True => early-stop."""
        if (epoch + 1) % self.val_interval == 0:
            self._val_pending = True
            self._run_validation(epoch)
        if ((epoch + 1) % self.ckpt_interval == 0
                or epoch + 1 == self.max_epochs):
            self.save_checkpoint("last", epoch)
        if self.epochs_no_improve >= self.patience:
            logger.info(
                "early stopping: no mAP@.5 improvement in %d validations",
                self.patience,
            )
            return True
        return False

    def _run_validation(self, epoch: int):
        result = self.validate()
        map50 = result["map50"]
        logger.info(
            "epoch %d mAP@.5 %.4f mAP@.5:.95 %.4f",
            epoch + 1, map50, result["map50_95"],
        )
        if result["per_class"]:
            logger.info("\n%s", self._per_class_table(result))
        self._log_scalar("mAP@.5", map50, epoch)
        self._log_scalar("mAP@.5:.95", result["map50_95"], epoch)
        improved = map50 > self.best_map50
        if improved:
            self.best_map50 = map50
            self.epochs_no_improve = 0
        else:
            self.epochs_no_improve += 1
        # counters are final for this epoch: checkpoints written from here
        # on resume without re-running this validation
        self._val_pending = False
        if improved:
            self.save_checkpoint("best", epoch)
            self._export_best_weights(map50)

    def _finish_fit(self):
        self._ckptr.wait_until_finished()
        self.train_loader.close()

    def validate(self, loader=None, collect_coco: bool = False,
                 split: str = "val"):
        """Run evaluation over `loader` (default: the val split).

        collect_coco: also accumulate the COCO-protocol metric set (float64
        copies of every batch) — only `test()` reads it, so the per-epoch
        val loop skips that cost.
        """
        from vision_kit_tpu.parallel.mesh import batch_sharding

        self.evaluator.reset(collect_coco=collect_coco)
        for bi, batch in enumerate(
            loader if loader is not None else self.val_loader
        ):
            if bi == 0:
                self._save_grid(batch, split,
                                step=getattr(self, "_cur_epoch", 0))
            images = jax.device_put(
                batch["image"], batch_sharding(self.mesh)
            )
            dets, valid = self.eval_step(self.state, images)
            self.evaluator.update(
                dets, valid, batch["targets"], batch["info"], batch["count"]
            )
        return self.evaluator.summarize()

    def _test_loader(self):
        """Loader for `trainer.test()`: the `data.test_path` split when
        configured (reference datamodule.py:99-110), else the val split."""
        from vision_kit_tpu.data.loader import ValLoader

        test_path = getattr(self.cfg.data, "test_path", None)
        if not test_path or str(test_path) == str(self.cfg.data.val_path):
            logger.info("test(): no separate data.test_path — evaluating "
                        "the val split (%s)", self.cfg.data.val_path)
            return self.val_loader
        if not os.path.isdir(os.path.join(self.cfg.data.data_dir,
                                          str(test_path))):
            logger.warning(
                "test(): data.test_path %s does not exist — evaluating the "
                "val split (%s) instead", test_path, self.cfg.data.val_path,
            )
            return self.val_loader
        logger.info("test(): evaluating the test split (%s)", test_path)
        ds = self._eval_dataset(str(test_path))
        return ValLoader(ds, self.batch_size, img_size=self.img_size)

    @staticmethod
    def _per_class_table(result) -> str:
        table = RichTable("Details Per Class")
        table.add_headers(
            ["Class", "Images", "Num_Targets", "Precision", "Recall",
             "mAP@.5", "mAP@.5:.95"]
        )
        table.add_content([
            [r["class"], r["images"], r["targets"],
             round(r["precision"], 3), round(r["recall"], 3),
             round(r["ap50"], 3), round(r["ap"], 3)]
            for r in result["per_class"]
        ])
        return table.table

    def test(self):
        result = self.validate(self._test_loader(), collect_coco=True,
                               split="test")
        logger.info("\n%s", self._per_class_table(result))
        logger.info(
            "mAP@.5 %.4f  mAP@.5:.95 %.4f", result["map50"],
            result["map50_95"],
        )
        # COCO-protocol tables (counterpart of the reference's torchmetrics
        # mAP/mAR tables, det_trainer.py:150-177)
        coco = self.evaluator.summarize_coco()
        map_table = RichTable("Average Precision (AP)")
        map_table.add_headers(
            ["mAP", "mAP(.50)", "mAP(.75)", "mAP(small)", "mAP(medium)",
             "mAP(large)"]
        )
        map_table.add_content([[
            round(coco["map"], 3), round(coco["map_50"], 3),
            round(coco["map_75"], 3), round(coco["map_small"], 3),
            round(coco["map_medium"], 3), round(coco["map_large"], 3),
        ]])
        mar_table = RichTable("Average Recall (AR)")
        mar_table.add_headers(
            ["mAR", "mAR(max=10)", "mAR(max=100)", "mAR(small)",
             "mAR(medium)", "mAR(large)"]
        )
        mar_table.add_content([[
            round(coco["mar_1"], 3), round(coco["mar_10"], 3),
            round(coco["mar_100"], 3), round(coco["mar_small"], 3),
            round(coco["mar_medium"], 3), round(coco["mar_large"], 3),
        ]])
        logger.info("\n%s", map_table.table)
        logger.info("\n%s", mar_table.table)
        result["coco"] = coco
        if self.evaluator.gt_json:
            info = self.evaluator.coco_evaluate()
            if info:
                logger.info("\n%s", info)
        return result

    def _export_best_weights(self, map50: float):
        """Standalone EMA-weights artifact on new best (counterpart of the
        reference's ModelCkpt.save_best fp16 export,
        training_helpers.py:46-55)."""
        try:
            from flax import serialization

            tree = jax.device_get(self.state.ema.tree)
            path = os.path.join(
                self.output_dir, "weights",
                f"best-map50_{map50:.4f}.msgpack",
            )
            os.makedirs(os.path.dirname(path), exist_ok=True)
            with open(path, "wb") as f:
                f.write(serialization.to_bytes(tree))
        except Exception as e:
            logger.warning("best-weights export failed: %s", e)

    def profile(self, steps: int = 5):
        """Capture a jax.profiler trace of the train step (counterpart of the
        reference's PL profilers, training_helpers.py:58-78). View with
        tensorboard --logdir <output_dir>/profile."""
        trace_dir = os.path.join(self.output_dir, "profile")
        it = iter(self.train_loader)
        batch = shard_batch(self.mesh, next(it))
        self.state, _ = self.train_step(self.state, batch)  # compile first
        with jax.profiler.trace(trace_dir):
            for _ in range(steps):
                self.state, metrics = self.train_step(self.state, batch)
            jax.block_until_ready(metrics)
        logger.info("profile trace written to %s", trace_dir)

    def _save_grid(self, batch, split, step: int = 0):
        """First-batch sample grid (GT boxes drawn): saved to
        <output_dir>/<split>.jpg AND pushed to TB/WandB as
        samples/<split> (reference det_trainer.py:48-49,62-63,77-78)."""
        try:
            from vision_kit_tpu.utils.drawing import grid_save

            targets = batch["targets"]
            if "image" in batch:
                images = batch["image"]
            else:  # device-aug batch: materialize the warp once for the grid
                from vision_kit_tpu.data.device_aug import warp_augment

                # only the grid's worth of images — the un-jitted warp on the
                # full batch would stage multi-GB f32 intermediates (and one
                # tunneled dispatch per op) to render 16 thumbnails
                n = min(16, len(targets))
                images = np.asarray(
                    jax.jit(warp_augment)(
                        batch["tiles"][:n], batch["tile_hw"][:n],
                        batch["params"][:n],
                    )
                )
                targets = targets[:n]
            grid = grid_save(
                images, targets,
                os.path.join(self.output_dir, f"{split}.jpg"),
            )
            self._log_image(f"samples/{split}", grid, step)
        except Exception as e:
            logger.warning("sample grid save failed: %s", e)
