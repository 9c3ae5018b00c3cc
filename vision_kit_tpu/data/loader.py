"""Input pipeline: sharded infinite sampling, fixed-shape batching, prefetch.

TPU-native replacement for the reference's torch DataLoader stack
(data/datamodule.py + data/sampling.py): the rank-sharded seeded
`InfiniteSampler` (sampling.py:29-84) becomes an explicit generator over
(seed, epoch) randperm streams sharded by host process; batches are collated
to *fixed shapes* — images (B, S, S, 3) uint8, targets padded to
(B, MAX_LABELS, 5) rows [cls, cx, cy, w, h] normalized — so every training
step hits the same compiled program. A background thread prefetches batches
to overlap host augmentation with device compute.
"""

from __future__ import annotations

import queue
import threading
from functools import partial
from typing import Iterator

import numpy as np

from vision_kit_tpu import _malloc
from vision_kit_tpu.data.augment import TrainAugPipeline, ValAugPipeline
from vision_kit_tpu.data.mosaic import MosaicMixupDataset

MAX_LABELS = 160


class _IndexStream:
    """Random-access view of the infinite_indices stream: position p ->
    dataset index, computable from any worker without consuming a shared
    iterator (epoch permutations are recomputed and cached per epoch)."""

    def __init__(self, n, seed=0, shard=0, num_shards=1, shuffle=True):
        self.n, self.seed = n, seed
        self.shard, self.num_shards, self.shuffle = shard, num_shards, shuffle
        self.shard_len = len(range(shard, n, num_shards))
        if self.shard_len == 0:
            raise ValueError(
                f"shard {shard}/{num_shards} is empty: dataset has only {n} "
                "samples — fewer than the shard count"
            )
        self._epoch = -1
        self._slice = None

    def at(self, p: int) -> int:
        epoch, off = divmod(p, self.shard_len)
        if epoch != self._epoch:
            if self.shuffle:
                rng = np.random.default_rng([self.seed, epoch])
                perm = rng.permutation(self.n)
            else:
                perm = np.arange(self.n)
            self._slice = perm[self.shard::self.num_shards]
            self._epoch = epoch
        return int(self._slice[off])


def pad_targets(labels_list, img_hw, max_labels=MAX_LABELS):
    """abs-xyxy+cls label arrays -> (B, M, 5) [cls, cxn, cyn, wn, hn],
    padded with cls = -1."""
    b = len(labels_list)
    h, w = img_hw
    out = np.full((b, max_labels, 5), -1, np.float32)
    for i, lab in enumerate(labels_list):
        n = min(len(lab), max_labels)
        if n == 0:
            continue
        lab = lab[:n]
        out[i, :n, 0] = lab[:, 4]
        out[i, :n, 1] = (lab[:, 0] + lab[:, 2]) / 2 / w
        out[i, :n, 2] = (lab[:, 1] + lab[:, 3]) / 2 / h
        out[i, :n, 3] = (lab[:, 2] - lab[:, 0]) / w
        out[i, :n, 4] = (lab[:, 3] - lab[:, 1]) / h
    return out



def infinite_indices(
    n: int, seed: int = 0, shard: int = 0, num_shards: int = 1, shuffle=True
) -> Iterator[int]:
    """Seeded infinite index stream, strided over shards (the reference
    InfiniteSampler semantics: rank-strided slices of per-epoch randperms,
    sampling.py:61-81)."""
    stream = _IndexStream(n, seed=seed, shard=shard, num_shards=num_shards,
                          shuffle=shuffle)
    p = 0
    while True:
        yield stream.at(p)
        p += 1


class TrainLoader:
    """Infinite training batches with mosaic/mixup + augmentation.

    Yields {"image": (B, S, S, 3) uint8 (normalized on device) NHWC,
            "targets": (B, M, 5)}.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        img_size=(640, 640),
        aug_cfg: dict | None = None,
        seed: int = 21,
        shard: int = 0,
        num_shards: int = 1,
        max_labels: int = MAX_LABELS,
        prefetch: int = 3,
        no_aug: bool = False,
        num_workers: int = 0,
        device_aug: bool = False,
    ):
        aug = dict(aug_cfg or {})
        self.img_size = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        self.batch_size = batch_size
        self.max_labels = max_labels
        self.seed = seed
        self.no_aug = no_aug
        self.mosaic_ds = MosaicMixupDataset(
            dataset,
            img_size=self.img_size,
            enable_mosaic=bool(aug.get("enable_mosaic", True)) and not no_aug,
            enable_mixup=bool(aug.get("enable_mixup", False)) and not no_aug,
            mosaic_prob=float(aug.get("mosaic_prob", 1.0)),
            mixup_prob=float(aug.get("mixup_prob", 1.0)),
            degrees=float(aug.get("degrees", 0.0)),
            translate=float(aug.get("translate", 0.1)),
            mosaic_scale=tuple(aug.get("mosaic_scale", (0.5, 1.5))),
            mixup_scale=tuple(aug.get("mixup_scale", (0.5, 1.5))),
            shear=float(aug.get("shear", 0.0)),
        )
        self.pipeline = TrainAugPipeline(
            flip_lr_prob=float(aug.get("flip_lr_prob", 0.5)) if not no_aug else 0.0,
            flip_ud_prob=float(aug.get("flip_ud_prob", 0.0)) if not no_aug else 0.0,
            hsv_prob=float(aug.get("hsv_prob", 1.0)) if not no_aug else 0.0,
            img_sz=self.img_size,
        )
        self.index_stream = _IndexStream(
            len(dataset), seed=seed, shard=shard, num_shards=num_shards
        )
        self.steps_per_epoch = max(
            len(dataset) // (batch_size * num_shards), 1
        )
        self.device_aug = bool(device_aug)
        if self.device_aug:
            from vision_kit_tpu.data.device_aug import DeviceAugPlanner

            self.planner = DeviceAugPlanner(
                dataset,
                img_size=self.img_size,
                enable_mosaic=bool(aug.get("enable_mosaic", True)),
                enable_mixup=bool(aug.get("enable_mixup", False)),
                mosaic_prob=float(aug.get("mosaic_prob", 1.0)),
                mixup_prob=float(aug.get("mixup_prob", 1.0)),
                degrees=float(aug.get("degrees", 0.0)),
                translate=float(aug.get("translate", 0.1)),
                mosaic_scale=tuple(aug.get("mosaic_scale", (0.5, 1.5))),
                mixup_scale=tuple(aug.get("mixup_scale", (0.5, 1.5))),
                shear=float(aug.get("shear", 0.0)),
                flip_lr_prob=float(aug.get("flip_lr_prob", 0.5)),
                flip_ud_prob=float(aug.get("flip_ud_prob", 0.0)),
                hsv_prob=float(aug.get("hsv_prob", 1.0)),
                no_aug=no_aug,
            )
            self._batch_fn = partial(_make_device_batch, self.planner)
        else:
            self._batch_fn = partial(_make_batch, self.mosaic_ds,
                                     self.pipeline)
        self.num_workers = int(num_workers)
        # queue.Queue(maxsize=0) is UNBOUNDED — a free-running producer, not
        # "no prefetch"; clamp so prefetch<=0 means minimal lookahead (one
        # queued batch + one in production)
        self.prefetch = max(1, int(prefetch))
        prefetch = self.prefetch
        # fault the batch working set in once (live buffers: queued +
        # in-production + consumer-held) — see _malloc.prefault_arena
        _malloc.prefault_arena(
            (prefetch + 3) * self.batch_size * (5 if self.device_aug else 1)
            * self.img_size[0] * self.img_size[1] * 3
        )
        self._queue: queue.Queue = queue.Queue(maxsize=prefetch)
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None  # created per __iter__
        self._started = False
        self._procs: list = []
        self._mp_queues: list = []
        self._next_bid = 0

    def seek(self, batch_id: int) -> None:
        """Position the stream so the next produced batch is `batch_id`.

        Batches are deterministic per batch id (the index stream is
        random-access), so resuming training at global step s only needs
        `seek(s)` to continue the exact data sequence an uninterrupted run
        would have seen. Only valid while no producer is running (before
        the first iteration, or after close())."""
        if self._started or self._procs:
            raise RuntimeError(
                "seek() requires an idle loader — call it before iterating "
                "or after close()"
            )
        if batch_id < 0:
            raise ValueError(f"batch_id must be >= 0, got {batch_id}")
        self._next_bid = int(batch_id)

    def _make_batch(self, batch_id: int):
        return self._batch_fn(
            self.index_stream, self.batch_size, self.img_size,
            self.max_labels, self.seed, batch_id,
        )

    def _worker(self, out_q: queue.Queue, stop: threading.Event, bid: int):
        """Producer loop. `out_q`/`stop` are captured per thread (NOT read
        from self): after close() + re-iterate, a previous producer that is
        still finishing a decode keeps talking to its own dead queue/event
        and can never leak a stale-bid batch into the restarted stream."""
        import traceback

        while not stop.is_set():
            try:
                batch = self._make_batch(bid)
            except Exception:
                batch = ("__error__", traceback.format_exc())
            bid += 1
            while not stop.is_set():
                try:
                    out_q.put(batch, timeout=0.5)
                    break
                except queue.Full:
                    continue
            if isinstance(batch, tuple):
                return  # stop after shipping the error

    def _start_procs(self):
        import multiprocessing as mp

        # "spawn": the parent may hold live jax/PJRT/gRPC threads whose
        # locks a fork()ed child would inherit mid-held (deadlock); spawned
        # children re-import only this module's deps (numpy/cv2, no jax)
        ctx = mp.get_context("spawn")
        self._qbase = self._next_bid  # worker w owns bids qbase + w + i*W
        for w in range(self.num_workers):
            q = ctx.Queue(maxsize=max(self.prefetch // self.num_workers, 1))
            p = ctx.Process(
                target=_worker_main,
                args=(q, self._batch_fn, self.index_stream,
                      self.batch_size, self.img_size, self.max_labels,
                      self.seed, self._next_bid + w, self.num_workers),
                daemon=True,
            )
            p.start()
            self._procs.append(p)
            self._mp_queues.append(q)

    def _get_checked(self, q, worker_idx):
        """Queue get with worker liveness checks and error propagation."""
        import queue as _q

        while True:
            try:
                item = q.get(timeout=5.0)
                break
            except _q.Empty:
                p = self._procs[worker_idx]
                if not p.is_alive():
                    raise RuntimeError(
                        f"data worker {worker_idx} died "
                        f"(exitcode {p.exitcode})"
                    )
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__error__":
            raise RuntimeError(f"data worker {worker_idx} failed:\n{item[1]}")
        return item

    def __iter__(self):
        if self.num_workers > 0:
            # multi-process workers (SURVEY.md "host augmentation
            # throughput"): worker w produces batches w, w+W, w+2W, ...;
            # round-robin consumption keeps the exact single-thread order.
            # _next_bid persists across iter() calls so re-iterating a live
            # loader continues the stream in order.
            if not self._procs:
                self._start_procs()
            while True:
                # worker assignment is relative to the bid the current
                # worker set started at (a post-close() restart may begin
                # at any _next_bid)
                w = (self._next_bid - self._qbase) % self.num_workers
                batch = self._get_checked(self._mp_queues[w], w)
                self._next_bid += 1
                yield batch
        else:
            if not self._started:
                # fresh queue + stop event per producer generation: leftover
                # buffered batches from a closed producer would duplicate the
                # restarted producer's bids, and the old thread keeps its own
                # (set) event so it can't be revived by this clear
                if self._thread is not None and self._thread.is_alive():
                    self._thread.join(timeout=60.0)
                self._stop = threading.Event()
                self._queue = queue.Queue(maxsize=self.prefetch)
                self._thread = threading.Thread(
                    target=self._worker,
                    args=(self._queue, self._stop, self._next_bid),
                    daemon=True,
                )
                self._thread.start()
                self._started = True
            while True:
                item = self._queue.get()
                if isinstance(item, tuple) and item and item[0] == "__error__":
                    # the producer thread exited after shipping this; reset
                    # so a caller that catches the error and re-iterates
                    # gets a fresh producer instead of a silent deadlock
                    self._started = False
                    raise RuntimeError(f"data worker failed:\n{item[1]}")
                self._next_bid += 1
                yield item

    def close(self):
        self._stop.set()
        self._started = False
        # join the producer so a subsequent seek()+re-iterate can't race a
        # thread still inside _make_batch (it would corrupt the shared
        # _IndexStream epoch cache); the per-thread queue/event capture in
        # _worker makes even a join timeout harmless to the batch stream
        if self._thread is not None and self._thread.is_alive():
            self._thread.join(timeout=60.0)
        for p in self._procs:
            p.terminate()
        self._procs.clear()
        self._mp_queues.clear()


def _worker_main(out_q, batch_fn, index_stream, batch_size,
                 img_size, max_labels, seed, first_bid, stride):
    """Top-level (picklable) worker: produce batches first_bid, first_bid +
    stride, ... Deterministic per batch id regardless of worker count.
    batch_fn is a partial of _make_batch or _make_device_batch.
    Exceptions are shipped to the consumer as an ("__error__", tb) item."""
    import traceback

    # spawned process: fresh heap — fault in its batch working set
    # (in-production batch + pickle copies on the queue feeder)
    slots = 5 if getattr(batch_fn, "func", None) is _make_device_batch else 1
    _malloc.prefault_arena(
        4 * slots * batch_size * img_size[0] * img_size[1] * 3
    )
    bid = first_bid
    try:
        while True:
            out_q.put(batch_fn(index_stream, batch_size, img_size,
                               max_labels, seed, bid))
            bid += stride
    except Exception:
        out_q.put(("__error__", traceback.format_exc()))


def _make_batch(mosaic_ds, pipeline, index_stream, batch_size, img_size,
                max_labels, seed, batch_id):
    """Deterministic batch `batch_id`: index-stream positions
    [bid*B, (bid+1)*B), per-sample `default_rng([seed, 77, sid])` aug —
    identical output for any worker count. The single source of truth for
    both the thread and the spawned-process paths."""
    imgs, labels = [], []
    for k in range(batch_size):
        sid = batch_id * batch_size + k
        idx = index_stream.at(sid)
        rng = np.random.default_rng([seed, 77, sid])
        img, lab = mosaic_ds.getitem(rng, idx)
        img, lab = pipeline(rng, img, lab)
        imgs.append(img)
        labels.append(lab)
    return {
        "image": np.stack(imgs),  # uint8; normalized on device in the step
        "targets": pad_targets(labels, img_size, max_labels),
    }


def _make_device_batch(planner, index_stream, batch_size, img_size,
                       max_labels, seed, batch_id):
    """Deterministic device-augmentation batch `batch_id` (same bid/sid
    scheme as _make_batch): the planner draws per-sample RNG + labels on
    the host, ONE native batch call decodes every tile of the batch, and
    the pixel warp is left to the train step (data/device_aug.py).

    Yields {"tiles" (B, T, S, S, 3) u8, "tile_hw" (B, T, 2) i32,
    "params" (B, N_PARAMS) f32, "targets" (B, M, 5)} with T =
    planner.n_tiles (5 with mixup, else 4 — the warp statically skips the
    mixup leg)."""
    from vision_kit_tpu.data.device_aug import N_PARAMS

    n_tiles = planner.n_tiles
    h_sz, w_sz = img_size
    plans, decode_idxs, spans = [], [], []
    for k in range(batch_size):
        sid = batch_id * batch_size + k
        idx = index_stream.at(sid)
        rng = np.random.default_rng([seed, 77, sid])
        tile_idxs, draws = planner.plan(rng, idx)
        spans.append((len(decode_idxs), len(tile_idxs)))
        decode_idxs.extend(tile_idxs)
        plans.append(draws)

    ds = planner.dataset
    puller = getattr(ds, "batch_pull_items", None)
    items = (
        puller(decode_idxs) if puller is not None
        else [ds.pull_item(i) for i in decode_idxs]
    )

    # stale bytes outside each tile's valid region are never sampled
    # (device_aug.py buffer contract) — except slot 4, zeroed below
    tiles = np.empty((batch_size, n_tiles, h_sz, w_sz, 3), np.uint8)
    tile_hw = np.zeros((batch_size, n_tiles, 2), np.int32)
    params = np.zeros((batch_size, N_PARAMS), np.float32)
    labels_list = []
    for k, (draws, (off, n)) in enumerate(zip(plans, spans)):
        p_row, hw_row, labels, tile_imgs = planner.finalize(
            draws, items[off:off + n]
        )
        params[k] = p_row
        tile_hw[k] = hw_row
        labels_list.append(labels)
        for t, img in enumerate(tile_imgs):
            if img is None:
                continue
            if t == 4:
                # the mixup source is letterboxed onto a 114-gray canvas in
                # the reference (mosiac_dataset.py:177-254 cp_img
                # np.full(..., 114)); the region OUTSIDE the jit-resized
                # canvas is zero, but that is the warp's ok-mask, not the
                # buffer — the in-canvas margin must read gray
                tiles[k, 4] = 114
            th, tw = img.shape[:2]
            tiles[k, t, :th, :tw] = img
    return {
        "tiles": tiles,
        "tile_hw": tile_hw,
        "params": params,
        "targets": pad_targets(labels_list, img_size, max_labels),
    }


class ValLoader:
    """Sequential validation batches with letterbox preprocessing.

    Yields {"image": (B, S, S, 3) uint8, "targets": (B, M, 5),
            "info": list of (h0, w0, ratio, pad, img_id)} — the info list is
    what the evaluator needs to rescale detections to original frames.
    The last partial batch is padded by repeating the final sample, with
    "count" giving the real number.

    Decode runs through the dataset's `batch_pull_items` (one native C++
    thread-pool call per batch when images aren't cached), and a background
    thread prefetches the next batch so host decode overlaps the device
    eval step (the round-1 ValLoader was sequential single-image Python —
    VERDICT.md "What's weak" #2).
    """

    def __init__(self, dataset, batch_size: int, img_size=(640, 640),
                 max_labels: int = MAX_LABELS, prefetch: int = 2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.img_size = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        self.pipeline = ValAugPipeline(img_sz=self.img_size)
        self.max_labels = max_labels
        self.prefetch = prefetch
        _malloc.prefault_arena(
            (prefetch + 3) * batch_size
            * self.img_size[0] * self.img_size[1] * 3
        )

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def _make_batch(self, start: int):
        n = len(self.dataset)
        idxs = list(range(start, min(start + self.batch_size, n)))
        count = len(idxs)
        while len(idxs) < self.batch_size:
            idxs.append(idxs[-1])
        puller = getattr(self.dataset, "batch_pull_items", None)
        items = (
            puller(idxs) if puller is not None
            else [self.dataset.pull_item(i) for i in idxs]
        )
        imgs, labels, infos = [], [], []
        for img, lab, (h0, w0), img_id in items:
            # dataset pre-resized by r0; letterbox the rest of the way —
            # rescale info comes from the pipeline's OWN transform
            img2, lab2, (r1, pad) = self.pipeline.apply(img, lab)
            r0 = min(self.img_size[0] / h0, self.img_size[1] / w0)
            imgs.append(img2)
            labels.append(lab2)
            infos.append((h0, w0, r0 * r1, pad, img_id))
        images = np.stack(imgs)  # uint8; normalized on device in the jitted step
        targets = pad_targets(labels, self.img_size, self.max_labels)
        return {
            "image": images,
            "targets": targets,
            "info": infos,
            "count": count,
        }

    def __iter__(self):
        n = len(self.dataset)
        starts = list(range(0, n, self.batch_size))
        if self.prefetch <= 0:
            for s in starts:
                yield self._make_batch(s)
            return
        # background producer: decode of batch k+1 overlaps the consumer's
        # device step on batch k (ctypes/cv2 release the GIL)
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        done = object()
        stop = threading.Event()

        def _put(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def produce():
            try:
                for s in starts:
                    if not _put(self._make_batch(s)):
                        return
                _put(done)
            except BaseException:
                import traceback

                _put(("__error__", traceback.format_exc()))

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is done:
                    return
                if isinstance(item, tuple) and item and item[0] == "__error__":
                    raise RuntimeError(f"val loader failed:\n{item[1]}")
                yield item
        finally:
            stop.set()  # a mid-decode producer exits at its next put
