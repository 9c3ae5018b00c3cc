"""Datasets: YOLO-format (images/ + labels/*.txt) and COCO-format (json).

Behavioral counterparts of vision_kit/data/datasets/{yolo,coco}.py. The
internal sample contract matches the reference's `pull_item`:

    pull_item(idx) -> (img_rgb_uint8 HWC, labels (n, 5) float32
                       [x1, y1, x2, y2, cls] in absolute pixels,
                       (h0, w0), idx)

COCO parsing uses stdlib json (pycocotools is optional and only needed for
the alternative mAP backend). Label caching: a .npz cache alongside the data
dir keyed by file list hash, replacing the reference's pickle .cache
(yolo.py:164-202) — corrupt or missing files are skipped with a warning,
and the reference's integrity-check behaviors (bounds clamp, class filter)
are kept. The reference's bugs (hardcoded class_ids [0..6] at yolo.py:38,
inverted no-labels warning :188) are intentionally not replicated.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import time
from glob import glob

import cv2
import numpy as np

logger = logging.getLogger("vision_kit_tpu")

IMG_EXTS = (".jpg", ".jpeg", ".png", ".bmp", ".webp")


def _remove_stale_meta(meta_path: str) -> None:
    """Delete an on-disk image-cache meta before its .dat is recreated with
    'w+' (zero-filled): a crash between the two must present as an EMPTY
    cache on the next construction, never as a built one over zeroed pixels."""
    try:
        if os.path.exists(meta_path):
            os.remove(meta_path)
    except OSError as e:
        logger.warning("could not remove stale cache meta %s: %s",
                       meta_path, e)


def _use_native() -> bool:
    """Native vkio decode path (C++ thread-pool, bit-identical to the cv2
    path — tests/test_native.py). Opt out with VK_NO_NATIVE=1."""
    if os.environ.get("VK_NO_NATIVE"):
        return False
    from vision_kit_tpu.data import native

    return native.available()


def _probe_jpeg(path: str):
    """JPEG header scan: (h0, w0, has_exif) without decoding, or None when
    the file isn't parseable as a JPEG. Mirrors native/vkio.cpp ProbeJpeg
    byte-for-byte so the Python and native fast paths gate identically."""
    try:
        with open(path, "rb") as f:
            buf = f.read(256 * 1024)
    except OSError:
        return None
    n = len(buf)
    if n < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        return None
    has_exif = False
    pos = 2
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            return None
        m = pos + 1
        while m < n and buf[m] == 0xFF:
            m += 1
        if m >= n:
            return None
        marker = buf[m]
        pos = m + 1
        if marker == 0xD8 or marker == 0x01 or 0xD0 <= marker <= 0xD7:
            continue
        if marker in (0xD9, 0xDA):
            return None
        if pos + 2 > n:
            return None
        length = (buf[pos] << 8) | buf[pos + 1]
        if length < 2 or pos + length > n:
            return None
        payload = buf[pos + 2:pos + length]
        if marker == 0xE1 and payload[:6] == b"Exif\x00\x00":
            has_exif = True
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if len(payload) < 5:
                return None
            h0 = (payload[1] << 8) | payload[2]
            w0 = (payload[3] << 8) | payload[4]
            if h0 <= 0 or w0 <= 0:
                return None
            return h0, w0, has_exif
        pos += length
    return None


_REDUCED_FLAGS = {
    2: cv2.IMREAD_REDUCED_COLOR_2,
    4: cv2.IMREAD_REDUCED_COLOR_4,
    8: cv2.IMREAD_REDUCED_COLOR_8,
}


def _fast_decode_resized(path: str, max_hw):
    """Reduced-scale JPEG decode + min-ratio resize (the `_decode_resized`
    geometry): decode at 1/f via libjpeg's DCT-domain scaling (f in 8/4/2),
    then resize the remainder. ~f^2 less IDCT work — the dominant cost of
    the uncached single-core input path (DESIGN.md "Host allocation
    behavior"). EXIF-bearing JPEGs fall back (cv2 applies orientation,
    which the header probe would have to replicate). Pixels differ from the
    full decode at distribution level only (reduced decode is a DCT
    box-average); geometry and (h0, w0) are exact. Bit-identical to the
    native fast path (vkio.cpp FastDecodeJpeg — same cv2 ops).

    Returns (img_rgb, (h0, w0)) or None when the fast path doesn't apply."""
    probe = _probe_jpeg(path)
    if probe is None or probe[2]:
        return None
    h0, w0, _ = probe
    max_h, max_w = max_hw
    r = min(max_h / h0, max_w / w0)
    if r >= 1.0:
        return None
    new_w, new_h = int(w0 * r), int(h0 * r)
    f = next((f for f in (8, 4, 2)
              if -(-h0 // f) >= new_h and -(-w0 // f) >= new_w), 1)
    if f < 2:
        return None
    bgr = cv2.imread(path, _REDUCED_FLAGS[f])
    # validate the probe against libjpeg's ceil(dim/f) scaled output
    if bgr is None or bgr.shape[:2] != (-(-h0 // f), -(-w0 // f)):
        return None
    if bgr.shape[:2] != (new_h, new_w):
        bgr = cv2.resize(bgr, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    return cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB), (h0, w0)


def _img2label_path(img_path: str) -> str:
    sa = os.sep + "images" + os.sep
    sb = os.sep + "labels" + os.sep
    # LAST /images/ occurrence (reference yolo.py:249 rsplit): an ancestor
    # directory named "images" must not hijack the mapping
    base, _ = os.path.splitext(sb.join(img_path.rsplit(sa, 1)))
    return base + ".txt"


class _ImageCacheMixin:
    """RAM/disk cache of the load-time-resized images (counterpart of the
    reference's RAM/disk image caches, yolo.py:112-143 and the COCO memmap
    cache coco.py:77-125).

    `cache_images` in {None, "ram", "disk"}. Both modes store the image
    *after* the load-time min-ratio resize (what pull_item needs), so every
    later epoch skips JPEG decode + resize entirely. The disk cache is a
    single memmap of shape (n, max_h, max_w, 3) plus an int32 (n, 4) meta
    array [h, w, h0, w0]; it is keyed by the file list + input size and is
    reused across runs and across spawn-based loader workers (the memmap
    handle is dropped on pickling and reopened lazily in the worker).

    The disk-cache build is RESTARTABLE (meta rows are published atomically
    per chunk, after their pixels are flushed; a killed build resumes at the
    first unbuilt row) and SHARED across splits: a complete cache of another
    dataset whose entry list is a superset of ours (same size/decode mode)
    is adopted read-only via a row map instead of re-decoding. Progress is
    logged with ETA every 30 s — at COCO scale the build is hours on one
    core, and losing it to a ^C was the round-2 complaint (VERDICT #6)."""

    def _init_img_cache(self, cache_images, cache_key: str, base_dir: str,
                        entries: list | None = None):
        if cache_images not in (None, "", False, "ram", "disk"):
            raise ValueError(
                f"cache_images must be None, 'ram' or 'disk', got {cache_images!r}"
            )
        self.cache_images = cache_images or None
        self._ram_cache = None
        self._mm = None
        self._mm_meta = None
        self._mm_rows = None
        if not self.cache_images:
            return
        maxh, maxw = self.input_dim
        chunk = int(getattr(self, "cache_build_chunk", 64))  # batched native decode
        if self.cache_images == "ram":
            self._ram_cache = []
            for s in range(0, len(self), chunk):
                for img, hw0 in self._decode_resized_batch(
                    range(s, min(s + chunk, len(self)))
                ):
                    self._ram_cache.append((np.array(img), hw0))
            logger.info("cached %d images in RAM", len(self))
            return
        fast = "|fast" if getattr(self, "fast_decode", False) else ""
        entries = entries if entries is not None else cache_key.split("\n")
        assert len(entries) == len(self)
        tag = hashlib.md5(
            f"{cache_key}|{maxh}x{maxw}{fast}".encode()
        ).hexdigest()[:12]
        self._mm_path = os.path.join(base_dir, f".vk_imgcache_{tag}.dat")
        self._mm_shape = (len(self), maxh, maxw, 3)
        self._mm_rows = None
        meta_path = self._mm_path + ".meta.npy"

        # exact reuse / restartable resume of this dataset's own cache.
        # A meta row of zeros marks an unbuilt entry (every decoded image
        # has h >= 1), so a build killed mid-way resumes where it stopped:
        # pixels are mm.flush()ed BEFORE the meta rows that reference them
        # are atomically published, per chunk.
        meta = None
        if os.path.exists(self._mm_path) and os.path.exists(meta_path):
            try:
                meta = np.load(meta_path)
                if meta.shape != (len(self), 4):
                    meta = None
            except Exception:
                meta = None
            if meta is None:
                logger.warning("disk image cache unreadable, rebuilding")
        if meta is not None and (meta[:, 0] > 0).all():
            # the .dat itself can be truncated/corrupt while meta survived
            # (partial copy, filesystem damage) — fall back to a rebuild
            # instead of crashing construction
            try:
                mm = np.memmap(self._mm_path, np.uint8, "r",
                               shape=self._mm_shape)
            except Exception:
                logger.warning("disk image cache .dat unreadable, rebuilding")
                meta = None
            else:
                self._mm_meta = meta
                self._mm = mm
                logger.info("reusing disk image cache %s", self._mm_path)
                return

        if meta is None:
            # before building from scratch, look for a built cache of
            # another split whose entry list is a SUPERSET of ours (same
            # size/decode mode): reference its rows instead of re-decoding
            # (e.g. val ⊂ train file lists, or two configs over one dir)
            shared = self._find_superset_cache(base_dir, entries, maxh,
                                               maxw, fast)
            if shared is not None:
                return
            # a stale meta (e.g. wrong shape, or left by a different run)
            # must not survive the zero-filling 'w+' open: a crash before
            # the first chunk republishes meta would otherwise leave zeroed
            # pixels under a meta claiming them built — silently-black rows
            _remove_stale_meta(meta_path)
            mm = np.memmap(self._mm_path, np.uint8, "w+",
                           shape=self._mm_shape)
            meta = np.zeros((len(self), 4), np.int32)
        else:
            # size check BEFORE r+: numpy memmap r+ silently GROWS a
            # truncated file with zeros, so a damaged .dat would "resume"
            # into silently-black rows meta claims are built
            need = int(np.prod(self._mm_shape))
            try:
                if os.path.getsize(self._mm_path) < need:
                    raise ValueError("disk cache .dat smaller than its shape")
                mm = np.memmap(self._mm_path, np.uint8, "r+",
                               shape=self._mm_shape)
            except Exception:
                # truncated/corrupt partial .dat: restart the build. The
                # on-disk meta claiming rows built goes FIRST — 'w+' zero-
                # fills the .dat, and a crash mid-rebuild must read as an
                # empty cache, not a built one serving black images
                _remove_stale_meta(meta_path)
                logger.warning("disk image cache .dat unreadable, rebuilding")
                mm = np.memmap(self._mm_path, np.uint8, "w+",
                               shape=self._mm_shape)
                meta = np.zeros((len(self), 4), np.int32)
            else:
                logger.info(
                    "resuming disk image cache build %s (%d/%d done)",
                    self._mm_path, int((meta[:, 0] > 0).sum()), len(self),
                )

        sidecar = {"entries": entries, "maxh": maxh, "maxw": maxw,
                   "fast": bool(fast)}
        with open(self._mm_path + ".entries.json", "w") as f:
            json.dump(sidecar, f)

        todo = np.flatnonzero(meta[:, 0] == 0)
        t0, done0 = time.monotonic(), len(self) - len(todo)
        last_log = t0
        for s in range(0, len(todo), chunk):
            idxs = todo[s:s + chunk].tolist()
            for i, (img, (h0, w0)) in zip(
                idxs, self._decode_resized_batch(idxs)
            ):
                h, w = img.shape[:2]
                mm[i, :h, :w] = img
                meta[i] = (h, w, h0, w0)
            # durability order: pixels first, then the meta rows naming them
            mm.flush()
            tmp = meta_path + ".tmp.npy"
            np.save(tmp, meta)
            os.replace(tmp, meta_path)
            now = time.monotonic()
            if now - last_log > 30:
                built = done0 + s + len(idxs)
                rate = (built - done0) / max(now - t0, 1e-9)
                eta = (len(self) - built) / max(rate, 1e-9)
                logger.info("disk image cache %d/%d (%.0f img/s, ETA %.0fs)",
                            built, len(self), rate, eta)
                last_log = now
        del mm
        self._mm_meta = meta
        self._mm = np.memmap(self._mm_path, np.uint8, "r",
                             shape=self._mm_shape)
        logger.info("built disk image cache %s", self._mm_path)

    def _find_superset_cache(self, base_dir, entries, maxh, maxw, fast):
        """Adopt a COMPLETE existing cache (same size/decode mode) whose
        entry list contains every one of ours: map our indices into its
        rows. Returns the adopted path or None."""
        for sc_path in sorted(glob(os.path.join(base_dir,
                                                ".vk_imgcache_*.entries.json"))):
            dat = sc_path[: -len(".entries.json")]
            if dat == self._mm_path:
                continue
            try:
                with open(sc_path) as f:
                    sc = json.load(f)
                if (sc["maxh"], sc["maxw"], sc["fast"]) != (maxh, maxw,
                                                            bool(fast)):
                    continue
                pos = {e: i for i, e in enumerate(sc["entries"])}
                rows = [pos.get(e, -1) for e in entries]
                if min(rows, default=-1) < 0:
                    continue
                meta = np.load(dat + ".meta.npy")
                if meta.shape != (len(sc["entries"]), 4):
                    continue
                rows = np.asarray(rows, np.int64)
                if not (meta[rows, 0] > 0).all():
                    continue  # needed rows not built yet
                # everything validated INCLUDING the .dat itself (a user may
                # delete the big file and leave the sidecars) before any
                # self mutation — a bad candidate is skipped, not fatal
                shape = (len(sc["entries"]), maxh, maxw, 3)
                mm = np.memmap(dat, np.uint8, "r", shape=shape)
            except Exception:
                continue
            self._mm_path = dat
            self._mm_shape = shape
            self._mm_rows = rows
            self._mm_meta = meta[rows]
            self._mm = mm
            logger.info("sharing disk image cache %s (%d/%d rows)", dat,
                        len(rows), len(sc["entries"]))
            return dat
        return None

    def _get_resized(self, idx: int):
        """(resized_rgb_uint8, (h0, w0)) through the cache if enabled."""
        if self._ram_cache is not None:
            img, hw0 = self._ram_cache[idx]
            return img.copy(), hw0
        if self.cache_images == "disk":
            if self._mm is None:  # reopened lazily after pickling to a worker
                self._mm = np.memmap(self._mm_path, np.uint8, "r",
                                     shape=self._mm_shape)
                if self._mm_meta is None:
                    meta = np.load(self._mm_path + ".meta.npy")
                    self._mm_meta = (meta if self._mm_rows is None
                                     else meta[self._mm_rows])
            row = idx if self._mm_rows is None else int(self._mm_rows[idx])
            h, w, h0, w0 = (int(v) for v in self._mm_meta[idx])
            return np.array(self._mm[row, :h, :w]), (h0, w0)
        return self._decode_resized(idx)

    # -- native decode dispatch ------------------------------------------
    def _decode_resized(self, idx: int):
        """Decode + min-ratio resize of one image: native C++ when
        available, cv2 otherwise (bit-identical; see native/vkio.cpp
        DecodeResize vs `_decode_resized_py`). With `fast_decode`, JPEGs
        whose ratio allows it decode at reduced DCT scale
        (_fast_decode_resized / vkio FastDecodeJpeg — also bit-identical
        to each other)."""
        fast = getattr(self, "fast_decode", False)
        if _use_native():
            from vision_kit_tpu.data import native

            out = native.decode_resize(
                self._image_path(idx), self.input_dim, fast=fast
            )
            if out is not None:
                return out
            # fall through: the python path owns the unreadable-file error
        elif fast:
            out = _fast_decode_resized(self._image_path(idx), self.input_dim)
            if out is not None:
                return out
        return self._decode_resized_py(idx)

    def _decode_resized_batch(self, idxs):
        """Batched decode+resize: one native thread-pool call for the whole
        batch (SURVEY §2.6 "image decode/resize" as a native capability).
        Returns a list of (img_view, (h0, w0)); views alias one shared
        buffer — copy before storing long-term."""
        idxs = list(idxs)
        if _use_native() and len(idxs) > 1:
            from vision_kit_tpu.data import native

            buf, metas = native.decode_resize_batch(
                [self._image_path(i) for i in idxs], self.input_dim,
                fast=getattr(self, "fast_decode", False),
            )
            out = []
            for k, i in enumerate(idxs):
                h, w, h0, w0, ok = (int(v) for v in metas[k])
                if not ok:  # python path raises/handles the bad file
                    out.append(self._decode_resized_py(i))
                else:
                    out.append((buf[k, : h * w * 3].reshape(h, w, 3),
                                (h0, w0)))
            return out
        return [self._decode_resized(i) for i in idxs]

    def batch_pull_items(self, idxs):
        """Batched pull_item (same tuples): parallel native decode when the
        images are not already cached. The ValLoader's per-batch entry."""
        idxs = list(idxs)
        # per-item path only when a cache is actually live in THIS process
        # (a spawn worker drops the RAM cache in __getstate__ and should use
        # the native batch decode instead of per-item decode)
        if self._ram_cache is not None or self.cache_images == "disk":
            return [self.pull_item(i) for i in idxs]
        decoded = self._decode_resized_batch(idxs)
        return [
            (img, self._labels_resized(i, img.shape[:2], hw0), hw0,
             self._item_id(i))
            for (img, hw0), i in zip(decoded, idxs)
        ]

    def _decode_resized_py(self, idx: int):
        """cv2 decode + min-ratio resize — THE geometry contract mirrored
        bit-for-bit by native DecodeResize (vkio.cpp): r = min(max/src),
        C-style int truncation of w*r / h*r, INTER_LINEAR. One copy for
        every dataset format; raw pixel loading is the `load_image` hook."""
        img = self.load_image(idx)
        h0, w0 = img.shape[:2]
        r = min(self.input_dim[0] / h0, self.input_dim[1] / w0)
        if r != 1:
            img = cv2.resize(
                img,
                (int(w0 * r), int(h0 * r)),
                interpolation=cv2.INTER_LINEAR,
            )
        return img, (h0, w0)

    def __getstate__(self):
        state = dict(self.__dict__)
        state["_mm"] = None  # memmap handles don't pickle; reopen in worker
        # NEVER ship the RAM cache to spawn workers: pickling it copies the
        # whole decoded dataset per worker (num_workers+1 x memory).
        # Workers fall back to per-item decode (disk cache still memmaps
        # cheaply); the parent process keeps its cache for the eval path.
        state["_ram_cache"] = None
        return state


class YOLODataset(_ImageCacheMixin):
    """YOLO-format dataset (reference data/datasets/yolo.py:21-299)."""

    def __init__(
        self,
        data_dir: str,
        img_size=(640, 640),
        filter_classes=(),
        cache: bool = True,
        cache_images: str | None = None,
        fast_decode: bool = False,
    ):
        self.data_dir = data_dir
        self.input_dim = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        self.fast_decode = bool(fast_decode)
        self.filter_classes = list(filter_classes)
        self.img_files = sorted(
            p
            for p in glob(os.path.join(data_dir, "**", "*.*"), recursive=True)
            if p.lower().endswith(IMG_EXTS) and (os.sep + "images" + os.sep) in p
        )
        if not self.img_files:
            # also accept flat dirs of images with labels alongside
            self.img_files = sorted(
                p
                for p in glob(os.path.join(data_dir, "*.*"))
                if p.lower().endswith(IMG_EXTS)
            )
        if not self.img_files:
            raise FileNotFoundError(f"No images found under {data_dir}")
        self.labels = self._load_labels(cache)
        self._init_img_cache(
            cache_images, "\n".join(self.img_files), self.data_dir,
            entries=list(self.img_files),
        )

    # -- label cache + integrity scan -------------------------------------
    def _cache_path(self) -> str:
        h = hashlib.md5("\n".join(self.img_files).encode()).hexdigest()[:12]
        return os.path.join(self.data_dir, f".vk_labels_{h}.npz")

    @staticmethod
    def _check_img(path: str) -> str | None:
        """Image integrity check (reference check_img, yolo.py:251-268):
        PIL verify, EXIF-corrected min-size gate, truncated-JPEG
        detect+restore. Returns None when usable, else the drop reason."""
        from vision_kit_tpu.utils.general import exif_size

        try:
            from PIL import Image, ImageOps

            with Image.open(path) as im:
                im.verify()
                w, h = exif_size(im)
                fmt = (im.format or "").lower()
            if w < 10 or h < 10:
                return f"image size {w}x{h} < 10 pixels"
            if fmt in ("jpg", "jpeg"):
                with open(path, "rb") as f:
                    f.seek(-2, 2)
                    truncated = f.read() != b"\xff\xd9"
                if truncated:
                    # reference behavior: re-encode in display orientation
                    # (decoding the partial stream needs PIL's truncated
                    # mode; missing scanlines come out gray)
                    from PIL import ImageFile

                    prev = ImageFile.LOAD_TRUNCATED_IMAGES
                    ImageFile.LOAD_TRUNCATED_IMAGES = True
                    try:
                        ImageOps.exif_transpose(Image.open(path)).save(
                            path, "JPEG", subsampling=0, quality=100
                        )
                        logger.warning(
                            "%s: corrupt JPEG restored and saved", path
                        )
                    except Exception as e:
                        return f"truncated JPEG, restore failed: {e}"
                    finally:
                        ImageFile.LOAD_TRUNCATED_IMAGES = prev
            return None
        except Exception as e:
            return str(e)

    def _load_labels(self, cache: bool):
        """Label parse + image integrity scan. Unreadable/corrupt images are
        logged and DROPPED (self.img_files shrinks) instead of crashing the
        loader mid-epoch; verdicts are cached in the .npz keyed by the
        original file list."""
        path = self._cache_path()
        if cache and os.path.exists(path):
            try:
                with np.load(path, allow_pickle=True) as z:
                    files = [str(f) for f in z["files"]]
                    # coerce: older caches where every image had the same
                    # label count round-tripped as a 3-D object array,
                    # turning rows into float64-math object arrays
                    labels = [
                        np.asarray(lab, np.float32).reshape(-1, 5)
                        for lab in z["labels"]
                    ]
                if len(files) == len(labels):
                    self.img_files = files
                    return labels
                logger.warning("label cache stale, rebuilding: %s", path)
            except Exception:
                logger.warning("label cache unreadable, rebuilding: %s", path)
        labels, kept = [], []
        n_missing = n_bad = n_dropped = 0
        for img_path in self.img_files:
            reason = self._check_img(img_path)
            if reason is not None:
                n_dropped += 1
                logger.warning("dropping unreadable image %s: %s",
                               img_path, reason)
                continue
            lp = _img2label_path(img_path)
            rows = np.zeros((0, 5), np.float32)
            if os.path.exists(lp):
                try:
                    raw = np.loadtxt(lp, ndmin=2, dtype=np.float32)
                    if raw.size:
                        if raw.shape[1] != 5:
                            raise ValueError(f"labels need 5 cols: {lp}")
                        if not (raw >= 0).all():
                            raise ValueError(f"negative values: {lp}")
                        if not (raw[:, 1:] <= 1).all():
                            raise ValueError(f"non-normalized coords: {lp}")
                        _, uniq = np.unique(raw, axis=0, return_index=True)
                        if len(uniq) < len(raw):  # reference yolo.py:283-287
                            logger.warning(
                                "%s: %d duplicate labels removed", lp,
                                len(raw) - len(uniq),
                            )
                            raw = raw[np.sort(uniq)]
                        rows = raw
                except Exception as e:  # drop bad sample's labels, keep image
                    n_bad += 1
                    logger.warning("bad label file %s: %s", lp, e)
            else:
                n_missing += 1
            kept.append(img_path)
            labels.append(rows)
        if not kept:
            raise RuntimeError(
                f"no readable images under {self.data_dir} "
                f"({n_dropped} dropped as corrupt)"
            )
        if n_missing == len(kept):
            logger.warning("No labels found under %s", self.data_dir)
        self.img_files = kept
        if cache:
            try:
                # 1-D object array explicitly: np.asarray(labels, object)
                # would build a 3-D scalar-object array whenever every image
                # has the same label count, corrupting dtypes on reload
                arr = np.empty(len(labels), dtype=object)
                for i, lab in enumerate(labels):
                    arr[i] = lab
                np.savez_compressed(path, labels=arr, files=np.asarray(kept))
            except Exception:
                pass
        return labels

    # -- sample access ----------------------------------------------------
    def __len__(self):
        return len(self.img_files)

    def load_image(self, idx: int):
        img = cv2.imread(self.img_files[idx])  # BGR
        if img is None:
            raise IOError(f"image unreadable: {self.img_files[idx]}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def load_anno(self, idx: int) -> np.ndarray:
        """(n, 5) [x1, y1, x2, y2, cls] in a *resized* frame consistent with
        pull_item (labels scale with the image)."""
        return self.pull_item(idx)[1]

    def _image_path(self, idx: int) -> str:
        return self.img_files[idx]

    def _item_id(self, idx: int):
        return idx

    def _labels_resized(self, idx: int, img_hw, hw0) -> np.ndarray:
        """Normalized label rows -> absolute xyxy+cls in the resized frame."""
        h, w = img_hw
        rows = self.labels[idx]
        out = np.zeros((len(rows), 5), np.float32)
        if len(rows):
            cls = rows[:, 0]
            cx, cy, bw, bh = (rows[:, 1] * w, rows[:, 2] * h,
                              rows[:, 3] * w, rows[:, 4] * h)
            out[:, 0] = cx - bw / 2
            out[:, 1] = cy - bh / 2
            out[:, 2] = cx + bw / 2
            out[:, 3] = cy + bh / 2
            out[:, 4] = cls
            if self.filter_classes:
                keep = np.isin(out[:, 4], self.filter_classes)
                out = out[keep]
        return out

    def pull_item(self, idx: int):
        img, (h0, w0) = self._get_resized(idx)
        labels = self._labels_resized(idx, img.shape[:2], (h0, w0))
        return img, labels, (h0, w0), idx


class COCODataset(_ImageCacheMixin):
    """COCO-json dataset (reference data/datasets/coco.py:19-237), parsed
    with stdlib json. Annotations are cleaned (x2>x1, y2>y1, area>0) and
    pre-scaled to the load-time resize like the reference (:161-162).

    `filter_classes` matches the reference's semantics (coco.py:127-130,
    171-172): values are the CONTIGUOUS remapped class indices (the position
    of the category in the json's sorted category-id list — i.e. the indices
    `data.class_labels` is written in), NOT raw COCO category ids. Labels of
    other classes are dropped; images keep their slot (possibly label-free).
    """

    def __init__(
        self,
        data_dir: str,
        json_file: str = "instances_train2017.json",
        name: str = "train2017",
        img_size=(640, 640),
        filter_classes=(),
        cache_images: str | None = None,
        fast_decode: bool = False,
    ):
        self.data_dir = data_dir
        self.name = name
        self.input_dim = (
            (img_size, img_size) if isinstance(img_size, int) else tuple(img_size)
        )
        self.fast_decode = bool(fast_decode)
        ann_path = (
            json_file
            if os.path.isabs(json_file)
            else os.path.join(data_dir, "annotations", json_file)
        )
        if not os.path.exists(ann_path):
            raise FileNotFoundError(f"annotation file missing: {ann_path}")
        with open(ann_path) as f:
            coco = json.load(f)

        cat_ids = sorted(c["id"] for c in coco.get("categories", []))
        self.cat_ids = cat_ids
        self.class_ids = {cid: i for i, cid in enumerate(cat_ids)}
        self.class_names = [
            c["name"] for c in sorted(coco.get("categories", []),
                                      key=lambda c: c["id"])
        ]

        anns_by_img: dict[int, list] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)

        self.items = []
        for im in coco["images"]:
            rows = []
            for a in anns_by_img.get(im["id"], []):
                x, y, w, h = a["bbox"]
                x2, y2 = x + w, y + h
                if w <= 0 or h <= 0:
                    continue
                cls = self.class_ids[a["category_id"]]
                if filter_classes and cls not in filter_classes:
                    continue
                rows.append([x, y, x2, y2, cls])
            self.items.append(
                {
                    "id": im["id"],
                    "file_name": im["file_name"],
                    "height": im["height"],
                    "width": im["width"],
                    "labels": np.asarray(rows, np.float32).reshape(-1, 5),
                }
            )
        self._init_img_cache(
            cache_images,
            self.name + "\n" + "\n".join(i["file_name"] for i in self.items),
            self.data_dir,
            entries=[self._image_path(i) for i in range(len(self.items))],
        )

    def __len__(self):
        return len(self.items)

    def load_anno(self, idx: int) -> np.ndarray:
        item = self.items[idx]
        r = min(self.input_dim[0] / item["height"],
                self.input_dim[1] / item["width"])
        labels = item["labels"].copy()
        labels[:, :4] *= r
        return labels

    def _image_path(self, idx: int) -> str:
        return os.path.join(self.data_dir, self.name,
                            self.items[idx]["file_name"])

    def _item_id(self, idx: int):
        return self.items[idx]["id"]

    def load_image(self, idx: int) -> np.ndarray:
        """Raw RGB pixels (the `_decode_resized_py` hook)."""
        path = self._image_path(idx)
        img = cv2.imread(path)
        if img is None:
            raise IOError(f"image unreadable: {path}")
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)

    def _labels_resized(self, idx: int, img_hw, hw0) -> np.ndarray:
        h0, w0 = hw0
        r = min(self.input_dim[0] / h0, self.input_dim[1] / w0)
        labels = self.items[idx]["labels"].copy()
        labels[:, :4] *= r
        return labels

    def pull_item(self, idx: int):
        img, (h0, w0) = self._get_resized(idx)
        labels = self._labels_resized(idx, img.shape[:2], (h0, w0))
        return img, labels, (h0, w0), self.items[idx]["id"]


class ConcatDataset:
    """Concatenation of datasets sharing the pull_item contract
    (counterpart of reference data/datasets/datasets_wrapper.py:12-31)."""

    def __init__(self, datasets):
        self.datasets = list(datasets)
        if not self.datasets:
            raise ValueError("ConcatDataset needs at least one dataset")
        self.cum = np.cumsum([len(d) for d in self.datasets]).tolist()
        self.input_dim = self.datasets[0].input_dim

    def __len__(self):
        return self.cum[-1]

    def _locate(self, idx: int):
        if idx < 0:
            idx += len(self)
        ds = int(np.searchsorted(self.cum, idx, side="right"))
        prev = 0 if ds == 0 else self.cum[ds - 1]
        return self.datasets[ds], idx - prev

    def load_anno(self, idx: int):
        d, i = self._locate(idx)
        return d.load_anno(i)

    def pull_item(self, idx: int):
        d, i = self._locate(idx)
        img, labels, hw0, _ = d.pull_item(i)
        return img, labels, hw0, idx


class MixConcatDataset(ConcatDataset):
    """ConcatDataset variant whose indices may arrive as (flag, idx) tuples
    from a mosaic-toggling batch sampler (reference datasets_wrapper.py:34-59
    — there the tuple's last element is the real index)."""

    def pull_item(self, index):
        idx = index[-1] if isinstance(index, (tuple, list)) else index
        return super().pull_item(idx)


class CustomDataset(YOLODataset):
    """Extension template (counterpart of the reference's non-functional
    data/datasets/custom.py stub): subclass and override `_load_labels` /
    `pull_item` for bespoke on-disk formats; everything downstream (mosaic,
    loader, evaluator) only uses the pull_item contract."""
