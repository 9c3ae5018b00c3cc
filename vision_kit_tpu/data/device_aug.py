"""Device-side train augmentation: mosaic + affine + mixup + HSV + flips
as one jitted XLA program.

Why: the reference runs mosaic/affine/HSV in DataLoader workers
(vision_kit/data/mosiac_dataset.py:55-254, augmentations.py:95-184) — a
host hot loop. On a TPU host with few cores the loader cannot feed the
device (measured: ~100 img/s host augmentation vs ~600 img/s device train
step on this box). The TPU-native answer is to move the *pixel* work into
the train step itself, where it is bandwidth-cheap next to the convs, and
leave the host with decode + RNG decisions + label math (microseconds per
batch of <=640 boxes).

Split of responsibilities:
  host  (`DeviceAugPlanner`): picks mosaic/mixup participation, tile
        indices, all random geometry/color parameters, and computes the
        exact final label set in numpy — the same arithmetic as the host
        pipeline (data/mosaic.py, data/augment.py).
  device (`warp_augment`): a pure function of (tiles, tile_hw, params) ->
        normalized float batch. No RNG on device; every sample is fully
        determined by its host-sampled parameter row.

Geometry model (valid because the v5/v7 configs use degrees=0, shear=0 —
the planner refuses otherwise and the loader falls back to the host
pipeline): the mosaic paste (mosiac_dataset.py:112-175) and the closing
random_affine collapse into one scale+translate map from output pixels to
the *conceptual* 2Sx2S canvas; each bilinear tap lands on an integer
canvas point, which resolves to (quadrant tile, in-tile offset) exactly
like the reference's `get_mosaic_coordinate` crop arithmetic
(mosiac_dataset.py:256-275) — the canvas is never materialized, and taps
of one output pixel may straddle tile seams just as the materialized
canvas allows. MixUp (mosiac_dataset.py:177-254) is a second scale+crop
sampling of a 5th tile blended at weight 0.5. HSV replicates the uint8
LUT semantics (augmentations.py:88-99) in float; flips are reversed-axis
selects. Plain (non-mosaic) samples ride the same kernel with degenerate
parameters (center xc=2W, yc=2H puts every pixel in quadrant 0; scale 1,
zero translate makes every tap integer -> exact center-pad).

TPU mapping: the warp is separable (no rotation), so instead of per-pixel
gathers (measured ~147 ms/image on the TPU — gathers of per-pixel indices
bypass the MXU entirely) each tile's resample is two bilinear
weight-matrix matmuls: out = sum_t A_t @ tile_t @ B_t^T + 114 * (1 -
sum_t u_t (x) v_t), where A_t[o, i] = tri(y_src(o) - (padh_t + i)) masked
to the tile's valid/in-canvas rows, tri(d) = max(0, 1 - |d|), u_t/v_t are
the weight row-sums, and the paste rectangles are pairwise disjoint so
the per-tile weight masses add. This reproduces the gather taps exactly
(incl. cross-seam taps and the 114 border as the uncovered weight mass)
but runs on the MXU. MixUp is the same two-matmul resample of slot 4 with
edge-clamped source coordinates (coordinate clamp == cv2 border
replicate).

Intentional deviations from the host path (all distribution-level, none
affecting label math): the reference's second ~1.0x rescale of
already-resized mosaic tiles (scale = min(S/h, S/w) of a tile whose long
side is already S, off by <0.2% from int truncation) is folded to exactly
1; the p=0.01 pixel augs (blur/median/gray/CLAHE) are host-only and not
applied in device mode; HSV/bilinear use float arithmetic instead of
OpenCV's uint8 LUTs / 5-bit fixed-point taps (<=1-2 LSB differences).
For PLAIN (non-mosaic) samples two more, both self-consistent with the
labels: HSV runs on the padded frame, so the 114 border picks up the
value gain (the host pads after HSV; mosaic samples match the host, whose
post-affine frame already contains gray when HSV hits it), and flips run
after the centered pad, shifting content+labels together by 1 px when the
pad is odd (host flips the unpadded image).

Buffer contract (see the planner): tile slots are only read inside their
valid (h, w) region except slot 4 (mixup), whose full (H, W) extent is
sampled with edge-clamp — the loader fills slot 4's margin with 114 to
reproduce the reference's gray letterbox canvas (mosiac_dataset.py:177-254
cp_img = np.full(..., 114)); the zero pad OUTSIDE the jit-resized canvas
is the warp's ok-mask. Other slots may hold stale bytes.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp

PAD_VALUE = 114.0

# params row layout (float32); one row per sample
P_XC = 0         # mosaic center x (int-valued; 2W => "all quadrant 0")
P_YC = 1         # mosaic center y
P_SCALE = 2      # affine scale about the origin
P_TX = 3         # affine translate x (pixels)
P_TY = 4         # affine translate y
P_FLIP_LR = 5    # 0/1
P_FLIP_UD = 6    # 0/1
P_HSV_H = 7      # hue gain r0 (all three 1 => skip, bit-exact passthrough)
P_HSV_S = 8      # sat gain r1
P_HSV_V = 9      # val gain r2
P_MIX_W = 10     # mixup blend weight (0 = off; reference uses 0.5)
P_MIX_JIT = 11   # mixup jit scale
P_MIX_XOFF = 12  # mixup crop offset x (int-valued)
P_MIX_YOFF = 13  # mixup crop offset y
P_MIX_FLIP = 14  # mixup lr flip 0/1
P_MIX_OW = 15    # mixup resized width  = host's int(W*jit) (shipped, not
P_MIX_OH = 16    # mixup resized height   re-derived: floor(f32(W*jit)) can
#                  land one past/short of the float64 host value right at
#                  integer crossings, shifting the flip axis and crop mask
#                  1 px off the labels)
N_PARAMS = 17

N_TILES = 5      # 4 mosaic quadrants + 1 mixup source


def _tri(d):
    """Bilinear hat weight: nonzero exactly for the floor/ceil taps."""
    return jnp.maximum(0.0, 1.0 - jnp.abs(d))


def _hsv_jitter(img, r0, r1, r2):
    """cv2/ultralytics HSV gain jitter in float (augmentations.py:88-99):
    hue scaled mod 180 (cv2's uint8 hue scale), sat/val scaled+clipped.
    img (B,H,W,3) f32 in [0,255]; r* (B,) gains."""
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    v = jnp.maximum(jnp.maximum(r, g), b)
    c = v - jnp.minimum(jnp.minimum(r, g), b)
    safe_c = jnp.where(c > 0, c, 1.0)
    # cv2 precedence: v==r first, then v==g, else b
    h = jnp.where(
        (v == r) & (c > 0), 60.0 * (g - b) / safe_c,
        jnp.where(
            (v == g) & (c > 0), 60.0 * (b - r) / safe_c + 120.0,
            jnp.where(c > 0, 60.0 * (r - g) / safe_c + 240.0, 0.0),
        ),
    )
    h = jnp.mod(h, 360.0) * 0.5  # cv2 uint8 hue scale [0, 180)
    h2 = jnp.mod(h * r0[:, None, None], 180.0) * 2.0
    s2 = jnp.clip(255.0 * c / jnp.where(v > 0, v, 1.0) * r1[:, None, None],
                  0.0, 255.0) / 255.0
    v2 = jnp.clip(v * r2[:, None, None], 0.0, 255.0)
    hi = jnp.floor(h2 / 60.0).astype(jnp.int32) % 6
    f = h2 / 60.0 - jnp.floor(h2 / 60.0)
    p = v2 * (1.0 - s2)
    q = v2 * (1.0 - f * s2)
    t = v2 * (1.0 - (1.0 - f) * s2)
    # sector table: 0:(v,t,p) 1:(q,v,p) 2:(p,v,t) 3:(p,q,v) 4:(t,p,v)
    # 5:(v,p,q) — sector 5 is the select default
    r_ = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4],
                    [v2, q, p, p, t], v2)
    g_ = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4],
                    [t, v2, v2, q, p], p)
    b_ = jnp.select([hi == 0, hi == 1, hi == 2, hi == 3, hi == 4],
                    [p, p, t, v2, v2], q)
    return jnp.stack([r_, g_, b_], axis=-1)


def warp_augment(tiles, tile_hw, params, dtype=jnp.float32):
    """The device augmentation program.

    tiles (B, N_TILES, H, W, 3) uint8; tile_hw (B, N_TILES, 2) int32
    [h, w] valid extents; params (B, N_PARAMS) float32 (layout above).
    Returns (B, H, W, 3) `dtype` in [0, 1] — feed the model directly
    (normalized-float contract of models/layers.ConvBnAct).

    dtype is the resample-matmul input dtype: bf16 halves the einsum HBM
    traffic and runs the MXU at full rate (accumulation stays fp32 via
    preferred_element_type) at the cost of weight rounding ~2^-9 — a
    distribution-level deviation fine for training augmentation. Tests pin
    semantics on the exact f32 path; the train step passes the model's
    compute dtype.
    """
    B, _, H, W, _ = tiles.shape
    p = params.astype(jnp.float32)

    xc1 = p[:, P_XC]  # int-valued floats
    yc1 = p[:, P_YC]
    th4 = tile_hw[:, :4, 0].astype(jnp.float32)
    tw4 = tile_hw[:, :4, 1].astype(jnp.float32)
    # paste offsets per quadrant (canvas coord - tile coord); the
    # reference's get_mosaic_coordinate collapses to exactly these
    padw = jnp.stack(
        [xc1 - tw4[:, 0], xc1, xc1 - tw4[:, 2], xc1], axis=1)  # (B, 4)
    padh = jnp.stack(
        [yc1 - th4[:, 0], yc1 - th4[:, 1], yc1, yc1], axis=1)

    s = p[:, P_SCALE]
    xo = jnp.arange(W, dtype=jnp.float32)
    yo = jnp.arange(H, dtype=jnp.float32)
    x_src = (xo[None, :] - p[:, P_TX, None]) / s[:, None]  # (B, W)
    y_src = (yo[None, :] - p[:, P_TY, None]) / s[:, None]  # (B, H)

    ii = jnp.arange(H, dtype=jnp.float32)  # tile row index
    jj = jnp.arange(W, dtype=jnp.float32)  # tile col index
    # A[b,t,o,i]: bilinear weight of tile t's row i for output row o,
    # masked to in-canvas and valid-extent rows (= the gather's ok mask)
    ypos = padh[:, :, None] + ii[None, None, :]                   # (B,4,H)
    yvalid = (
        (ypos >= 0) & (ypos < 2 * H)
        & (ii[None, None, :] < th4[:, :, None])
    )
    A = (
        _tri(y_src[:, None, :, None] - ypos[:, :, None, :])
        * yvalid[:, :, None, :]
    )                                                             # (B,4,H,H)
    xpos = padw[:, :, None] + jj[None, None, :]
    xvalid = (
        (xpos >= 0) & (xpos < 2 * W)
        & (jj[None, None, :] < tw4[:, :, None])
    )
    Bw = (
        _tri(x_src[:, None, :, None] - xpos[:, :, None, :])
        * xvalid[:, :, None, :]
    )                                                             # (B,4,W,W)

    t4 = tiles[:, :4].astype(dtype)
    # paste rectangles are pairwise disjoint -> per-tile contributions and
    # weight masses add; uncovered weight mass is the 114 border/background
    tmp = jnp.einsum(
        "btoi,btijc->btojc", A.astype(dtype), t4, precision="highest",
        preferred_element_type=dtype,
    )
    mos = jnp.einsum(
        "btojc,btpj->bopc", tmp, Bw.astype(dtype), precision="highest",
        preferred_element_type=dtype,
    )
    cov = jnp.einsum("bto,btp->bop", A.sum(-1), Bw.sum(-1))
    # post-matmul pipeline stays in dtype end-to-end (every elementwise
    # pass below reads/writes (B,H,W,3) — at bf16 half the HBM traffic)
    out = mos + (PAD_VALUE * (1.0 - cov)[..., None]).astype(dtype)

    # ---- mixup (reference mosiac_dataset.py:177-254); weight 0 per
    # sample disables (XLA still computes it — one extra resample). A
    # 4-slot tiles buffer (loader with enable_mixup=False) statically
    # skips the resample and ships 20% fewer bytes. ----------------------
    if tiles.shape[1] > 4:
        out = _apply_mixup(out, tiles, p, xo, yo, ii, jj, H, W, dtype)

    # ---- HSV (exact passthrough when all gains are 1; internal math in
    # f32 — register-resident, fused, so no extra memory traffic) ---------
    r0, r1, r2 = p[:, P_HSV_H], p[:, P_HSV_S], p[:, P_HSV_V]
    do_hsv = ((r0 != 1.0) | (r1 != 1.0) | (r2 != 1.0))[:, None, None, None]
    hsv = _hsv_jitter(out.astype(jnp.float32), r0, r1, r2).astype(dtype)
    out = jnp.where(do_hsv, hsv, out)

    # ---- flips ----------------------------------------------------------
    out = jnp.where(p[:, P_FLIP_LR, None, None, None] > 0.5,
                    out[:, :, ::-1, :], out)
    out = jnp.where(p[:, P_FLIP_UD, None, None, None] > 0.5,
                    out[:, ::-1, :, :], out)

    return out * dtype(1.0 / 255.0)


def _apply_mixup(out, tiles, p, xo, yo, ii, jj, H, W, dtype):
    # int(W*jit)/int(H*jit), computed by the planner in float64 and shipped
    # (see P_MIX_OW) so device geometry matches the host label math exactly
    ow = jnp.maximum(p[:, P_MIX_OW], 1.0)
    oh = jnp.maximum(p[:, P_MIX_OH], 1.0)
    xr = xo[None, :] + p[:, P_MIX_XOFF, None]  # (B, W)
    yr = yo[None, :] + p[:, P_MIX_YOFF, None]  # (B, H)
    flip = p[:, P_MIX_FLIP, None] > 0.5
    xf = jnp.where(flip, (ow[:, None] - 1.0) - xr, xr)
    # cv2.resize half-pixel convention, with the ACTUAL dst/src ratio
    # (ow = int(W*jit) truncates, so the effective scale is ow/W, not jit);
    # clamping the source coordinate into range == cv2's border replicate
    xs = (xf + 0.5) * (W / ow[:, None]) - 0.5
    ys = (yr + 0.5) * (H / oh[:, None]) - 0.5
    Am = _tri(
        jnp.clip(ys, 0.0, H - 1.0)[:, :, None] - ii[None, None, :]
    )                                                             # (B,H,H)
    Bm = _tri(
        jnp.clip(xs, 0.0, W - 1.0)[:, :, None] - jj[None, None, :]
    )                                                             # (B,W,W)
    mtmp = jnp.einsum(
        "boi,bijc->bojc", Am.astype(dtype), tiles[:, 4].astype(dtype),
        precision="highest", preferred_element_type=dtype,
    )
    mix = jnp.einsum(
        "bojc,bpj->bopc", mtmp, Bm.astype(dtype), precision="highest",
        preferred_element_type=dtype,
    )
    # beyond the resized extent the reference's zero pad shows through
    ok = ((xr >= 0) & (xr < ow[:, None]))[:, None, :] \
        & ((yr >= 0) & (yr < oh[:, None]))[:, :, None]
    mix = jnp.where(ok[..., None], mix, dtype(0.0))
    mixw = p[:, P_MIX_W][:, None, None, None].astype(dtype)
    return out * (dtype(1.0) - mixw) + mix * mixw


# ======================================================================
# Host-side planner
# ======================================================================


def _label_count(dataset, idx: int) -> int:
    """Number of raw labels WITHOUT decoding the image (the reference's
    mixup retry calls load_anno, which decodes; we consult the label
    cache/annotation table instead)."""
    labs = getattr(dataset, "labels", None)  # YOLODataset cache rows
    if labs is not None:
        rows = labs[idx]
        # cache rows are pre-filter [cls, cxn, cyn, wn, hn]; apply the
        # dataset's class filter so the mixup retry gate matches what
        # load_anno would return (COCODataset's table is already filtered)
        fc = getattr(dataset, "filter_classes", None)
        if fc and len(rows):
            return int(np.isin(rows[:, 0], fc).sum())
        return len(rows)
    items = getattr(dataset, "items", None)  # COCODataset table
    if items is not None:
        return len(items[idx]["labels"])
    return len(dataset.load_anno(idx))


class DeviceAugPlanner:
    """Host half of the device augmentation: RNG decisions + label math.

    plan(rng, idx) -> (tile_idxs, draws); after the loader batch-decodes
    every tile, finalize(draws, items) -> (params_row, tile_hw_row,
    labels, tile_imgs) with labels in the final SxS frame (abs xyxy+cls),
    identical arithmetic to the host pipeline (data/mosaic.py +
    data/augment.py) for the degrees=0/shear=0 regime.

    The per-sample RNG draw ORDER is fixed by this class (documented in
    plan/finalize) — it intentionally differs from the host pipeline's
    (this is a distinct augmentation mode; reproducibility is per-seed
    within the mode)."""

    def __init__(self, dataset, img_size=(640, 640), enable_mosaic=True,
                 enable_mixup=False, mosaic_prob=1.0, mixup_prob=1.0,
                 degrees=0.0, translate=0.1, mosaic_scale=(0.5, 1.5),
                 mixup_scale=(0.5, 1.5), shear=0.0, flip_lr_prob=0.5,
                 flip_ud_prob=0.0, hsv_prob=1.0,
                 hsv_gains=(0.015, 0.7, 0.4), no_aug=False):
        if degrees or shear:
            raise ValueError(
                "device augmentation supports degrees=0, shear=0 only "
                "(rotation/shear make the warp non-separable); use the "
                "host pipeline for rotated affines"
            )
        self.dataset = dataset
        # label counts are immutable per idx; memoize so datasets without a
        # labels/items table (wrappers, custom) pay load_anno's decode at
        # most ONCE per index instead of per mixup-retry probe
        self._label_counts: dict[int, int] = {}
        self.input_dim = (
            (img_size, img_size) if isinstance(img_size, int)
            else tuple(img_size)
        )
        self.enable_mosaic = enable_mosaic and not no_aug
        self.enable_mixup = enable_mixup and not no_aug
        self.mosaic_prob = mosaic_prob
        self.mixup_prob = mixup_prob
        self.translate = translate
        self.mosaic_scale = tuple(mosaic_scale)
        self.mixup_scale = tuple(mixup_scale)
        self.flip_lr_prob = 0.0 if no_aug else flip_lr_prob
        self.flip_ud_prob = 0.0 if no_aug else flip_ud_prob
        self.hsv_prob = 0.0 if no_aug else hsv_prob
        self.hsv_gains = tuple(hsv_gains)
        # mixup off -> 4-slot tile buffers (the warp statically skips the
        # slot-4 resample; 20% fewer H2D bytes)
        self.n_tiles = N_TILES if self.enable_mixup else 4

    # -- phase A: decisions that precede decode ---------------------------
    def plan(self, rng: np.random.Generator, idx: int):
        """Draw order: mosaic gate, (yc, xc, 3 extra indices), affine
        (scale, tx, ty), mixup gate + retry indices + (jit, flip).
        Returns (tile_idxs to decode, draws dict)."""
        H, W = self.input_dim
        draws: dict = {"idx": idx}
        mosaic = (
            self.enable_mosaic and rng.random() < self.mosaic_prob
        )
        draws["mosaic"] = mosaic
        if mosaic:
            draws["yc"] = int(rng.uniform(0.5 * H, 1.5 * H))
            draws["xc"] = int(rng.uniform(0.5 * W, 1.5 * W))
            tile_idxs = [idx] + [
                int(rng.integers(0, len(self.dataset))) for _ in range(3)
            ]
            draws["scale"] = float(rng.uniform(*self.mosaic_scale))
            draws["tx"] = float(rng.uniform(-self.translate, self.translate) * W)
            draws["ty"] = float(rng.uniform(-self.translate, self.translate) * H)
            if self.enable_mixup and rng.random() < self.mixup_prob:
                # reference retries up to 30x for a labeled sample
                # (mosiac_dataset.py:158-162); label counts come from the
                # cache, no decode
                cp = -1
                for _ in range(30):
                    cand = int(rng.integers(0, len(self.dataset)))
                    n = self._label_counts.get(cand)
                    if n is None:
                        n = self._label_counts[cand] = _label_count(
                            self.dataset, cand
                        )
                    if n:
                        cp = cand
                        break
                if cp >= 0:
                    draws["mix_idx"] = cp
                    draws["mix_jit"] = float(rng.uniform(*self.mixup_scale))
                    draws["mix_flip"] = bool(rng.random() > 0.5)
                    tile_idxs = tile_idxs + [cp]
        else:
            tile_idxs = [idx]
        # color/flip draws are position-independent; draw now so the
        # stream is identical whether or not decode reorders work
        if rng.random() < self.hsv_prob:
            g = self.hsv_gains
            draws["hsv"] = tuple(
                float(v) for v in rng.uniform(-1, 1, 3) * g + 1
            )
        else:
            draws["hsv"] = (1.0, 1.0, 1.0)
        draws["flip_lr"] = rng.random() < self.flip_lr_prob
        draws["flip_ud"] = rng.random() < self.flip_ud_prob
        draws["_rng"] = rng  # mixup crop offsets need post-decode draws
        return tile_idxs, draws

    # -- phase C: geometry + labels once tiles are decoded ----------------
    def finalize(self, draws: dict, items):
        """items: list of (img, labels_resized_xyxy, hw0, id) matching the
        tile_idxs from plan(). Returns (params (N_PARAMS,) f32, tile_hw
        (N_TILES, 2) i32, labels (n, 5) abs xyxy+cls in the final frame,
        tile_imgs list aligned to slots)."""
        H, W = self.input_dim
        params = np.zeros(N_PARAMS, np.float32)
        tile_hw = np.zeros((self.n_tiles, 2), np.int32)
        params[P_SCALE] = 1.0
        params[P_MIX_JIT] = 1.0
        params[P_MIX_OW], params[P_MIX_OH] = W, H
        tile_imgs: list = [None] * self.n_tiles

        if draws["mosaic"]:
            xc, yc = draws["xc"], draws["yc"]
            s = draws["scale"]
            tx, ty = draws["tx"], draws["ty"]
            params[P_XC], params[P_YC] = xc, yc
            params[P_SCALE], params[P_TX], params[P_TY] = s, tx, ty
            all_labels = []
            for t in range(4):
                img, lab, _, _ = items[t]
                h, w = img.shape[:2]
                tile_imgs[t] = img
                tile_hw[t] = (h, w)
                padw = (xc - w) if t in (0, 2) else xc
                padh = (yc - h) if t in (0, 1) else yc
                if len(lab):
                    l2 = lab.copy()
                    l2[:, [0, 2]] += padw
                    l2[:, [1, 3]] += padh
                    all_labels.append(l2)
            if all_labels:
                labels = np.concatenate(all_labels, 0)
                labels[:, 0] = labels[:, 0].clip(0, 2 * W)
                labels[:, 1] = labels[:, 1].clip(0, 2 * H)
                labels[:, 2] = labels[:, 2].clip(0, 2 * W)
                labels[:, 3] = labels[:, 3].clip(0, 2 * H)
                # scale+translate affine on corners (no rotation) + clip
                # (augment.py apply_affine_to_bboxes for diagonal M)
                labels[:, [0, 2]] = (labels[:, [0, 2]] * s + tx).clip(0, W)
                labels[:, [1, 3]] = (labels[:, [1, 3]] * s + ty).clip(0, H)
                wh = labels[:, 2:4] - labels[:, 0:2]
                labels = labels[(wh > 1.0).all(1)]
            else:
                labels = np.zeros((0, 5), np.float32)

            if "mix_idx" in draws and len(labels):
                labels = self._finalize_mixup(
                    draws, items[4], labels, params, tile_hw, tile_imgs
                )
            else:
                params[P_MIX_W] = 0.0
        else:
            img, lab, _, _ = items[0]
            h, w = img.shape[:2]
            tile_imgs[0] = img
            tile_hw[0] = (h, w)
            left, top = (W - w) // 2, (H - h) // 2
            # degenerate params: xc=2W, yc=2H puts every in-bounds tap in
            # quadrant 0 whose paste offset is xc - w = 2W - w; folding
            # the centered pad (augment.py pad_to) into the integer
            # translate makes every tap exact: out(x,y) = tile0(x-left,
            # y-top), gray 114 elsewhere.
            params[P_XC], params[P_YC] = 2 * W, 2 * H
            params[P_SCALE] = 1.0
            params[P_TX] = left - (2 * W - w)
            params[P_TY] = top - (2 * H - h)
            labels = lab.copy() if len(lab) else np.zeros((0, 5), np.float32)
            if len(labels):
                labels[:, [0, 2]] += left
                labels[:, [1, 3]] += top

        # flips last (augment.py flip_lr/flip_ud on the final frame)
        if draws["flip_lr"] and len(labels):
            x1 = labels[:, 0].copy()
            labels[:, 0] = W - labels[:, 2]
            labels[:, 2] = W - x1
        if draws["flip_ud"] and len(labels):
            y1 = labels[:, 1].copy()
            labels[:, 1] = H - labels[:, 3]
            labels[:, 3] = H - y1
        params[P_FLIP_LR] = float(draws["flip_lr"])
        params[P_FLIP_UD] = float(draws["flip_ud"])
        params[P_HSV_H], params[P_HSV_S], params[P_HSV_V] = draws["hsv"]
        return params, tile_hw, labels, tile_imgs

    def _finalize_mixup(self, draws, cp_item, labels, params, tile_hw,
                        tile_imgs):
        """Mixup geometry + labels (reference mosiac_dataset.py:177-254
        with the ~1.0x re-resize folded to exactly 1). Post-decode draw
        order: y_off, x_off."""
        H, W = self.input_dim
        rng = draws["_rng"]
        img, cp_lab, _, _ = cp_item
        h, w = img.shape[:2]
        tile_imgs[4] = img
        tile_hw[4] = (h, w)
        jit = draws["mix_jit"]
        flip = draws["mix_flip"]
        ow, oh = int(W * jit), int(H * jit)
        y_off = int(rng.integers(0, oh - H)) if oh > H else 0
        x_off = int(rng.integers(0, ow - W)) if ow > W else 0
        params[P_MIX_W] = 0.5
        params[P_MIX_JIT] = jit
        params[P_MIX_OW], params[P_MIX_OH] = ow, oh
        params[P_MIX_FLIP] = float(flip)
        params[P_MIX_XOFF] = x_off
        params[P_MIX_YOFF] = y_off

        boxes = cp_lab[:, :4] * jit
        boxes[:, 0::2] = boxes[:, 0::2].clip(0, ow)
        boxes[:, 1::2] = boxes[:, 1::2].clip(0, oh)
        if flip:
            boxes[:, 0::2] = ow - boxes[:, 0::2][:, ::-1]
        boxes[:, 0::2] = (boxes[:, 0::2] - x_off).clip(0, W)
        boxes[:, 1::2] = (boxes[:, 1::2] - y_off).clip(0, H)
        mix_labels = np.concatenate([boxes, cp_lab[:, 4:5]], axis=1)
        wh = mix_labels[:, 2:4] - mix_labels[:, 0:2]
        mix_labels = mix_labels[(wh > 1.0).all(1)]
        return np.concatenate([labels, mix_labels], axis=0)
