"""The full native detector-training recipe: augmentation → schedule → EMA →
validation → checkpointing.

The reference delegates all of this to the ultralytics trainer; its settings
file is the spec here (/root/reference/yolo/yolo_train_config.yaml): epochs
100, patience (:9-11), batch 72, imgsz 384 (:12-13), AdamW (:24), val during
training with NMS iou 0.7 (:45-50), lr0/lrf 0.01 (:93-94), weight_decay 5e-4
(:96), 3 warmup epochs (:97), box/cls/dfl gains 7.5/0.5/1.5 (:100-102), HSV
jitter (:107-109), translate 0.1 / scale 0.2 (:111-112), flipud 0.3 / fliplr
0.5 (:115-116), mosaic 0.4 with close_mosaic 10 (:117, :30).

Everything here is re-designed for the TPU rather than ported:

* the whole train epoch is ONE compiled ``lax.scan`` over batches — data sits
  on device, the permutation is an argument, and augmentation runs inside the
  step (no host round trips, no retraces across epochs);
* spatial augmentation (scale, translate, flips) composes into per-image
  axis-separable bilinear resamples (two ``take_along_axis`` gathers + lerp
  per axis, static shapes). Out-of-range taps blend toward the ultralytics
  border constant 114. (The earlier interpolation-matrix/einsum form was
  measured slower on device — XLA tiled the thin-channel matmuls T(1,128)
  and loop-chunked them; see the round-5 trace notes in _axis_resample);
* mosaic is a fixed 2×2 grid of half-size resizes (static shapes) — the
  random placement ultralytics gets from its random mosaic *center* is
  recovered by the random affine that follows, which jitters scale and
  translation anyway;
* HSV jitter degenerates for the grayscale worm imagery: hsv_v maps to a
  brightness gain and hsv_s to a contrast gain about the image mean (hue is
  meaningless on replicated-channel gray frames);
* EMA of the parameters (decay ramping as ultralytics' ModelEMA) is carried
  through the scan and used for validation/checkpoints;
* validation decodes every anchor and runs the general TPU NMS
  (:mod:`wtracker_tpu.ops.nms`), then computes single-class AP@0.5 —
  the quality number the lifecycle gates on.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wtracker_tpu.models.yolov8 import YoloV8, decode_predictions
from wtracker_tpu.neural.yolo_training import detection_loss
from wtracker_tpu.ops.image import resize_bilinear
from wtracker_tpu.ops.nms import batched_nms

BORDER = 114.0 / 255.0  # ultralytics letterbox/affine fill, normalized


# ---------------------------------------------------------------------------
# configuration
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class AugmentConfig:
    """Augmentation strengths (defaults = the reference's training yaml)."""

    mosaic: float = 0.4
    fliplr: float = 0.5
    flipud: float = 0.3
    translate: float = 0.1  # fraction of image size
    scale: float = 0.2  # gain: s ~ U[1-scale, 1+scale]
    brightness: float = 0.4  # hsv_v equivalent for grayscale
    contrast: float = 0.3  # hsv_s equivalent for grayscale
    min_box_px: float = 2.0  # boxes shrinking below this are dropped

    @property
    def identity(self) -> bool:
        return (
            self.mosaic == 0
            and self.fliplr == 0
            and self.flipud == 0
            and self.translate == 0
            and self.scale == 0
            and self.brightness == 0
            and self.contrast == 0
        )


@dataclass(frozen=True)
class RecipeConfig:
    """Full training-run settings (defaults = the reference recipe)."""

    epochs: int = 100
    batch: int = 72
    lr0: float = 1e-3  # AdamW peak LR (yaml lr0 is the SGD value; its own
    # comment prescribes 1e-3 for Adam-family optimizers)
    lrf: float = 0.01  # final LR = lr0 * lrf (cosine decay)
    weight_decay: float = 5e-4
    warmup_epochs: float = 3.0
    patience: int = 100  # early-stop epochs without val improvement
    close_mosaic: int = 10  # disable mosaic for the last N epochs
    ema_decay: float = 0.9999
    ema_tau: float = 2000.0  # ramp: decay * (1 - exp(-step / tau))
    val_fraction: float = 0.2  # split when no explicit val set is given
    val_iou: float = 0.7  # NMS IoU threshold during validation
    val_conf: float = 0.001  # validation score floor
    val_max_det: int = 32
    ckpt_every: int = 1
    """Write last/train-state checkpoints every N epochs (and always at the
    final epoch). Full-state checkpointing fetches ~300 MB from device per
    write — at ~4 s of compiled epoch, a per-epoch write dominates wall time
    (measured 82 s/epoch on the round-5 s/416 run); a kill mid-window costs
    at most N-1 epochs of replay on resume."""
    augment: AugmentConfig = field(default_factory=AugmentConfig)
    seed: int = 0


# ---------------------------------------------------------------------------
# dataset loading (YOLO txt-label format)
# ---------------------------------------------------------------------------


def load_yolo_dataset(images_dir: str, labels_dir: str, imgsz: int, max_gt: int = 4,
                      gray_uint8: bool = False):
    """Load a YOLO-format dataset (images + ``class cx cy w h`` label files)
    into padded arrays: (N,s,s,3) f32 images in [0,1], (N,G,4) xyxy gt boxes
    in pixels, (N,G) classes, (N,G) validity.

    ``gray_uint8=True`` returns images as (N,s,s) uint8 instead — 12x less
    memory, the right form for deployment-scale sets (1800 images @ 416 are
    3.7 GB as (N,s,s,3) f32 but 311 MB compact).  The training step converts
    per batch on device (broadcast to 3 channels + /255 in f32); XLA lowers
    the /255 as a reciprocal multiply, so values agree with the f32 pipeline
    to 1 input ulp (not bit-exact — tests/test_yolo_recipe.py pins the
    equivalence tolerance).

    Non-square sources are LETTERBOXED to ``imgsz`` (aspect-preserving resize
    + centered 114 padding) with the matching label transform — the same
    geometry the inference path applies (:func:`wtracker_tpu.ops.image.
    letterbox`), so training never sees an aspect distortion serving won't
    (ultralytics letterboxes its train loader too,
    /root/reference/yolo/yolo_train_config.yaml:13). Label files with more
    than ``max_gt`` boxes are truncated with a warning — one crowded frame
    must not kill a multi-hour run.
    """
    import warnings

    import cv2 as cv

    names = sorted(f for f in os.listdir(images_dir) if f.lower().endswith((".png", ".jpg", ".bmp")))
    images, gts, clss, masks = [], [], [], []
    for name in names:
        img = cv.imread(os.path.join(images_dir, name), cv.IMREAD_GRAYSCALE)
        sh, sw = img.shape[:2]
        # ops/image.letterbox geometry: min-ratio scale, round, center pad
        scale = min(imgsz / sh, imgsz / sw)
        new_h, new_w = round(sh * scale), round(sw * scale)
        pad_top = (imgsz - new_h) // 2
        pad_left = (imgsz - new_w) // 2
        if (new_h, new_w) != (sh, sw):
            img = cv.resize(img, (new_w, new_h))
        canvas = np.full((imgsz, imgsz), 114, np.uint8)
        canvas[pad_top : pad_top + new_h, pad_left : pad_left + new_w] = img
        images.append(
            canvas if gray_uint8 else np.repeat(canvas[..., None], 3, axis=-1).astype(np.float32) / 255.0
        )

        label_path = os.path.join(labels_dir, os.path.splitext(name)[0] + ".txt")
        gt = np.zeros((max_gt, 4), np.float32)
        cls = np.zeros((max_gt,), np.int32)
        mask = np.zeros((max_gt,), bool)
        if os.path.exists(label_path):
            rows = [ln for ln in open(label_path).read().splitlines() if ln.strip()]
            if len(rows) > max_gt:
                warnings.warn(
                    f"{label_path}: {len(rows)} boxes exceed max_gt={max_gt}; "
                    f"keeping the first {max_gt}",
                    stacklevel=2,
                )
                rows = rows[:max_gt]
            for j, line in enumerate(rows):
                c, cx, cy, bw, bh = (float(v) for v in line.split())
                # normalized source coords → letterboxed pixels
                gt[j] = (
                    (cx - bw / 2) * sw * scale + pad_left,
                    (cy - bh / 2) * sh * scale + pad_top,
                    (cx + bw / 2) * sw * scale + pad_left,
                    (cy + bh / 2) * sh * scale + pad_top,
                )
                cls[j] = int(c)
                mask[j] = True
        gts.append(gt)
        clss.append(cls)
        masks.append(mask)
    return np.stack(images), np.stack(gts), np.stack(clss), np.stack(masks)


# ---------------------------------------------------------------------------
# on-device augmentation
# ---------------------------------------------------------------------------


def _axis_resample(images: jnp.ndarray, src: jnp.ndarray, axis: int):
    """Bilinear resample along one spatial axis; returns (out, weight_sum).

    ``src`` is (B, n_out) fractional source coordinates for each output index
    along ``axis``. The two bilinear taps are gathered with
    ``take_along_axis``; taps falling outside the axis lose their weight, and
    ``weight_sum`` (B, n_out) is what remains so the caller can blend the
    missing mass toward the border constant. Numerically this is the dense
    interpolation-matrix form (triangle-weight ``R @ img``) — but as two
    gathers it costs O(B·H·W) memory traffic, where the batched-matmul form
    got tiled T(1,128)/loop-chunked by XLA and dominated the s/416 train step
    (round-5 device trace: 359 → 270 → ~170 ms/step across these rewrites).
    """
    n = images.shape[axis]
    i0f = jnp.floor(src)
    f = src - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    w0 = jnp.where((i0 >= 0) & (i0 < n), 1.0 - f, 0.0)
    w1 = jnp.where((i1 >= 0) & (i1 < n), f, 0.0)
    shape = [1] * images.ndim
    shape[0], shape[axis] = src.shape[0], src.shape[1]
    g0 = jnp.take_along_axis(images, jnp.clip(i0, 0, n - 1).reshape(shape), axis=axis)
    g1 = jnp.take_along_axis(images, jnp.clip(i1, 0, n - 1).reshape(shape), axis=axis)
    out = w0.reshape(shape) * g0 + w1.reshape(shape) * g1
    return out, w0 + w1


def _sample_affine(rng, B: int, hw: tuple[int, int], cfg: AugmentConfig):
    """Per-image spatial-augment parameters: scale, translation, flips."""
    h, w = hw
    ks, kt, kfx, kfy = jax.random.split(rng, 4)
    s = 1.0 + cfg.scale * jax.random.uniform(ks, (B,), minval=-1.0, maxval=1.0)
    t = jax.random.uniform(kt, (B, 2), minval=-cfg.translate, maxval=cfg.translate)
    tx, ty = t[:, 0] * w, t[:, 1] * h
    flip_x = jax.random.uniform(kfx, (B,)) < cfg.fliplr
    flip_y = jax.random.uniform(kfy, (B,)) < cfg.flipud
    return s, tx, ty, flip_x, flip_y


def spatial_augment(
    rng: jax.Array,
    images: jnp.ndarray,
    gt: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: AugmentConfig,
):
    """Random centered scale + translate + flips on a (B, H, W, C) batch.

    The warp is axis-aligned, so it separates into a row resample and a
    column resample per image (:func:`_axis_resample`), with flips folded
    into the sampling coordinates. Out-of-range taps blend toward the
    ultralytics border constant; sequential per-axis fill composes to the
    joint ``1 − wy·wx`` border weight exactly. Boxes go through the matching
    forward affine and are clipped; boxes collapsing under ``min_box_px``
    are masked.
    """
    B, H, W = images.shape[:3]
    s, tx, ty, flip_x, flip_y = _sample_affine(rng, B, (H, W), cfg)

    # inverse map (output pixel → source coordinate), flips composed in
    cy, cx = (H - 1) / 2.0, (W - 1) / 2.0
    ys = jnp.arange(H, dtype=jnp.float32)[None, :]  # (1, H)
    xs = jnp.arange(W, dtype=jnp.float32)[None, :]
    ys = jnp.where(flip_y[:, None], (H - 1) - ys, ys)
    xs = jnp.where(flip_x[:, None], (W - 1) - xs, xs)
    src_y = (ys - cy - ty[:, None]) / s[:, None] + cy  # (B, H)
    src_x = (xs - cx - tx[:, None]) / s[:, None] + cx  # (B, W)

    out, wy = _axis_resample(images, src_y, axis=1)
    out = out + (1.0 - wy).reshape(B, H, *([1] * (images.ndim - 2))) * BORDER
    out, wx = _axis_resample(out, src_x, axis=2)
    out = out + (1.0 - wx).reshape(B, 1, W, *([1] * (images.ndim - 3))) * BORDER

    # forward affine on the box corners (then flip, then clip)
    def fwd(pts_x, pts_y):
        fx = (pts_x - cx) * s[:, None] + cx + tx[:, None]
        fy = (pts_y - cy) * s[:, None] + cy + ty[:, None]
        fx = jnp.where(flip_x[:, None], (W - 1) - fx, fx)
        fy = jnp.where(flip_y[:, None], (H - 1) - fy, fy)
        return fx, fy

    x0, y0 = fwd(gt[..., 0], gt[..., 1])
    x1, y1 = fwd(gt[..., 2], gt[..., 3])
    gx0, gx1 = jnp.minimum(x0, x1), jnp.maximum(x0, x1)  # flips swap corners
    gy0, gy1 = jnp.minimum(y0, y1), jnp.maximum(y0, y1)
    gx0, gx1 = jnp.clip(gx0, 0, W), jnp.clip(gx1, 0, W)
    gy0, gy1 = jnp.clip(gy0, 0, H), jnp.clip(gy1, 0, H)
    new_gt = jnp.stack([gx0, gy0, gx1, gy1], axis=-1)
    alive = (gx1 - gx0 >= cfg.min_box_px) & (gy1 - gy0 >= cfg.min_box_px)
    return out, new_gt, mask & alive


def mosaic_augment(
    rng: jax.Array,
    images: jnp.ndarray,
    gt: jnp.ndarray,
    cls: jnp.ndarray,
    mask: jnp.ndarray,
    p: float,
):
    """Fixed-grid 2×2 mosaic with probability ``p`` per image.

    Output gt capacity grows to 4·G (mosaic merges four images' boxes).
    Random mosaic-center placement is delegated to the affine jitter that
    runs after this — the composition spans the same distribution with fully
    static shapes.
    """
    B, H, W, C = images.shape
    G = gt.shape[1]
    k_pick, k_apply = jax.random.split(rng)
    partners = jax.random.randint(k_pick, (B, 3), 0, B)
    use = jax.random.uniform(k_apply, (B,)) < p

    half = resize_bilinear(images, (H // 2, W // 2)).astype(images.dtype)  # (B, H/2, W/2, C)
    quads = [half, half[partners[:, 0]], half[partners[:, 1]], half[partners[:, 2]]]
    top = jnp.concatenate([quads[0], quads[1]], axis=2)
    bottom = jnp.concatenate([quads[2], quads[3]], axis=2)
    tiled = jnp.concatenate([top, bottom], axis=1)  # (B, H, W, C)

    offs = jnp.asarray([[0.0, 0.0], [W / 2, 0.0], [0.0, H / 2], [W / 2, H / 2]], jnp.float32)
    src_idx = jnp.concatenate([jnp.arange(B)[:, None], partners], axis=1)  # (B, 4)
    gt_q = gt[src_idx] * 0.5 + jnp.tile(offs[None, :, None, :], (1, 1, 1, 2))  # (B, 4, G, 4)
    cls_q = cls[src_idx]
    mask_q = mask[src_idx]

    mosaic_gt = gt_q.reshape(B, 4 * G, 4)
    mosaic_cls = cls_q.reshape(B, 4 * G)
    mosaic_mask = mask_q.reshape(B, 4 * G)

    plain_gt = jnp.concatenate([gt, jnp.zeros((B, 3 * G, 4), gt.dtype)], axis=1)
    plain_cls = jnp.concatenate([cls, jnp.zeros((B, 3 * G), cls.dtype)], axis=1)
    plain_mask = jnp.concatenate([mask, jnp.zeros((B, 3 * G), bool)], axis=1)

    images = jnp.where(use[:, None, None, None], tiled, images)
    gt = jnp.where(use[:, None, None], mosaic_gt, plain_gt)
    cls = jnp.where(use[:, None], mosaic_cls, plain_cls)
    mask = jnp.where(use[:, None], mosaic_mask, plain_mask)
    return images, gt, cls, mask


def photometric_augment(rng: jax.Array, images: jnp.ndarray, cfg: AugmentConfig) -> jnp.ndarray:
    """Brightness/contrast jitter — the grayscale reduction of HSV jitter."""
    B = images.shape[0]
    kb, kc = jax.random.split(rng)
    bright = 1.0 + cfg.brightness * jax.random.uniform(kb, (B,), minval=-1.0, maxval=1.0)
    contr = 1.0 + cfg.contrast * jax.random.uniform(kc, (B,), minval=-1.0, maxval=1.0)
    mean = jnp.mean(images, axis=(1, 2, 3), keepdims=True)
    out = (images - mean) * contr[:, None, None, None] + mean * bright[:, None, None, None]
    return jnp.clip(out, 0.0, 1.0)


def augment_batch(
    rng: jax.Array,
    images: jnp.ndarray,
    gt: jnp.ndarray,
    cls: jnp.ndarray,
    mask: jnp.ndarray,
    cfg: AugmentConfig,
    mosaic_on: bool = True,
):
    """The full augmentation chain for one batch (jit-safe, static shapes).

    Returns (images, gt, cls, mask) with gt capacity 4·G when mosaic is
    configured (even while ``mosaic_on=False`` during close_mosaic epochs, so
    the train step keeps one compiled shape).
    """
    k_m, k_s, k_p = jax.random.split(rng, 3)
    if cfg.mosaic > 0:
        if mosaic_on:
            images, gt, cls, mask = mosaic_augment(k_m, images, gt, cls, mask, cfg.mosaic)
        else:
            # close_mosaic epochs: keep the 4·G gt capacity (the epoch fn is
            # compiled per mosaic_on flag, but downstream shapes must match)
            # without tracing the discarded tiling/gather work — XLA cannot
            # dead-code a p=0 jnp.where branch
            B, G = gt.shape[0], gt.shape[1]
            gt = jnp.concatenate([gt, jnp.zeros((B, 3 * G, 4), gt.dtype)], axis=1)
            cls = jnp.concatenate([cls, jnp.zeros((B, 3 * G), cls.dtype)], axis=1)
            mask = jnp.concatenate([mask, jnp.zeros((B, 3 * G), bool)], axis=1)
    images, gt, mask = spatial_augment(k_s, images, gt, mask, cfg)
    images = photometric_augment(k_p, images, cfg)
    return images, gt, cls, mask


# ---------------------------------------------------------------------------
# validation: decode → general NMS → single-class AP@0.5
# ---------------------------------------------------------------------------


_VAL_NMS_CACHE: dict = {}


def _val_nms_fn(model, imgsz, conf, iou, max_det):
    # cached by configuration — a fresh jit per validation call would pay a
    # full retrace+compile every epoch
    key = (repr(model), imgsz, conf, iou, max_det)
    if key not in _VAL_NMS_CACHE:

        @jax.jit
        def run(variables, imgs):
            box_logits, cls_logits = model.apply(variables, imgs, train=False)
            boxes, scores = decode_predictions(box_logits, cls_logits, imgsz, model.reg_max)
            top = jnp.max(scores, axis=-1)  # single-class / class-agnostic score
            return batched_nms(boxes, top, iou, conf, max_det)

        _VAL_NMS_CACHE[key] = run
    return _VAL_NMS_CACHE[key]


def _detections_for_map(model, variables, images, imgsz, conf, iou, max_det, chunk=64):
    """Device side of validation: decode all anchors, run the general NMS."""
    run = _val_nms_fn(model, imgsz, conf, iou, max_det)
    outs = []
    for s in range(0, images.shape[0], chunk):
        part = np.asarray(images[s : s + chunk])
        if part.dtype == np.uint8 and part.ndim == 3:  # compact gray storage
            part = np.repeat(part[..., None], 3, axis=-1).astype(np.float32) / 255.0
        outs.append(jax.tree.map(np.asarray, run(variables, jnp.asarray(part))))
    return [np.concatenate(parts, axis=0) for parts in zip(*outs)]


def average_precision_50(
    det_boxes: np.ndarray,
    det_scores: np.ndarray,
    det_valid: np.ndarray,
    gt: np.ndarray,
    gt_mask: np.ndarray,
    iou_thr: float = 0.5,
) -> float:
    """Single-class AP@``iou_thr`` over a validation set.

    Standard VOC-style continuous AP: detections sorted by score globally,
    each greedily matched to the best unmatched gt of its image, precision
    envelope integrated over recall.

    Vectorized: the (B, D, G) IoU tensor is one broadcast, and the greedy
    match runs as D argmax sweeps over the whole batch (matching is
    per-image independent, so per-image score order reproduces the global
    score order exactly). Cost is O(B·D·G) numpy work instead of the
    O(detections · G) python double loop — per-epoch validation stays
    negligible at thousand-image val sets.
    """
    det_boxes = np.asarray(det_boxes, np.float64)
    det_scores = np.asarray(det_scores, np.float64)
    det_valid = np.asarray(det_valid, bool)
    gt = np.asarray(gt, np.float64)
    gt_mask = np.asarray(gt_mask, bool)

    n_gt = int(gt_mask.sum())
    n_det = int(det_valid.sum())
    if n_det == 0 or n_gt == 0:
        return 0.0
    B, D = det_scores.shape
    G = gt.shape[1]

    # pairwise IoU (B, D, G); masked gts get -1 so they can never be chosen
    ix0 = np.maximum(det_boxes[:, :, None, 0], gt[:, None, :, 0])
    iy0 = np.maximum(det_boxes[:, :, None, 1], gt[:, None, :, 1])
    ix1 = np.minimum(det_boxes[:, :, None, 2], gt[:, None, :, 2])
    iy1 = np.minimum(det_boxes[:, :, None, 3], gt[:, None, :, 3])
    inter = np.clip(ix1 - ix0, 0, None) * np.clip(iy1 - iy0, 0, None)
    area_d = (det_boxes[..., 2] - det_boxes[..., 0]) * (det_boxes[..., 3] - det_boxes[..., 1])
    area_g = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    union = area_d[:, :, None] + area_g[:, None, :] - inter
    iou = np.where(union > 0, inter / np.where(union > 0, union, 1.0), 0.0)
    iou = np.where(gt_mask[:, None, :] & det_valid[:, :, None], iou, -1.0)

    # per-image score order (stable → equal scores keep detection order, the
    # same tie order a stable global sort yields within one image)
    order = np.argsort(-det_scores + np.where(det_valid, 0.0, np.inf), axis=1, kind="stable")
    tp = np.zeros((B, D))
    gt_free = gt_mask.copy()
    rows = np.arange(B)
    for r in range(D):
        d = order[:, r]  # (B,) this round's detection per image
        cand = np.where(gt_free, iou[rows, d], -1.0)  # (B, G)
        best_j = np.argmax(cand, axis=1)
        hit = cand[rows, best_j] >= iou_thr
        gt_free[rows[hit], best_j[hit]] = False
        tp[rows[hit], d[hit]] = 1.0

    # global ranking: stable sort by -score over valid detections; ties keep
    # (image, slot) order — numerically identical to sorting the flat record
    # list, and cross-image ties never interact (different images' gts)
    flat_scores = det_scores.ravel()
    flat_valid = det_valid.ravel()
    g_order = np.argsort(-flat_scores, kind="stable")
    g_order = g_order[flat_valid[g_order]]
    tp_sorted = tp.ravel()[g_order]

    cum_tp = np.cumsum(tp_sorted)
    recall = cum_tp / n_gt
    precision = cum_tp / (np.arange(n_det) + 1)
    # precision envelope, integrated over recall
    env = np.maximum.accumulate(precision[::-1])[::-1]
    r = np.concatenate([[0.0], recall, [recall[-1]]])
    p = np.concatenate([[env[0]], env, [0.0]])
    return float(np.trapezoid(p, r))


def evaluate_map50(
    model: YoloV8,
    variables: dict,
    images: np.ndarray,
    gt: np.ndarray,
    gt_mask: np.ndarray,
    imgsz: tuple[int, int],
    conf: float = 0.001,
    iou: float = 0.7,
    max_det: int = 32,
) -> float:
    """mAP@0.5 of a detector over a labeled set (single class)."""
    boxes, scores, valid = _detections_for_map(model, variables, images, imgsz, conf, iou, max_det)
    return average_precision_50(boxes, scores, valid, np.asarray(gt), np.asarray(gt_mask))


# ---------------------------------------------------------------------------
# the training run
# ---------------------------------------------------------------------------


@dataclass
class EpochResult:
    epoch: int
    train_loss: float
    val_map50: float
    lr: float


class YoloTrainingRun:
    """Drives the full recipe: compiled epochs, EMA validation, early stop.

    One ``lax.scan`` per epoch over device-resident data; between epochs the
    host validates the EMA weights, checkpoints best/last, and decides early
    stopping — mirroring the shape of the reference's delegated trainer while
    keeping every hot operation on device.
    """

    def __init__(
        self,
        model: YoloV8,
        variables: dict,
        imgsz: tuple[int, int],
        config: RecipeConfig = RecipeConfig(),
        steps_per_epoch: int | None = None,
        n_train: int | None = None,
        mesh=None,
        data_axis: str = "data",
    ):
        self.model = model
        self.config = config
        self.imgsz = imgsz
        # optional data parallelism: each scanned batch shards over the mesh's
        # ``data_axis`` while params/opt/EMA replicate — XLA inserts the
        # gradient psum from the sharding annotations (the DP the reference
        # gets from ultralytics' DDP device list, yolo_train_config.yaml:21)
        self.mesh = mesh
        self.data_axis = data_axis
        self.params = variables["params"]
        self.batch_stats = variables.get("batch_stats", {})
        self.ema_params = jax.tree.map(lambda x: x, self.params)
        if steps_per_epoch is None:
            if n_train is None:
                raise ValueError("pass steps_per_epoch or n_train")
            steps_per_epoch = max(1, -(-n_train // config.batch))
        self.steps_per_epoch = steps_per_epoch

        total_steps = max(2, config.epochs * steps_per_epoch)
        # warmup can't swallow the whole run (short smoke runs keep the
        # reference's 3-epoch warmup default): clamp to total-1 so the cosine
        # leg always has at least one step
        warmup = int(round(config.warmup_epochs * steps_per_epoch))
        warmup = min(max(1, warmup), total_steps - 1)
        self.schedule = optax.warmup_cosine_decay_schedule(
            init_value=config.lr0 * 0.01,
            peak_value=config.lr0,
            warmup_steps=warmup,
            decay_steps=total_steps,
            end_value=config.lr0 * config.lrf,
        )
        self.tx = optax.adamw(self.schedule, weight_decay=config.weight_decay)
        self.opt_state = self.tx.init(self.params)
        self.step_count = 0
        self._epoch_fns: dict = {}

    # -- compiled epoch ----------------------------------------------------

    def _epoch_fn(self, mosaic_on: bool, batch_shapes: tuple):
        key = (mosaic_on, batch_shapes)
        if key in self._epoch_fns:
            return self._epoch_fns[key]

        model, imgsz, tx, cfg = self.model, self.imgsz, self.tx, self.config
        aug = cfg.augment

        batch_shard = None
        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            batch_shard = NamedSharding(self.mesh, PartitionSpec(self.data_axis))
            repl = NamedSharding(self.mesh, PartitionSpec())

        def epoch(params, stats, opt_state, ema, step0, rngs, images, gt, cls, mask, order):
            def train_step(carry, xs):
                params, stats, opt_state, ema, step = carry
                rng, idx = xs
                # gather this step's batch from the device-resident dataset —
                # only one batch is ever materialized beyond the data itself
                b_images = jnp.take(images, idx, axis=0)
                # compact gray storage: run the whole augmentation chain on ONE
                # channel and broadcast to the model's 3 at the end — the three
                # channels are identical gray replicas, so this is mathematically
                # the same batch at a third of the warp/resize cost (the round-5
                # device trace showed the 3-channel f32 warp transposes dominating
                # the s/416 train step)
                expand_after = b_images.dtype == jnp.uint8
                if expand_after:
                    b_images = b_images[..., None].astype(jnp.float32) / 255.0  # (B,H,W,1)
                b_gt = jnp.take(gt, idx, axis=0)
                b_cls = jnp.take(cls, idx, axis=0)
                b_mask = jnp.take(mask, idx, axis=0)
                if batch_shard is not None:
                    # data parallelism: the gathered batch shards over the
                    # mesh; grads psum back because params stay replicated
                    b_images, b_gt, b_cls, b_mask = (
                        jax.lax.with_sharding_constraint(x, batch_shard)
                        for x in (b_images, b_gt, b_cls, b_mask)
                    )
                if not aug.identity:
                    b_images, b_gt, b_cls, b_mask = augment_batch(
                        rng, b_images, b_gt, b_cls, b_mask, aug, mosaic_on
                    )
                if expand_after:
                    b_images = jnp.broadcast_to(b_images, (*b_images.shape[:3], 3))

                def loss_fn(p):
                    (box_l, cls_l), updates = model.apply(
                        {"params": p, "batch_stats": stats}, b_images, train=True, mutable=["batch_stats"]
                    )
                    loss, parts = detection_loss(box_l, cls_l, b_gt, b_cls, b_mask, imgsz, model.reg_max)
                    return loss, (parts, updates["batch_stats"])

                (loss, (_, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

                d = cfg.ema_decay * (1.0 - jnp.exp(-(step + 1.0) / cfg.ema_tau))
                ema = jax.tree.map(lambda e, p: e * d + p * (1.0 - d), ema, params)
                return (params, new_stats, opt_state, ema, step + 1.0), loss

            carry, losses = jax.lax.scan(
                train_step, (params, stats, opt_state, ema, step0), (rngs, order)
            )
            return carry, jnp.mean(losses)

        if batch_shard is not None:
            # dataset + train state replicate across the mesh (the dataset must
            # be fully addressable for the per-step gather); only the per-batch
            # compute shards, via the constraint above
            n_in = 11
            epoch = jax.jit(
                epoch, in_shardings=(repl,) * n_in, out_shardings=(repl, repl)
            )
        else:
            epoch = jax.jit(epoch)
        self._epoch_fns[key] = epoch
        return epoch

    def _epoch_order(self, n: int, rng: np.random.Generator) -> np.ndarray:
        """Draw one epoch's (n_batches, bs) sample order from ``rng``.

        The draw count is a deterministic function of (n, batch, steps) alone,
        so a resumed :meth:`fit` replays the interrupted epochs' draws and the
        continuation consumes exactly the permutations the uninterrupted run
        would have (the kill-and-resume test pins this).
        """
        bs = min(self.config.batch, n)
        n_batches = self.steps_per_epoch
        # permutation padded to n_batches*bs by re-drawing (no dropped tail)
        perm = rng.permutation(n)
        need = n_batches * bs
        while len(perm) < need:
            perm = np.concatenate([perm, rng.permutation(n)])
        return perm[:need].reshape(n_batches, bs)

    def run_epoch(self, epoch_idx: int, images, gt, cls, mask, rng: np.random.Generator) -> float:
        """One training epoch over the (device-resident) dataset."""
        cfg = self.config
        n = images.shape[0]
        bs = min(cfg.batch, n)
        if self.mesh is not None and bs % self.mesh.devices.size != 0:
            raise ValueError(
                f"batch size {bs} is not a multiple of the mesh size "
                f"{self.mesh.devices.size}; an uneven split would silently pad "
                "device shards — pick a divisible batch"
            )
        n_batches = self.steps_per_epoch
        order = jnp.asarray(self._epoch_order(n, rng))

        mosaic_on = epoch_idx < cfg.epochs - cfg.close_mosaic
        epoch = self._epoch_fn(mosaic_on, (bs,))
        rngs = jax.random.split(jax.random.PRNGKey(cfg.seed * 100_003 + epoch_idx), n_batches)

        (self.params, self.batch_stats, self.opt_state, self.ema_params, step) , mean_loss = epoch(
            self.params,
            self.batch_stats,
            self.opt_state,
            self.ema_params,
            jnp.float32(self.step_count),
            rngs,
            images,
            gt,
            cls,
            mask,
            order,
        )
        self.step_count += n_batches
        return float(mean_loss)

    # -- weights -----------------------------------------------------------

    def variables(self, ema: bool = True) -> dict:
        vs = {"params": self.ema_params if ema else self.params}
        if self.batch_stats:
            vs["batch_stats"] = self.batch_stats
        return vs

    # -- full-state checkpointing (resume) -----------------------------------

    def save_state(self, directory: str, epoch: int, best_map: float, best_epoch: int) -> None:
        """Persist the COMPLETE training state — params, optimizer, EMA, batch
        stats, step counter, and best-mAP bookkeeping — so an interrupted run
        resumes bit-exactly (the reference's delegated trainer has `resume`,
        /root/reference/yolo/yolo_train_config.yaml:31). Orbax carries the
        pytrees; a small JSON carries the scalars."""
        import json

        import orbax.checkpoint as ocp

        path = os.path.abspath(directory)
        with ocp.StandardCheckpointer() as ckptr:
            ckptr.save(
                f"{path}/train_state",
                {
                    "params": self.params,
                    "batch_stats": self.batch_stats,
                    "opt_state": self.opt_state,
                    "ema_params": self.ema_params,
                },
                force=True,
            )
        meta = {
            "epoch": epoch,
            "step_count": self.step_count,
            "best_map": best_map,
            "best_epoch": best_epoch,
        }
        with open(os.path.join(path, "train_state.json"), "w") as f:
            json.dump(meta, f)

    def load_state(self, directory: str) -> dict | None:
        """Restore a :meth:`save_state` checkpoint in place; returns the
        scalar metadata (epoch, best_map, best_epoch) or ``None`` when the
        directory holds no resumable state."""
        import json

        import orbax.checkpoint as ocp

        path = os.path.abspath(directory)
        meta_path = os.path.join(path, "train_state.json")
        if not (os.path.exists(meta_path) and os.path.exists(f"{path}/train_state")):
            return None
        target = {
            "params": self.params,
            "batch_stats": self.batch_stats,
            "opt_state": self.opt_state,
            "ema_params": self.ema_params,
        }
        with ocp.StandardCheckpointer() as ckptr:
            state = ckptr.restore(f"{path}/train_state", target)
        self.params = state["params"]
        self.batch_stats = state["batch_stats"]
        self.opt_state = state["opt_state"]
        self.ema_params = state["ema_params"]
        with open(meta_path) as f:
            meta = json.load(f)
        self.step_count = int(meta["step_count"])
        return meta

    # -- the full loop -----------------------------------------------------

    def fit(
        self,
        train_images,
        train_gt,
        train_cls,
        train_mask,
        val_images=None,
        val_gt=None,
        val_mask=None,
        ckpt_dir: str | None = None,
        log=print,
        resume: bool = False,
        stop_after: int | None = None,
        tensorboard_dir: str | None = None,
    ) -> list[EpochResult]:
        """Train with per-epoch validation, best/last checkpoints, early stop.

        Without an explicit val set, ``val_fraction`` of the data is split off
        (deterministically by seed). Returns the per-epoch history; the best
        EMA weights end up in ``self.best_variables``.

        ``resume=True`` restores the full train state from ``ckpt_dir`` (see
        :meth:`save_state`) and continues from the next epoch — the resumed
        run reproduces the uninterrupted run's weights exactly (the consumed
        permutation draws are replayed + full optimizer/EMA/bookkeeping
        restore).
        ``stop_after`` caps the epochs run in THIS session (train-until-killed
        operation); ``tensorboard_dir`` streams loss / val mAP50 / lr scalars
        like the MLP trainer (reference analogue:
        /root/reference/wtracker/neural/training.py:111-117).
        """
        cfg = self.config
        if val_images is None:
            n = train_images.shape[0]
            idx = np.random.default_rng(cfg.seed).permutation(n)
            n_val = max(1, int(round(n * cfg.val_fraction))) if n > 4 else 0
            if n_val:
                val_idx, tr_idx = idx[:n_val], idx[n_val:]
                val_images, val_gt, val_mask = (
                    train_images[val_idx], train_gt[val_idx], train_mask[val_idx],
                )
                train_images, train_gt, train_cls, train_mask = (
                    train_images[tr_idx], train_gt[tr_idx], train_cls[tr_idx], train_mask[tr_idx],
                )

        d_images = jnp.asarray(train_images)
        d_gt = jnp.asarray(train_gt)
        d_cls = jnp.asarray(train_cls)
        d_mask = jnp.asarray(train_mask)

        history: list[EpochResult] = []
        best_map, best_epoch, start_epoch = -1.0, -1, 0
        self.best_variables = self.variables()

        if resume:
            if not ckpt_dir:
                raise ValueError("resume=True requires ckpt_dir")
            meta = self.load_state(ckpt_dir)
            if meta is not None:
                start_epoch = int(meta["epoch"]) + 1
                best_map, best_epoch = float(meta["best_map"]), int(meta["best_epoch"])
                best_path = os.path.join(ckpt_dir, "best.npz")
                if os.path.exists(best_path):
                    from wtracker_tpu.models.yolov8 import YoloV8Detector

                    self.best_variables = YoloV8Detector.load(best_path).variables
                log(f"resumed from epoch {meta['epoch']} (best mAP50 {best_map:.3f})")

        writer = None
        if tensorboard_dir:
            from torch.utils.tensorboard import SummaryWriter  # host-side only

            writer = SummaryWriter(tensorboard_dir)

        # one permutation stream threaded across epochs; a resumed run replays
        # the interrupted epochs' draws so the continuation consumes exactly
        # the batch orders the uninterrupted run would have
        rng = np.random.default_rng(cfg.seed)
        for _ in range(start_epoch):
            self._epoch_order(d_images.shape[0], rng)

        ran = 0
        for e in range(start_epoch, cfg.epochs):
            if stop_after is not None and ran >= stop_after:
                break
            ran += 1
            loss = self.run_epoch(e, d_images, d_gt, d_cls, d_mask, rng)
            val_map = (
                evaluate_map50(
                    self.model, self.variables(), val_images, val_gt, val_mask, self.imgsz,
                    conf=cfg.val_conf, iou=cfg.val_iou, max_det=cfg.val_max_det,
                )
                if val_images is not None and len(val_images)
                else float("nan")
            )
            lr = float(self.schedule(self.step_count - 1))
            history.append(EpochResult(e, loss, val_map, lr))
            log(f"epoch {e}: loss {loss:.4f}  val mAP50 {val_map:.3f}  lr {lr:.2e}")
            if writer is not None:
                writer.add_scalar("train/loss", loss, e)
                if not np.isnan(val_map):
                    writer.add_scalar("val/mAP50", val_map, e)
                writer.add_scalar("train/lr", lr, e)

            # best-WEIGHT selection refreshes on mAP ties (later epochs carry
            # better-calibrated confidences at equal mAP — tiny val sets
            # plateau early and freezing the first plateau epoch ships an
            # undertrained detector); best-EPOCH bookkeeping stays strict so
            # a flat plateau still trips the patience early stop
            improved = np.isnan(val_map) or val_map > best_map
            if improved or val_map >= best_map:
                # ties refresh the in-memory best every epoch; the best.npz
                # write piggybacks on the checkpoint cadence (a plateau would
                # otherwise pay a ~45 MB device fetch + write per epoch)
                self.best_variables = jax.tree.map(np.asarray, self.variables())
            if improved:
                best_map = -1.0 if np.isnan(val_map) else val_map
                best_epoch = e
            last_epoch = e == cfg.epochs - 1 or (
                stop_after is not None and ran >= stop_after
            )
            if ckpt_dir and (improved or last_epoch or (e + 1) % cfg.ckpt_every == 0):
                self._save(os.path.join(ckpt_dir, "best.npz"), self.best_variables)
                self._save(os.path.join(ckpt_dir, "last.npz"), self.variables())
                self.save_state(ckpt_dir, e, best_map, best_epoch)
            if e - best_epoch >= cfg.patience:
                log(f"early stop at epoch {e} (no val improvement for {cfg.patience})")
                break
        if writer is not None:
            writer.close()
        return history

    def _save(self, path: str, variables: dict) -> None:
        from wtracker_tpu.models.yolov8 import YoloV8Detector

        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        YoloV8Detector(model=self.model, variables=variables, imgsz=self.imgsz).save(path)
