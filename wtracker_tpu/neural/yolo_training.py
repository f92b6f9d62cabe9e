"""YOLOv8 detection training: task-aligned assignment + CIoU/DFL/BCE losses.

The reference delegates detector training entirely to ultralytics
(yolo_training.ipynb cell 11, yolo/yolo_train_config.yaml: YOLOv8s, imgsz 384,
batch 72, AdamW, single class).  This module owns that capability natively:

* :func:`task_aligned_assigner` — the TAL matching of predictions to ground
  truth (align metric ``score^α · IoU^β``, top-k candidates among anchors
  whose center lies inside the gt box);
* :func:`detection_loss` — BCE classification against the normalized align
  metric, CIoU box loss, and distribution-focal loss on the two adjacent bins;
* :func:`make_train_step` / :class:`YoloTrainer` — optax training with the
  whole step jit-compiled; batch shards over a mesh via
  ``parallel.make_dp_train_step``-style annotations when provided.

Everything is shape-static (ground truth padded to ``max_gt`` with a mask), so
the step compiles once and runs entirely on device.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import optax

from wtracker_tpu.models.yolov8 import YoloV8, make_anchors


def pairwise_ciou(gt_xyxy: jnp.ndarray, pred_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Complete IoU between (G, 4) gt and (A, 4) predictions → (G, A)."""
    gt = gt_xyxy[:, None, :]
    pr = pred_xyxy[None, :, :]

    tl = jnp.maximum(gt[..., :2], pr[..., :2])
    br = jnp.minimum(gt[..., 2:], pr[..., 2:])
    wh = jnp.maximum(br - tl, 0.0)
    inter = wh[..., 0] * wh[..., 1]

    area_g = (gt[..., 2] - gt[..., 0]) * (gt[..., 3] - gt[..., 1])
    area_p = (pr[..., 2] - pr[..., 0]) * (pr[..., 3] - pr[..., 1])
    union = area_g + area_p - inter
    iou = inter / jnp.maximum(union, 1e-9)

    # enclosing box diagonal + center distance
    e_tl = jnp.minimum(gt[..., :2], pr[..., :2])
    e_br = jnp.maximum(gt[..., 2:], pr[..., 2:])
    c2 = jnp.sum((e_br - e_tl) ** 2, axis=-1) + 1e-9

    g_c = (gt[..., :2] + gt[..., 2:]) / 2
    p_c = (pr[..., :2] + pr[..., 2:]) / 2
    rho2 = jnp.sum((g_c - p_c) ** 2, axis=-1)

    # aspect-ratio term
    g_wh = jnp.maximum(gt[..., 2:] - gt[..., :2], 1e-9)
    p_wh = jnp.maximum(pr[..., 2:] - pr[..., :2], 1e-9)
    v = (4 / jnp.pi**2) * (jnp.arctan(g_wh[..., 0] / g_wh[..., 1]) - jnp.arctan(p_wh[..., 0] / p_wh[..., 1])) ** 2
    alpha = v / jnp.maximum(1 - iou + v, 1e-9)

    return iou - rho2 / c2 - alpha * v


def task_aligned_assigner(
    cls_scores: jnp.ndarray,
    pred_xyxy: jnp.ndarray,
    anchors_xy: jnp.ndarray,
    gt_xyxy: jnp.ndarray,
    gt_cls: jnp.ndarray,
    gt_mask: jnp.ndarray,
    topk: int = 10,
    alpha: float = 0.5,
    beta: float = 6.0,
):
    """Assign anchors to ground-truth boxes for one image.

    Args:
        cls_scores: (A, nc) sigmoided class scores.
        pred_xyxy: (A, 4) decoded predicted boxes (input pixels).
        anchors_xy: (A, 2) anchor centers (input pixels).
        gt_xyxy: (G, 4) padded ground-truth boxes.
        gt_cls: (G,) ground-truth class ids.
        gt_mask: (G,) validity of each gt slot.

    Returns:
        fg_mask (A,), assigned_gt (A,) index, target_scores (A, nc).
    """
    G, A = gt_xyxy.shape[0], pred_xyxy.shape[0]

    iou = jnp.clip(pairwise_ciou(gt_xyxy, pred_xyxy), 0.0, 1.0)  # (G, A)
    score_for_gt = jnp.take_along_axis(
        cls_scores.T, gt_cls[:, None].astype(jnp.int32), axis=0
    )  # (G, A) — score of each anchor for the gt's class
    align = (score_for_gt**alpha) * (iou**beta)

    # candidates: anchor center inside the gt box
    inside = (
        (anchors_xy[None, :, 0] >= gt_xyxy[:, None, 0])
        & (anchors_xy[None, :, 0] <= gt_xyxy[:, None, 2])
        & (anchors_xy[None, :, 1] >= gt_xyxy[:, None, 1])
        & (anchors_xy[None, :, 1] <= gt_xyxy[:, None, 3])
    )
    align = jnp.where(inside & gt_mask[:, None], align, 0.0)

    # top-k per gt (no epsilon floor: cold-start align scores are ~1e-13 and
    # must still seed foreground anchors)
    k = min(topk, A)
    kth = jnp.sort(align, axis=1)[:, -k][:, None]
    is_topk = (align >= kth) & (align > 0)

    # resolve anchors claimed by several gts: keep the one with highest IoU
    claimed = jnp.where(is_topk, iou, -1.0)
    best_gt = jnp.argmax(claimed, axis=0)  # (A,)
    fg_mask = jnp.max(is_topk, axis=0)

    # normalized target scores: per gt, align · max_iou / max_align — the
    # epsilon must sit far below cold-start align magnitudes (~1e-13) or the
    # normalization collapses the box-loss weights
    max_align = jnp.max(align, axis=1, keepdims=True)
    max_iou = jnp.max(jnp.where(is_topk, iou, 0.0), axis=1, keepdims=True)
    norm = align * max_iou / jnp.maximum(max_align, 1e-30)  # (G, A)
    anchor_score = jnp.take_along_axis(norm, best_gt[None, :], axis=0)[0]  # (A,)

    target_scores = jnp.zeros_like(cls_scores)
    cls_of_best = gt_cls[best_gt].astype(jnp.int32)
    target_scores = target_scores.at[jnp.arange(A), cls_of_best].set(
        jnp.where(fg_mask, anchor_score, 0.0).astype(target_scores.dtype)
    )
    return fg_mask, best_gt, target_scores


def detection_loss(
    box_logits: list[jnp.ndarray],
    cls_logits: list[jnp.ndarray],
    gt_xyxy: jnp.ndarray,
    gt_cls: jnp.ndarray,
    gt_mask: jnp.ndarray,
    imgsz: tuple[int, int],
    reg_max: int = 16,
    box_w: float = 7.5,
    cls_w: float = 0.5,
    dfl_w: float = 1.5,
):
    """The YOLOv8 training loss for a batch.

    Args:
        box_logits/cls_logits: raw per-scale head outputs.
        gt_xyxy: (B, G, 4) padded ground truth in input pixels.
        gt_cls: (B, G) class ids.
        gt_mask: (B, G) gt validity.
    Returns:
        scalar loss, dict of components.
    """
    B = box_logits[0].shape[0]
    nc = cls_logits[0].shape[-1]

    box_flat = jnp.concatenate([t.reshape(B, -1, 4 * reg_max) for t in box_logits], axis=1)
    cls_flat = jnp.concatenate([t.reshape(B, -1, nc) for t in cls_logits], axis=1)
    A = box_flat.shape[1]

    anchors, strides = make_anchors(imgsz)
    anchors = jnp.asarray(anchors)  # (A, 2) in stride units
    strides = jnp.asarray(strides)  # (A, 1)
    anchors_px = anchors * strides

    dist = box_flat.reshape(B, A, 4, reg_max).astype(jnp.float32)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    ltrb = jnp.sum(jax.nn.softmax(dist, axis=-1) * bins, axis=-1)  # (B, A, 4)
    pred_xyxy = jnp.concatenate(
        [(anchors[None] - ltrb[..., :2]) * strides[None], (anchors[None] + ltrb[..., 2:]) * strides[None]],
        axis=-1,
    )

    scores = jax.nn.sigmoid(cls_flat.astype(jnp.float32))

    # assignment targets are labels, not functions to differentiate — detach
    fg_mask, best_gt, target_scores = jax.tree.map(
        jax.lax.stop_gradient,
        jax.vmap(partial(task_aligned_assigner))(
            scores, pred_xyxy, jnp.broadcast_to(anchors_px, (B, A, 2)), gt_xyxy, gt_cls, gt_mask
        ),
    )

    # --- classification: BCE against the aligned target scores ---
    cls_loss = optax.sigmoid_binary_cross_entropy(cls_flat.astype(jnp.float32), target_scores)
    score_sum = jnp.maximum(jnp.sum(target_scores), 1.0)
    cls_loss = jnp.sum(cls_loss) / score_sum

    # --- box: CIoU on foreground anchors, weighted by target score ---
    tgt_boxes = jnp.take_along_axis(gt_xyxy, best_gt[..., None], axis=1)  # (B, A, 4)
    weight = jnp.sum(target_scores, axis=-1)  # (B, A)

    def img_ciou(gt_b, pr_b):
        # diagonal of pairwise over matched pairs
        return jax.vmap(lambda g, p: pairwise_ciou(g[None], p[None])[0, 0])(gt_b, pr_b)

    ciou = jax.vmap(img_ciou)(tgt_boxes, pred_xyxy)  # (B, A)
    box_loss = jnp.sum((1.0 - ciou) * weight * fg_mask) / score_sum

    # --- DFL: cross-entropy on the two adjacent bins of the target ltrb ---
    tgt_ltrb = jnp.concatenate(
        [
            (anchors[None] - tgt_boxes[..., :2] / strides[None]),
            (tgt_boxes[..., 2:] / strides[None] - anchors[None]),
        ],
        axis=-1,
    )
    tgt_ltrb = jnp.clip(tgt_ltrb, 0, reg_max - 1 - 0.01)
    tl = jnp.floor(tgt_ltrb)
    wr = tgt_ltrb - tl
    wl = 1.0 - wr
    logp = jax.nn.log_softmax(dist, axis=-1)  # (B, A, 4, reg_max)
    tl_i = tl.astype(jnp.int32)
    lp_l = jnp.take_along_axis(logp, tl_i[..., None], axis=-1)[..., 0]
    lp_r = jnp.take_along_axis(logp, jnp.minimum(tl_i + 1, reg_max - 1)[..., None], axis=-1)[..., 0]
    dfl = -(wl * lp_l + wr * lp_r)  # (B, A, 4)
    dfl_loss = jnp.sum(jnp.mean(dfl, axis=-1) * weight * fg_mask) / score_sum

    total = box_w * box_loss + cls_w * cls_loss + dfl_w * dfl_loss
    return total, {"box": box_loss, "cls": cls_loss, "dfl": dfl_loss}


@dataclass
class YoloTrainer:
    """Minimal detector trainer: jitted AdamW steps over padded-gt batches.

    Args:
        model: the Flax detector.
        variables: initial variables (params + batch_stats).
        imgsz: training image size.
        learning_rate / weight_decay: AdamW hyperparameters (reference recipe:
            AdamW, batch 72, imgsz 384 — yolo/yolo_train_config.yaml).
    """

    model: YoloV8
    variables: dict
    imgsz: tuple[int, int] = (384, 384)
    learning_rate: float = 1e-3
    weight_decay: float = 5e-4

    def __post_init__(self):
        self.tx = optax.adamw(self.learning_rate, weight_decay=self.weight_decay)
        self.params = self.variables["params"]
        self.batch_stats = self.variables.get("batch_stats", {})
        self.opt_state = self.tx.init(self.params)

        model, imgsz = self.model, self.imgsz
        tx = self.tx

        @jax.jit
        def train_step(params, batch_stats, opt_state, images, gt_xyxy, gt_cls, gt_mask):
            def loss_fn(p):
                (box_l, cls_l), updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    images,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss, parts = detection_loss(
                    box_l, cls_l, gt_xyxy, gt_cls, gt_mask, imgsz, model.reg_max
                )
                return loss, (parts, updates["batch_stats"])

            (loss, (parts, new_stats)), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_stats, opt_state, loss, parts

        self._train_step = train_step

    def step(self, images: np.ndarray, gt_xyxy: np.ndarray, gt_cls: np.ndarray, gt_mask: np.ndarray):
        """One optimization step; returns (loss, component dict)."""
        self.params, self.batch_stats, self.opt_state, loss, parts = self._train_step(
            self.params, self.batch_stats, self.opt_state,
            jnp.asarray(images), jnp.asarray(gt_xyxy), jnp.asarray(gt_cls), jnp.asarray(gt_mask),
        )
        return float(loss), {k: float(v) for k, v in parts.items()}

    @property
    def trained_variables(self) -> dict:
        vs = {"params": self.params}
        if self.batch_stats:
            vs["batch_stats"] = self.batch_stats
        return vs


def make_dp_yolo_train_step(trainer: YoloTrainer, mesh, axis: str = "data"):
    """Data-parallel detector train step over a mesh.

    Batch (images + padded gt) shards over ``axis``; params/opt state
    replicate; XLA inserts the gradient psum from the sharding annotations.
    Returns ``step(params, batch_stats, opt_state, images, gt, cls, mask)``.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_shard = NamedSharding(mesh, P(axis))
    repl = NamedSharding(mesh, P())
    model, imgsz, tx = trainer.model, trainer.imgsz, trainer.tx

    @partial(
        jax.jit,
        in_shardings=(repl, repl, repl, batch_shard, batch_shard, batch_shard, batch_shard),
        out_shardings=(repl, repl, repl, repl),
    )
    def step(params, batch_stats, opt_state, images, gt_xyxy, gt_cls, gt_mask):
        def loss_fn(p):
            (box_l, cls_l), updates = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images,
                train=True,
                mutable=["batch_stats"],
            )
            loss, parts = detection_loss(box_l, cls_l, gt_xyxy, gt_cls, gt_mask, imgsz, model.reg_max)
            return loss, updates["batch_stats"]

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_stats, opt_state, loss

    return step
