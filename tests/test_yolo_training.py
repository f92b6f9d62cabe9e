"""YOLO training tests: assigner sanity, loss gradients, tiny overfit run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from wtracker_tpu.models.yolov8 import YoloV8, detect_top1, make_anchors
from wtracker_tpu.neural.yolo_training import (
    YoloTrainer,
    detection_loss,
    pairwise_ciou,
    task_aligned_assigner,
)


def test_pairwise_ciou_identity():
    a = jnp.array([[10.0, 10.0, 30.0, 30.0]])
    ciou = pairwise_ciou(a, a)
    np.testing.assert_allclose(np.asarray(ciou), [[1.0]], atol=1e-6)

    b = jnp.array([[100.0, 100.0, 120.0, 120.0]])
    assert float(pairwise_ciou(a, b)[0, 0]) < 0  # disjoint + far -> negative


def test_assigner_prefers_anchor_on_gt():
    imgsz = (64, 64)
    anchors, strides = make_anchors(imgsz)
    anchors_px = jnp.asarray(anchors * strides)
    A = anchors_px.shape[0]

    gt = jnp.array([[20.0, 20.0, 36.0, 36.0]])  # box covering ~4 stride-8 cells
    gt_cls = jnp.array([0])
    gt_mask = jnp.array([True])

    # predictions: perfect box at every anchor, uniform scores
    pred = jnp.tile(gt, (A, 1))
    scores = jnp.full((A, 1), 0.5)

    fg, best_gt, tgt = task_aligned_assigner(scores, pred, anchors_px, gt, gt_cls, gt_mask)
    fg = np.asarray(fg)
    inside = (
        (np.asarray(anchors_px)[:, 0] >= 20)
        & (np.asarray(anchors_px)[:, 0] <= 36)
        & (np.asarray(anchors_px)[:, 1] >= 20)
        & (np.asarray(anchors_px)[:, 1] <= 36)
    )
    assert fg.any()
    assert (fg <= inside).all()  # only anchors inside the gt can be foreground
    assert np.asarray(tgt)[fg].max() > 0


def _blob_batch(rng, B=4, size=64):
    """Images with one bright blob each + matching gt boxes."""
    images = rng.uniform(0, 0.2, size=(B, size, size, 3)).astype(np.float32)
    gt = np.zeros((B, 1, 4), np.float32)
    for i in range(B):
        cx, cy = rng.integers(16, size - 16, size=2)
        w = h = 14
        x0, y0 = cx - w // 2, cy - h // 2
        images[i, y0 : y0 + h, x0 : x0 + w, :] = 1.0
        gt[i, 0] = (x0, y0, x0 + w, y0 + h)
    return images, gt, np.zeros((B, 1), np.int32), np.ones((B, 1), bool)


def test_detection_loss_grads_finite(rng):
    model = YoloV8(nc=1, scale="n")
    imgsz = (64, 64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *imgsz, 3), jnp.float32), train=False)
    images, gt, cls, mask = _blob_batch(rng)

    def loss_fn(p):
        box_l, cls_l = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]}, jnp.asarray(images), train=False
        )
        loss, _ = detection_loss(box_l, cls_l, jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask), imgsz)
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert any(float(jnp.abs(g).max()) > 0 for g in flat)


def test_overfit_single_blob(rng):
    """A tiny detector must learn to localize a fixed blob in a few steps."""
    model = YoloV8(nc=1, scale="n")
    imgsz = (64, 64)
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, *imgsz, 3), jnp.float32), train=False)

    images, gt, cls, mask = _blob_batch(rng, B=8)
    trainer = YoloTrainer(model, variables, imgsz=imgsz, learning_rate=5e-3)

    first_loss, _ = trainer.step(images, gt, cls, mask)
    for _ in range(250):
        loss, parts = trainer.step(images, gt, cls, mask)
    assert loss < 0.5 * first_loss, (first_loss, loss)

    # detections must land on the blobs
    det = detect_top1(
        model, trainer.trained_variables, jnp.asarray(images[:4, ..., 0] * 255), imgsz, conf=0.05
    )
    det = np.asarray(det)
    assert np.isfinite(det).all(), det
    for j in range(4):
        cx, cy = det[j, 0] + det[j, 2] / 2, det[j, 1] + det[j, 3] / 2
        gx, gy = (gt[j, 0, 0] + gt[j, 0, 2]) / 2, (gt[j, 0, 1] + gt[j, 0, 3]) / 2
        assert abs(cx - gx) < 8 and abs(cy - gy) < 8, (det[j], gt[j])


def test_dp_yolo_train_step(rng):
    """Detector training step shards the batch across the CPU mesh."""
    from wtracker_tpu.neural.yolo_training import YoloTrainer, make_dp_yolo_train_step
    from wtracker_tpu.parallel import make_mesh

    model = YoloV8(nc=1, scale="n")
    imgsz = (64, 64)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, *imgsz, 3), jnp.float32), train=False)
    trainer = YoloTrainer(model, variables, imgsz=imgsz, learning_rate=1e-3)

    mesh = make_mesh(8, axis="data")
    step = make_dp_yolo_train_step(trainer, mesh)

    images, gt, cls, mask = _blob_batch(rng, B=8)
    params, batch_stats, opt_state = trainer.params, trainer.batch_stats, trainer.opt_state
    with mesh:
        losses = []
        for _ in range(3):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state,
                jnp.asarray(images), jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask),
            )
            losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def _two_blob_batch(rng, B=8, size=64):
    """Images with TWO well-separated bright blobs + (B, 2, 4) gt boxes."""
    images = rng.uniform(0, 0.2, size=(B, size, size, 3)).astype(np.float32)
    gt = np.zeros((B, 2, 4), np.float32)
    w = h = 12
    for i in range(B):
        # one blob per half so the pair never overlaps
        cx0 = rng.integers(10, size // 2 - 10)
        cx1 = rng.integers(size // 2 + 10, size - 10)
        cy0, cy1 = rng.integers(10, size - 10, size=2)
        for k, (cx, cy) in enumerate(((cx0, cy0), (cx1, cy1))):
            x0, y0 = int(cx) - w // 2, int(cy) - h // 2
            images[i, y0 : y0 + h, x0 : x0 + w, :] = 1.0
            gt[i, k] = (x0, y0, x0 + w, y0 + h)
    return images, gt, np.zeros((B, 2), np.int32), np.ones((B, 2), bool)


def _iou_xywh(a, b):
    ax0, ay0, ax1, ay1 = a[0], a[1], a[0] + a[2], a[1] + a[3]
    bx0, by0, bx1, by1 = b[0], b[1], b[0] + b[2], b[1] + b[3]
    iw = max(0.0, min(ax1, bx1) - max(ax0, bx0))
    ih = max(0.0, min(ay1, by1) - max(ay0, by0))
    inter = iw * ih
    union = a[2] * a[3] + b[2] * b[3] - inter
    return inter / union if union > 0 else 0.0


def test_detect_multi_two_worms(rng):
    """max_det>1 end-to-end: YoloV8Detector.detect_multi drives ops/nms.py on
    multi-worm frames and must recover BOTH worms per frame.

    The reference exposes max_det on YoloController's config
    (yolo_controller.py:30); this pins the native multi-detection
    counterpart — greedy NMS contract included (descending scores, kept
    boxes pairwise below the IoU threshold, slot 0 == the top-1 fast path).
    """
    from wtracker_tpu.models.yolov8 import YoloV8Detector

    model = YoloV8(nc=1, scale="n")
    imgsz = (64, 64)
    variables = model.init(jax.random.PRNGKey(2), jnp.zeros((1, *imgsz, 3), jnp.float32), train=False)

    images, gt, cls, mask = _two_blob_batch(rng, B=8)
    trainer = YoloTrainer(model, variables, imgsz=imgsz, learning_rate=5e-3)
    first_loss, _ = trainer.step(images, gt, cls, mask)
    for _ in range(300):
        loss, _ = trainer.step(images, gt, cls, mask)
    assert loss < 0.5 * first_loss, (first_loss, loss)

    det = YoloV8Detector(model=model, variables=trainer.trained_variables, imgsz=imgsz, conf=0.05)
    frames = jnp.asarray(images[:4, ..., 0] * 255)
    iou_thr = 0.5
    boxes, scores, valid = det.detect_multi(frames, max_det=5, iou=iou_thr)
    boxes, scores, valid = map(np.asarray, (boxes, scores, valid))

    top1 = np.asarray(detect_top1(model, trainer.trained_variables, frames, imgsz, conf=0.05))

    for j in range(4):
        kept = boxes[j][valid[j]]
        ks = scores[j][valid[j]]
        assert len(kept) >= 2, f"frame {j}: only {len(kept)} detections"
        # greedy contract: scores descend, survivors don't overlap
        assert (np.diff(ks) <= 1e-6).all(), ks
        for a in range(len(kept)):
            for b in range(a + 1, len(kept)):
                assert _iou_xywh(kept[a], kept[b]) <= iou_thr + 1e-6
        # slot 0 is the same box the max_det=1 fast path returns
        np.testing.assert_allclose(kept[0], top1[j], atol=1.0)
        # both gt worms recovered by the top-2 detections
        gt_centers = [(g[0] + g[2]) / 2 for g in gt[j]], [(g[1] + g[3]) / 2 for g in gt[j]]
        gcx, gcy = np.asarray(gt_centers[0]), np.asarray(gt_centers[1])
        dcx, dcy = kept[:2, 0] + kept[:2, 2] / 2, kept[:2, 1] + kept[:2, 3] / 2
        # match each gt to its nearest of the two detections
        for g in range(2):
            dist = np.hypot(dcx - gcx[g], dcy - gcy[g]).min()
            assert dist < 8.0, f"frame {j}: gt worm {g} missed by {dist:.1f}px"
