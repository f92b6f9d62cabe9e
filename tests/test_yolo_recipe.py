"""The native YOLO training recipe and its accuracy gate.

Covers VERDICT round-2 items 1 and 9:

* unit tests of the on-device augmentation chain (geometry, flips, mosaic)
  and the AP@0.5 metric;
* the **detection-accuracy gate**: the full recipe (augmentation, warmup +
  cosine AdamW, EMA, val mAP, checkpoints) trains a tiny detector on rendered
  synthetic-scene views, must reach a quantitative val mAP@0.5 bar, and the
  trained detector must then *track* — the live closed loop's mean bbox_error
  must land within a stated margin of the CsvController ground-truth-playback
  baseline on the same scenes (the reference's own quality measures:
  yolo_train_config.yaml:45-55 validation; eval/error_calculator.py:163-195);
* multi-worm detection end-to-end through the general NMS
  (``YoloV8Detector.detect_multi`` — max_det semantics of
  yolo_controller.py:30).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import flax.linen as nn

from wtracker_tpu.models.yolov8 import YoloV8
from wtracker_tpu.neural.yolo_recipe import (
    AugmentConfig,
    RecipeConfig,
    YoloTrainingRun,
    augment_batch,
    average_precision_50,
    spatial_augment,
)


def _blob_batch(rng, B=8, size=64, G=2):
    images = rng.uniform(0, 0.2, size=(B, size, size, 3)).astype(np.float32)
    gt = np.zeros((B, G, 4), np.float32)
    cls = np.zeros((B, G), np.int32)
    mask = np.zeros((B, G), bool)
    for i in range(B):
        cx, cy = rng.integers(18, size - 18, size=2)
        w = h = 14
        images[i, cy - h // 2 : cy + h // 2, cx - w // 2 : cx + w // 2, :] = 1.0
        gt[i, 0] = (cx - w // 2, cy - h // 2, cx + w // 2, cy + h // 2)
        mask[i, 0] = True
    return images, gt, cls, mask


def test_spatial_augment_identity():
    """Zero-strength augmentation must be (numerically) the identity."""
    rng = np.random.default_rng(0)
    images, gt, cls, mask = _blob_batch(rng)
    cfg = AugmentConfig(mosaic=0, fliplr=0, flipud=0, translate=0, scale=0, brightness=0, contrast=0)
    out, new_gt, new_mask = spatial_augment(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(gt), jnp.asarray(mask), cfg
    )
    np.testing.assert_allclose(np.asarray(out), images, atol=1e-5)
    np.testing.assert_allclose(np.asarray(new_gt), gt, atol=1e-4)
    np.testing.assert_array_equal(np.asarray(new_mask), mask)


def test_spatial_augment_flip_boxes():
    """Forced fliplr mirrors both the image and the boxes."""
    rng = np.random.default_rng(1)
    images, gt, cls, mask = _blob_batch(rng, B=4)
    cfg = AugmentConfig(mosaic=0, fliplr=1.0, flipud=0, translate=0, scale=0, brightness=0, contrast=0)
    out, new_gt, new_mask = spatial_augment(
        jax.random.PRNGKey(0), jnp.asarray(images), jnp.asarray(gt), jnp.asarray(mask), cfg
    )
    W = images.shape[2]
    np.testing.assert_allclose(np.asarray(out), images[:, :, ::-1], atol=1e-5)
    exp_x0 = (W - 1) - gt[:, 0, 2]
    exp_x1 = (W - 1) - gt[:, 0, 0]
    np.testing.assert_allclose(np.asarray(new_gt)[:, 0, 0], exp_x0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(new_gt)[:, 0, 2], exp_x1, atol=1e-4)
    assert np.asarray(new_mask).sum() == mask.sum()


def test_augment_batch_boxes_stay_on_blobs():
    """Under the full random chain (mosaic+affine+flips+photometric), every
    surviving gt box must still frame bright blob pixels."""
    rng = np.random.default_rng(0)
    images, gt, cls, mask = _blob_batch(rng)
    ai, ag, ac, am = augment_batch(
        jax.random.PRNGKey(3),
        jnp.asarray(images), jnp.asarray(gt), jnp.asarray(cls), jnp.asarray(mask),
        AugmentConfig(), mosaic_on=True,
    )
    ai, ag, am = np.asarray(ai), np.asarray(ag), np.asarray(am)
    B, G = mask.shape
    assert ag.shape == (B, 4 * G, 4) and am.shape == (B, 4 * G)
    checked = 0
    for i in range(B):
        for j in range(4 * G):
            if not am[i, j]:
                continue
            x0, y0, x1, y1 = ag[i, j]
            region = ai[i, int(y0) : int(np.ceil(y1)), int(x0) : int(np.ceil(x1)), 0]
            assert region.size > 0 and region.mean() > ai[i].mean() + 0.05, (i, j, ag[i, j])
            checked += 1
    assert checked >= B  # at least one live box per image


def test_average_precision_sanity():
    rng = np.random.default_rng(0)
    _, gt, _, mask = _blob_batch(rng)
    det_boxes = gt[:, :1].copy()
    det_scores = np.ones((gt.shape[0], 1))
    det_valid = mask[:, :1].copy()
    assert average_precision_50(det_boxes, det_scores, det_valid, gt, mask) > 0.99
    assert average_precision_50(det_boxes + 40, det_scores, det_valid, gt, mask) < 0.2
    # extra confident false positives must drag precision down
    fp_boxes = np.concatenate([det_boxes, det_boxes + 45], axis=1)
    fp_scores = np.concatenate([det_scores * 0.5, det_scores], axis=1)
    fp_valid = np.concatenate([det_valid, det_valid], axis=1)
    ap = average_precision_50(fp_boxes, fp_scores, fp_valid, gt, mask)
    assert 0.2 < ap < 0.9


def _ap50_loop_reference(det_boxes, det_scores, det_valid, gt, gt_mask, iou_thr=0.5):
    """The original O(detections · G) python greedy matcher — kept here as the
    oracle for the vectorized implementation (same spec, trivially auditable)."""
    n_gt = int(gt_mask.sum())
    recs = []
    for b in range(det_boxes.shape[0]):
        for d in range(det_boxes.shape[1]):
            if det_valid[b, d]:
                recs.append((float(det_scores[b, d]), b, det_boxes[b, d]))
    if not recs or n_gt == 0:
        return 0.0
    recs.sort(key=lambda r: -r[0])
    matched = set()
    tp = np.zeros(len(recs))
    for i, (_, b, box) in enumerate(recs):
        best_iou, best_j = 0.0, -1
        for j in range(gt.shape[1]):
            if not gt_mask[b, j] or (b, j) in matched:
                continue
            g = gt[b, j]
            ix0, iy0 = max(box[0], g[0]), max(box[1], g[1])
            ix1, iy1 = min(box[2], g[2]), min(box[3], g[3])
            inter = max(0.0, ix1 - ix0) * max(0.0, iy1 - iy0)
            union = (box[2] - box[0]) * (box[3] - box[1]) + (g[2] - g[0]) * (g[3] - g[1]) - inter
            iou = inter / union if union > 0 else 0.0
            if iou > best_iou:
                best_iou, best_j = iou, j
        if best_iou >= iou_thr and best_j >= 0:
            matched.add((b, best_j))
            tp[i] = 1.0
    cum_tp = np.cumsum(tp)
    recall = cum_tp / n_gt
    precision = cum_tp / (np.arange(len(recs)) + 1)
    env = np.maximum.accumulate(precision[::-1])[::-1]
    r = np.concatenate([[0.0], recall, [recall[-1]]])
    p = np.concatenate([[env[0]], env, [0.0]])
    return float(np.trapezoid(p, r))


def test_average_precision_matches_loop_reference():
    """The vectorized AP must equal the greedy python matcher on random sets
    spanning the awkward cases: duplicate scores (tie order), invalid rows,
    empty images, overlapping detections competing for one gt."""
    rng = np.random.default_rng(7)
    for trial in range(20):
        B, D, G = rng.integers(1, 6), rng.integers(1, 9), rng.integers(1, 5)
        gt_xy = rng.uniform(0, 80, (B, G, 2))
        gt_wh = rng.uniform(4, 30, (B, G, 2))
        gt = np.concatenate([gt_xy, gt_xy + gt_wh], axis=-1)
        gt_mask = rng.random((B, G)) < 0.8
        # detections: jittered copies of gts + pure noise, quantized scores
        # so duplicates are common
        det = gt[np.arange(B)[:, None], rng.integers(0, G, (B, D))]
        det = det + rng.normal(0, 6, det.shape)
        noise = rng.uniform(0, 100, (B, D, 4))
        use_noise = rng.random((B, D)) < 0.3
        det = np.where(use_noise[..., None], np.sort(noise, axis=-1), det)
        det[..., 2:] = np.maximum(det[..., 2:], det[..., :2] + 1.0)
        scores = np.round(rng.random((B, D)), 1)
        valid = rng.random((B, D)) < 0.85
        got = average_precision_50(det, scores, valid, gt, gt_mask)
        want = _ap50_loop_reference(det, scores, valid, gt, gt_mask)
        assert got == pytest.approx(want, abs=1e-12), f"trial {trial}: {got} != {want}"


def test_loader_letterboxes_non_square(tmp_path):
    """A non-square source must be letterboxed (aspect-preserving resize +
    centered 114 padding) with the SAME geometry the inference path applies —
    not square-resized — and the labels must land on the letterboxed pixels."""
    import cv2 as cv

    from wtracker_tpu.neural.yolo_recipe import BORDER, load_yolo_dataset

    imgs, lbls = tmp_path / "images", tmp_path / "labels"
    imgs.mkdir(), lbls.mkdir()
    # 40 (h) x 80 (w) source with a bright 10x10 blob whose top-left is (40, 10)
    src = np.zeros((40, 80), np.uint8)
    src[10:20, 40:50] = 255
    cv.imwrite(str(imgs / "a.png"), src)
    # normalized cx cy w h of that blob
    (lbls / "a.txt").write_text(f"0 {45/80} {15/40} {10/80} {10/40}\n")

    imgsz = 64
    images, gt, cls, mask = load_yolo_dataset(str(imgs), str(lbls), imgsz)
    assert images.shape == (1, imgsz, imgsz, 3) and mask[0, 0] and mask.sum() == 1

    # expected geometry: scale = min(64/40, 64/80) = 0.8 -> 32x64, pad_top 16
    scale, pad_top, pad_left = 0.8, 16, 0
    np.testing.assert_allclose(
        gt[0, 0],
        [40 * scale + pad_left, 10 * scale + pad_top, 50 * scale + pad_left, 20 * scale + pad_top],
        atol=1e-5,
    )
    # padding bands carry the 114 border constant; content band does not
    np.testing.assert_allclose(images[0, :pad_top], BORDER, atol=1e-6)
    np.testing.assert_allclose(images[0, pad_top + 32 :], BORDER, atol=1e-6)
    x0, y0, x1, y1 = (int(round(v)) for v in gt[0, 0])
    assert images[0, y0:y1, x0:x1].mean() > 0.9  # blob pixels inside the box
    assert images[0, pad_top : pad_top + 32].mean() < 0.2  # mostly-dark content


def test_loader_truncates_crowded_labels(tmp_path):
    """A label file exceeding max_gt must truncate with a warning — not kill
    the run (VERDICT r3 weak #6)."""
    import cv2 as cv

    from wtracker_tpu.neural.yolo_recipe import load_yolo_dataset

    imgs, lbls = tmp_path / "images", tmp_path / "labels"
    imgs.mkdir(), lbls.mkdir()
    cv.imwrite(str(imgs / "a.png"), np.zeros((32, 32), np.uint8))
    rows = [f"0 {0.1 + 0.13 * j:.3f} 0.5 0.05 0.05" for j in range(6)]
    (lbls / "a.txt").write_text("\n".join(rows) + "\n")

    with pytest.warns(UserWarning, match="exceed max_gt"):
        _, gt, _, mask = load_yolo_dataset(str(imgs), str(lbls), 32, max_gt=4)
    assert mask.sum() == 4
    # the kept four are the FIRST four rows, in order
    exp_cx = (0.1 + 0.13 * np.arange(4)) * 32
    np.testing.assert_allclose((gt[0, :, 0] + gt[0, :, 2]) / 2, exp_cx, atol=1e-4)


def test_dp_recipe_epoch_matches_single_device():
    """VERDICT r3 item 5: the recipe's compiled epoch scan with the batch
    sharded over a 4-device data mesh must reproduce the single-device run at
    equal global batch (params replicate; XLA's gradient psum is the only
    cross-device op, so results agree to reduction-order tolerance)."""
    from wtracker_tpu.parallel import make_mesh

    rng = np.random.default_rng(11)
    images, gt, cls, mask = _blob_batch(rng, B=8, size=64)
    data = tuple(jnp.asarray(a) for a in (images, gt, cls, mask))
    cfg = RecipeConfig(epochs=2, batch=4, lr0=2e-3, warmup_epochs=0.5, seed=2)
    model = YoloV8(nc=1, scale="n")
    init = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    run_s = YoloTrainingRun(model, jax.tree.map(np.copy, init), (64, 64), cfg, n_train=8)
    run_d = YoloTrainingRun(
        model, jax.tree.map(np.copy, init), (64, 64), cfg, n_train=8,
        mesh=make_mesh(4, axis="data"),
    )
    rng_s, rng_d = np.random.default_rng(0), np.random.default_rng(0)
    for e in range(cfg.epochs):
        loss_s = run_s.run_epoch(e, *data, rng_s)
        loss_d = run_d.run_epoch(e, *data, rng_d)
        assert loss_d == pytest.approx(loss_s, rel=1e-4), f"epoch {e}"

    # Adam's per-element normalization amplifies the psum reduction-order
    # noise wherever second moments are near zero, so the param check is a
    # NORMWISE bound (per-element rtol flakes on near-zero weights) — the
    # per-epoch loss agreement above is the equal-global-batch contract
    def _normwise_close(a, b):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        err = np.sqrt(((a - b) ** 2).mean())
        ref = np.sqrt((a**2).mean()) + 1e-8
        # absolute floor: freshly-initialized BN biases have ~2e-3 norms, so a
        # few-ulp reduction-order wiggle (measured ~8e-6 RMS worst-leaf) would
        # dominate a purely relative bound
        assert err <= max(3e-3 * ref, 2e-5), f"normwise param drift {err:.2e} vs scale {ref:.2e}"

    jax.tree.map(_normwise_close, run_s.params, run_d.params)

    # an indivisible batch must fail loudly, not silently pad device shards
    run_bad = YoloTrainingRun(
        model, init, (64, 64), RecipeConfig(epochs=1, batch=6), n_train=8,
        mesh=make_mesh(4, axis="data"),
    )
    with pytest.raises(ValueError, match="not a multiple of the mesh size"):
        run_bad.run_epoch(0, *data, np.random.default_rng(0))


def test_kill_and_resume_reproduces_uninterrupted_run(tmp_path):
    """VERDICT r3 item 4: interrupting the recipe and resuming from the full
    train state (params + optimizer + EMA + epoch/best bookkeeping) must
    reproduce the uninterrupted run bit-exactly — same weights, same history
    tail. Relies on fit() replaying the interrupted epochs' permutation draws
    on resume (the augmentation keys are already per-epoch from the seed)."""
    from wtracker_tpu.neural.yolo_recipe import EpochResult

    rng = np.random.default_rng(3)
    images, gt, cls, mask = _blob_batch(rng, B=8, size=64)
    cfg = RecipeConfig(epochs=3, batch=4, lr0=2e-3, warmup_epochs=1.0,
                       val_fraction=0.25, val_max_det=4, patience=10, seed=1)
    model = YoloV8(nc=1, scale="n")
    init = model.init(jax.random.PRNGKey(5), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    def fresh_run():
        variables = jax.tree.map(np.copy, init)
        return YoloTrainingRun(model, variables, (64, 64), cfg, n_train=6)

    # A: uninterrupted 3 epochs
    run_a = fresh_run()
    hist_a = run_a.fit(images, gt, cls, mask, ckpt_dir=str(tmp_path / "a"), log=lambda s: None)

    # B: killed after 2 epochs, then resumed in a brand-new process-equivalent
    ck_b = str(tmp_path / "b")
    run_b1 = fresh_run()
    hist_b1 = run_b1.fit(images, gt, cls, mask, ckpt_dir=ck_b, log=lambda s: None, stop_after=2)
    assert [h.epoch for h in hist_b1] == [0, 1]

    run_b2 = fresh_run()  # fresh optimizer/EMA state — everything must restore
    hist_b2 = run_b2.fit(images, gt, cls, mask, ckpt_dir=ck_b, log=lambda s: None, resume=True)
    assert [h.epoch for h in hist_b2] == [2]

    # bit-exact continuation: raw params, EMA params, and the history tail
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        run_a.params, run_b2.params,
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        run_a.ema_params, run_b2.ema_params,
    )
    a_last, b_last = hist_a[-1], hist_b2[-1]
    assert isinstance(a_last, EpochResult)
    assert a_last.train_loss == b_last.train_loss
    assert (np.isnan(a_last.val_map50) and np.isnan(b_last.val_map50)) or (
        a_last.val_map50 == b_last.val_map50
    )

    # the resumed run's best checkpoint bookkeeping survives too
    assert (tmp_path / "b" / "best.npz").exists()
    assert (tmp_path / "b" / "train_state.json").exists()


class _CenteringNet(nn.Module):
    """Linear predictor computing (w/2, h/2) from the feature layout — turns
    the hybrid controller's MLP branch into exact detection recentering, so
    the closed-loop gate isolates *detector* quality."""

    @nn.compact
    def __call__(self, x, train=False):
        return nn.Dense(2, name="d")(x)


def _centering_predictor():
    from wtracker_tpu.neural.config import IOConfig

    io = IOConfig(input_frames=[0, -2, -4], pred_frames=[3])
    k = np.zeros((4 * len(io.input_frames), 2), np.float32)
    k[2, 0] = 0.5  # w of the newest ring entry -> x displacement
    k[3, 1] = 0.5  # h -> y

    class P:
        pass

    p = P()
    p.model = _CenteringNet()
    p.variables = {"params": {"d": {"kernel": jnp.asarray(k), "bias": jnp.zeros(2, jnp.float32)}}}
    p.io_config = io
    return p


@pytest.fixture(scope="module")
def trained_detector():
    """The full recipe on rendered scene views; shared by the gate tests."""
    from wtracker_tpu.ops.image import letterbox
    from wtracker_tpu.sim.synthetic import SyntheticScene

    scene = SyntheticScene()
    view_hw = (99, 108)  # the live loop's camera at the test timing
    imgsz = 64
    rng = np.random.default_rng(0)
    N = 64
    worms = np.stack([rng.uniform(60, 540, N), rng.uniform(60, 440, N)], 1)
    offs = rng.uniform(-30, 30, size=(N, 2))
    cam_tls = worms - np.array([view_hw[1] / 2, view_hw[0] / 2]) + offs
    fidx = rng.integers(0, 400, N)

    views = scene.render_views(jnp.asarray(worms), jnp.asarray(cam_tls), view_hw, jnp.asarray(fidx))
    lb, (scale, pad_top, pad_left) = letterbox(views, (imgsz, imgsz))
    images = np.asarray(lb, np.float32)

    gtb = np.asarray(scene.gt_bboxes(jnp.asarray(worms)))  # xywh arena coords
    x0 = (gtb[:, 0] - cam_tls[:, 0]) * scale + pad_left
    y0 = (gtb[:, 1] - cam_tls[:, 1]) * scale + pad_top
    gt = np.stack([x0, y0, x0 + gtb[:, 2] * scale, y0 + gtb[:, 3] * scale], 1)[:, None, :].astype(
        np.float32
    )
    cls = np.zeros((N, 1), np.int32)
    mask = np.ones((N, 1), bool)

    model = YoloV8(nc=1, scale="n")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, imgsz, imgsz, 3), jnp.float32), train=False)
    cfg = RecipeConfig(
        epochs=40, batch=16, lr0=4e-3, warmup_epochs=2.0, close_mosaic=5,
        val_fraction=0.16, val_max_det=8, patience=40, seed=0,
        augment=AugmentConfig(),  # full reference-strength augmentation
    )
    run = YoloTrainingRun(model, variables, (imgsz, imgsz), cfg, n_train=N - 10)
    history = run.fit(images, gt, cls, mask, log=lambda s: None)
    return model, run.best_variables, history, scene


def test_recipe_reaches_val_map_bar(trained_detector):
    """GATE 1: the recipe must produce a measurably good detector
    (val mAP@0.5), not just a falling loss curve."""
    _, _, history, _ = trained_detector
    best = max(h.val_map50 for h in history)
    # the seeded fixture reaches 1.0 on CPU and TPU (rounds 3-4); 0.85 keeps
    # numeric headroom while still catching any regression that meaningfully
    # degrades detector quality (the round-3 0.60 bar could not — VERDICT r3
    # weak #7)
    assert best >= 0.85, f"best val mAP50 {best:.3f} < 0.85"


def test_closed_loop_tracks_within_margin_of_gt_baseline(trained_detector):
    """GATE 2: the trained detector must close the loop — mean bbox_error of
    the live YOLO run within +0.08 of the CsvController ground-truth-playback
    baseline on the same scenes, and the detections themselves must be tight
    (median center error < 4 px) with a usable hit rate."""
    from wtracker_tpu.eval.error_calculator import ErrorCalculator
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import (
        CycleLog,
        EngineParams,
        csv_controller,
        headless_frame_shape,
        logs_to_frame,
        run_engine,
        run_engine_streams,
    )
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_flat
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    from tests.synthetic import EXP_KWARGS, TIMING_KWARGS

    det_model, det_vars, _, scene = trained_detector
    exp = ExperimentConfig(**EXP_KWARGS)
    timing = TimingConfig(experiment_config=exp, **TIMING_KWARGS)
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))
    assert (params.cam_h, params.cam_w) == (99, 108)  # must match training views

    S = 2
    trajs = np.stack([make_trajectory(480, (500, 600), seed=100 + i) for i in range(S)])
    cfg = LiveLoopConfig(imgsz=(64, 64), conf=0.1, ring_size=32, log_mode=True, max_dist_per_pred=30.0)
    ctl = make_stream_batch_flat(
        params, cfg, scene, trajs, det_model, det_vars, _centering_predictor()
    )
    n_cycles = params.n_logged_cycles(480)
    logs = run_engine_streams(params, ctl, np.tile([exp.init_position], (S, 1)), n_cycles,
                              batched_controller=True)

    raw_boxes = np.asarray(logs.worm_bboxes)  # NaN where no detection
    hit_rate = np.isfinite(raw_boxes).all(-1).mean()
    assert hit_rate >= 0.5, f"detection hit rate {hit_rate:.2f}"

    live_err, center_err = [], []
    for i in range(S):
        df = logs_to_frame(params, CycleLog(positions=logs.positions[:, i],
                                            worm_bboxes=logs.worm_bboxes[:, i]))
        wrm = df[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(float)
        mic = df[["mic_x", "mic_y", "mic_w", "mic_h"]].to_numpy(float)
        live_err.append(np.nanmean(ErrorCalculator.calculate_bbox_error(wrm, mic)))

        boxes = raw_boxes[:, i].reshape(-1, 4)
        ok = np.isfinite(boxes).all(1)
        centers = boxes[ok, :2] + boxes[ok, 2:] / 2
        gt_pos = trajs[i][: len(boxes)][ok]
        center_err.append(np.median(np.hypot(*(centers - gt_pos).T)))

    base_err = []
    for i in range(S):
        table = np.asarray(scene.gt_bboxes(jnp.asarray(trajs[i])))
        logsc = run_engine(params, csv_controller(table, params), exp.init_position, n_cycles)
        dfc = logs_to_frame(params, logsc)
        wrm = dfc[["wrm_x", "wrm_y", "wrm_w", "wrm_h"]].to_numpy(float)
        mic = dfc[["mic_x", "mic_y", "mic_w", "mic_h"]].to_numpy(float)
        base_err.append(np.nanmean(ErrorCalculator.calculate_bbox_error(wrm, mic)))

    for i in range(S):
        assert center_err[i] < 4.0, f"stream {i}: median center error {center_err[i]:.1f} px"
        assert live_err[i] <= base_err[i] + 0.08, (
            f"stream {i}: live bbox_error {live_err[i]:.3f} vs baseline {base_err[i]:.3f}"
        )


def test_detect_multi_finds_both_worms(trained_detector):
    """GATE 3: multi-worm inference through the general NMS — two composited
    worms in one view must both come back from ``detect_multi``."""
    from wtracker_tpu.models.yolov8 import YoloV8Detector
    from wtracker_tpu.sim.synthetic import SyntheticScene

    det_model, det_vars, _, scene = trained_detector
    # the gate detector trains on single-worm views and scores a secondary
    # instance lower (~0.06 vs ~0.4); the NMS-path contract under test is
    # localization + suppression, so the score floor sits below that
    det = YoloV8Detector(model=det_model, variables=det_vars, imgsz=(64, 64), conf=0.04)

    cam_tl = jnp.asarray([200.0, 200.0])
    worms = [np.array([230.0, 230.0]), np.array([280.0, 260.0])]
    views = [
        np.asarray(scene.render_view(jnp.asarray(w), cam_tl, (99, 108), 7)) for w in worms
    ]
    frame = np.maximum(views[0], views[1])[None]  # two worms, one view

    boxes, scores, valid = det.detect_multi(frame, max_det=5, iou=0.5)
    boxes, valid = np.asarray(boxes)[0], np.asarray(valid)[0]
    assert valid.sum() >= 2, f"only {valid.sum()} detections"

    for w in worms:
        expect = w - np.asarray(cam_tl)  # view coords
        centers = boxes[valid, :2] + boxes[valid, 2:] / 2
        d = np.hypot(*(centers - expect).T).min()
        assert d < 6.0, f"worm at {expect} missed (nearest detection {d:.1f} px)"


def test_compact_uint8_storage_matches_f32_pipeline(tmp_path):
    """Compact (N,H,W)-uint8 dataset storage (the deployment-scale memory
    form, 12x smaller on device) trains to the same weights as the classic
    (N,H,W,3)-f32 pipeline — the only difference is XLA lowering the on-device
    /255 as a reciprocal multiply (1 input ulp), so weights after one epoch
    agree to f32-noise tolerance (measured 4e-5; divergence compounds per
    optimizer step, so the bound is one-epoch)."""
    from wtracker_tpu.neural.yolo_recipe import load_yolo_dataset

    rng = np.random.default_rng(0)
    N, S = 10, 64
    gray = rng.integers(0, 255, (N, S, S), dtype=np.uint8)
    f32 = np.repeat(gray[..., None], 3, -1).astype(np.float32) / 255.0
    gt = np.tile([[10.0, 10.0, 30.0, 30.0]], (N, 2, 1)).astype(np.float32)
    cls = np.zeros((N, 2), np.int32)
    mask = np.ones((N, 2), bool)
    cfg = RecipeConfig(epochs=1, batch=4, val_fraction=0.0, close_mosaic=0,
                       augment=AugmentConfig(mosaic=0.5))
    model = YoloV8(nc=1, scale="n")
    var = model.init(jax.random.PRNGKey(0), jnp.zeros((1, S, S, 3), jnp.float32), train=False)

    params = {}
    for name, imgs in [("f32", f32), ("u8", gray)]:
        run = YoloTrainingRun(model, jax.tree.map(np.copy, var), (S, S), cfg, n_train=N)
        run.fit(imgs, gt, cls, mask, log=lambda *a: None)
        params[name] = jax.tree.map(np.asarray, run.params)
    for a, b in zip(jax.tree.leaves(params["f32"]), jax.tree.leaves(params["u8"])):
        np.testing.assert_allclose(a, b, atol=2e-4)

    # and the loader's gray_uint8 form is exactly its f32 form re-expanded
    import cv2 as cv

    (tmp_path / "im").mkdir(); (tmp_path / "lb").mkdir()
    for i in range(3):
        cv.imwrite(str(tmp_path / "im" / f"a{i}.png"),
                   rng.integers(0, 255, (40, 56), dtype=np.uint8))
        (tmp_path / "lb" / f"a{i}.txt").write_text("0 0.5 0.5 0.2 0.2\n")
    imgs8, gt8, cls8, m8 = load_yolo_dataset(str(tmp_path / "im"), str(tmp_path / "lb"), 64,
                                             gray_uint8=True)
    imgsf, gtf, clsf, mf = load_yolo_dataset(str(tmp_path / "im"), str(tmp_path / "lb"), 64)
    assert imgs8.dtype == np.uint8 and imgs8.shape == (3, 64, 64)
    np.testing.assert_array_equal(
        np.repeat(imgs8[..., None], 3, -1).astype(np.float32) / 255.0, imgsf
    )
    np.testing.assert_array_equal(gt8, gtf)
