"""Gates on the TRAINED deployed-configuration detector (s/416).

Round-4 verdict: every trained-accuracy gate ran at nano/64 and every s/416
gate ran random weights — the deployed configuration never existed as a
trained artifact.  These gates close that: they load the natively trained
checkpoint committed at ``models/yolov8s_worm416.npz`` (produced by
``workflows/yolo_training.py`` on the synthetic deployment-scale dataset,
``tools/make_synthetic_dataset.py`` — training record in PARITY.md) and gate

1. detection quality on a HELD-OUT freshly rendered set (seed disjoint from
   training) at the deployed s/416 configuration,
2. int8 PTQ drift of the trained magnitudes (the round-4 gate ran random
   weights — PTQ error on trained weight/activation distributions is the
   question that matters),
3. closed-loop tracking with the trained detector driving the live engine at
   the deployment camera geometry (the reference's deployed premise:
   /root/reference/wtracker/sim/sim_controllers/yolo_controller.py:27-31).

The whole file auto-skips while the checkpoint is absent, and honors the
WTRACKER_FLAGSHIP=0 opt-out (these are s/416 graphs — minutes on a 1-core
CPU box, seconds on the TPU). tools/run_gates.py runs them for the committed
GATES.json record.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "yolov8s_worm416.npz")

pytestmark = [
    pytest.mark.skipif(not os.path.exists(CKPT), reason="trained s/416 checkpoint absent"),
    pytest.mark.skipif(
        os.environ.get("WTRACKER_FLAGSHIP", "1") in ("", "0"),
        reason="flagship-scale (s/416) gates disabled by WTRACKER_FLAGSHIP=0",
    ),
]

IMGSZ = (416, 416)


@pytest.fixture(scope="module")
def trained():
    from wtracker_tpu.models.yolov8 import YoloV8Detector

    det = YoloV8Detector.load(CKPT, imgsz=IMGSZ)
    assert det.model.scale == "s"
    return det


@pytest.fixture(scope="module")
def heldout_set():
    """24 freshly rendered labeled images, seed disjoint from training (the
    training dataset generator ran with --seed 7; this renders with 12345)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_synthetic_dataset as msd

    rng = np.random.default_rng(12345)
    images, gts, masks = [], [], []
    max_gt = 4
    for i in range(24):
        scene_exact = rng.uniform() < 0.5
        hw = (360, 360) if scene_exact else msd.DEFAULT_GEOMETRIES[
            int(rng.integers(1, len(msd.DEFAULT_GEOMETRIES)))
        ]
        img, boxes = msd.render_image(rng, hw, scene_exact)
        # letterbox to the gate geometry with the training loader's math
        import cv2 as cv

        sh, sw = img.shape
        scale = min(IMGSZ[0] / sh, IMGSZ[1] / sw)
        nh, nw = round(sh * scale), round(sw * scale)
        pt, pl = (IMGSZ[0] - nh) // 2, (IMGSZ[1] - nw) // 2
        canvas = np.full(IMGSZ, 114, np.uint8)
        canvas[pt : pt + nh, pl : pl + nw] = cv.resize(img, (nw, nh)) if (nh, nw) != (sh, sw) else img
        gt = np.zeros((max_gt, 4), np.float32)
        mask = np.zeros((max_gt,), bool)
        for j, (x0, y0, x1, y1) in enumerate(boxes[:max_gt]):
            gt[j] = (x0 * scale + pl, y0 * scale + pt, x1 * scale + pl, y1 * scale + pt)
            mask[j] = True
        images.append(np.repeat(canvas[..., None], 3, -1).astype(np.float32) / 255.0)
        gts.append(gt)
        masks.append(mask)
    return np.stack(images), np.stack(gts), np.stack(masks)


def test_trained_map50_heldout(trained, heldout_set):
    """AP@0.5 on the held-out render distribution — the deployed detector must
    actually detect. (The full-val mAP of the training run is recorded in
    PARITY.md; this 24-image probe keeps the gate CPU-affordable.)"""
    from wtracker_tpu.neural.yolo_recipe import evaluate_map50

    images, gt, mask = heldout_set
    ap = evaluate_map50(
        trained.model, trained.variables, images, gt, mask, IMGSZ,
        conf=0.001, iou=0.7, max_det=8,
    )
    assert ap >= 0.80, f"held-out AP@0.5 {ap:.3f} < 0.80"


def test_trained_int8_drift(trained):
    """int8 PTQ on the TRAINED magnitudes: top-1 agreement with the bf16
    serving path on rendered deployment views (the round-4 random-weight gate,
    re-based on the artifact that ships)."""
    from wtracker_tpu.models.yolov8 import YoloV8, detect_top1, fuse_conv_bn
    from wtracker_tpu.models.yolov8_int8 import make_detect_fns, quantize_detector
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    model = YoloV8(nc=1, scale="s", compute_dtype=jnp.bfloat16, fused=True)
    variables = fuse_conv_bn(trained.variables)

    scene = SyntheticScene()
    traj = make_trajectory(64, (1400, 1600), seed=21)
    xy = jnp.asarray(traj[:48], jnp.float32)
    tls = jnp.clip(xy - 180, 0, jnp.asarray([1600 - 360, 1400 - 360], jnp.float32))
    views = np.asarray(scene.render_views(xy, tls, (360, 360), jnp.arange(48)), np.float32)

    q = quantize_detector(model, variables, views[:32], IMGSZ)
    qw = q.device_weights()
    detect_int8, _ = make_detect_fns(q, src_hw=(360, 360), imgsz=IMGSZ)

    frames = jnp.asarray(views[32:], jnp.float32)
    ref = np.asarray(detect_top1(model, variables, frames, IMGSZ, 0.0))
    got = np.asarray(detect_int8(model, qw, frames, IMGSZ, 0.0))

    assert got.shape == ref.shape == (16, 4) and np.isfinite(got).all()
    drift = np.hypot(*((ref[:, :2] + ref[:, 2:] / 2) - (got[:, :2] + got[:, 2:] / 2)).T)
    assert np.median(drift) <= 1.0, f"median top-1 center drift {np.median(drift):.2f} px"
    assert (drift < 8.0).mean() >= 0.75, f"only {(drift < 8.0).mean():.2f} of views within 8 px"


def test_trained_closed_loop_tracking(trained):
    """The trained detector driving the live loop at deployment geometry
    (360 px camera, reference exp0 timing) keeps the worm centered: detections
    land on the ground truth and the platform tracks it."""
    from wtracker_tpu.models.resmlp import load_torch_checkpoint, make_rmlp_predictor
    from wtracker_tpu.models.yolov8 import YoloV8, fuse_conv_bn
    from wtracker_tpu.neural.config import IOConfig
    from wtracker_tpu.sim.config import ExperimentConfig, TimingConfig
    from wtracker_tpu.sim.engine import EngineParams, headless_frame_shape, run_engine_streams
    from wtracker_tpu.sim.engine_live import LiveLoopConfig, make_stream_batch_fused
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    exp = ExperimentConfig("gate", 400, 60, (1400, 1600), 90, (700, 700))
    timing = TimingConfig(
        experiment_config=exp, imaging_time_ms=200.0, pred_time_ms=40.0, moving_time_ms=50.0,
        camera_size_mm=(4.0, 4.0), micro_size_mm=(0.32, 0.32),
    )
    params = EngineParams.from_timing(timing, headless_frame_shape(timing, exp.orig_resolution))

    model = YoloV8(nc=1, scale="s", compute_dtype=jnp.bfloat16, fused=True)
    variables = fuse_conv_bn(trained.variables)

    resmlp = "/root/reference/models/ResMLP(imaging-200ms_pred-40ms_moving-50ms).pt"
    predictor = (
        load_torch_checkpoint(resmlp, reference_root="/root/reference")
        if os.path.exists(resmlp)
        else make_rmlp_predictor(IOConfig([0, -3, -6, -9, -12], [3]))
    )

    # lean shapes: the suite runs this on the CPU mesh (conftest pins cpu),
    # where every s/416 forward costs ~a second per view on a 1-core box
    S, n_cycles = 1, 6
    trajs = np.stack([make_trajectory(400, (1400, 1600), seed=30 + i) for i in range(S)])
    cfg = LiveLoopConfig(
        imgsz=IMGSZ, conf=0.1, ring_size=64, log_mode=True, max_dist_per_pred=54.0,
    )
    ctl = make_stream_batch_fused(
        params, cfg, SyntheticScene(), trajs, model, variables, predictor
    )
    logs = run_engine_streams(
        params, ctl, np.tile([700, 700], (S, 1)), n_cycles,
        batched_controller=True, delayed_log=True,
    )

    pos = np.asarray(logs.positions, float)  # (C, S, L, 2)
    wrm = np.asarray(logs.worm_bboxes, float)  # (C, S, L, 4)
    # ground truth at each logged frame
    L = params.cycle_n
    fidx = (np.arange(n_cycles)[:, None] * L + np.arange(L)[None, :]).reshape(-1)
    gt = trajs[:, fidx, :].reshape(S, n_cycles, L, 2).transpose(1, 0, 2, 3)

    det_ok = np.isfinite(wrm).all(axis=-1)
    assert det_ok.mean() >= 0.95, f"detection rate {det_ok.mean():.2f} < 0.95"
    centers = wrm[..., :2] + wrm[..., 2:] / 2
    err = np.hypot(*(centers - gt).transpose(3, 0, 1, 2))[det_ok]
    assert np.median(err) <= 4.0, f"median detection error {np.median(err):.1f} px"

    # tracking quality: skip the warmup cycles (ring fills, MLP engages), then
    # the worm must stay well inside the camera view around the platform
    dev = np.hypot(*(gt[3:] - pos[3:]).transpose(3, 0, 1, 2))
    cam_half = params.cam_w / 2  # 180 px
    assert (dev < cam_half).mean() >= 0.95, f"worm left the camera in {(dev >= cam_half).mean():.2%} of frames"
    assert np.median(dev) <= 60.0, f"median worm deviation {np.median(dev):.1f} px"
