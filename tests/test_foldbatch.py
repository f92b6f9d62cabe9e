"""Batch→height folding (ops/foldbatch.py): bit-parity vs batched convs.

The folding exists purely to change XLA's layout choice for the detector's
early conv stages (docs/performance.md round 3); these tests pin the claim
that it is a lowering change only — every folded result must equal the plain
batched convolution exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wtracker_tpu.ops.foldbatch import fold_batch, seam_mask, unfold_batch


def _conv(x, kernel, stride):
    pad = kernel.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x,
        kernel,
        (stride, stride),
        ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("stride,seam", [(1, 1), (1, 2), (2, 2), (2, 4)])
def test_fold_single_conv_exact(stride, seam):
    rng = np.random.default_rng(0)
    b, h, w, cin, cout = 5, 16, 12, 8, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, cin)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.1, jnp.float32)

    ref = _conv(x, k, stride)
    out = unfold_batch(_conv(fold_batch(x, seam), k, stride), b, h // stride)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fold_chained_convs_with_bias_and_mask():
    """s2 → (mask) → s1 → (mask) → s1 chained while folded, with biased SiLU
    convs — the seam rows hold silu(bias) after each conv and must be
    re-zeroed before the next spatial op."""
    rng = np.random.default_rng(1)
    b, h, w = 4, 24, 20
    x = jnp.asarray(rng.standard_normal((b, h, w, 6)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 6, 8)) * 0.2, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((8,)), jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)) * 0.2, jnp.float32)

    def act(t, bias):
        return jax.nn.silu(t + bias)

    ref = act(_conv(x, k1, 2), b1)
    ref = act(_conv(ref, k2, 1), b2)
    ref = _conv(ref, k3, 1)

    f = fold_batch(x, 4)  # seam 4 at h → seam 2 after the stride-2 conv
    f = act(_conv(f, k1, 2), b1) * seam_mask(b, h // 2, 2, jnp.float32)
    f = act(_conv(f, k2, 1), b2) * seam_mask(b, h // 2, 2, jnp.float32)
    f = _conv(f, k3, 1)
    out = unfold_batch(f, b, h // 2)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_fold_residual_and_pointwise_need_no_mask():
    """1×1 convs, residual adds and channel concats are fold-oblivious."""
    rng = np.random.default_rng(2)
    b, h, w, c = 3, 10, 14, 8
    x = jnp.asarray(rng.standard_normal((b, h, w, c)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((1, 1, c, c)) * 0.3, jnp.float32)
    k3 = jnp.asarray(rng.standard_normal((3, 3, 2 * c, c)) * 0.1, jnp.float32)

    ref = jnp.concatenate([x, x + _conv(x, k1, 1)], axis=-1)
    ref = _conv(ref, k3, 1)

    f = fold_batch(x, 1)
    f = jnp.concatenate([f, f + _conv(f, k1, 1)], axis=-1)
    out = unfold_batch(_conv(f, k3, 1), b, h)

    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.fixture(scope="module")
def fused_nano_and_views():
    from wtracker_tpu.models.yolov8 import YoloV8, YoloV8Detector, fuse_conv_bn
    from wtracker_tpu.sim.synthetic import SyntheticScene, make_trajectory

    raw = YoloV8Detector.init_random(nc=1, scale="n", imgsz=(64, 64), compute_dtype=jnp.bfloat16, seed=3)
    model = YoloV8(nc=1, scale="n", compute_dtype=jnp.bfloat16, fused=True)
    variables = fuse_conv_bn(raw.variables)

    scene = SyntheticScene()
    traj = make_trajectory(64, (160, 160), seed=7)
    xy = jnp.asarray(traj[:12], jnp.float32)
    tls = jnp.clip(xy - 32, 0, 160 - 64).astype(jnp.float32)
    views = np.asarray(scene.render_views(xy, tls, (64, 64), jnp.arange(12)), np.float32)
    return model, variables, views


def test_batchfolded_bf16_walker_matches_plain(fused_nano_and_views):
    """The batch-folded bf16 post-stem graph must equal the plain walker —
    folding is a lowering change only."""
    from wtracker_tpu.models.yolov8 import stem_apply
    from wtracker_tpu.models.yolov8_int8 import forward_from_b0_bf16
    from wtracker_tpu.models.yolov8 import fold_stem_matrices

    model, variables, views = fused_nano_and_views
    folded = fold_stem_matrices((56, 56), (64, 64), dtype=jnp.bfloat16)
    assert folded is not None
    z = stem_apply(folded, variables["params"]["b0"]["conv"], jnp.asarray(views[:, :56, :56]))

    ref = forward_from_b0_bf16(variables, z, 1, "n", batch_fold=0)
    got = forward_from_b0_bf16(variables, z, 1, "n", batch_fold=8)
    for r, g in zip(list(ref[0]) + list(ref[1]), list(got[0]) + list(got[1])):
        r, g = np.asarray(r, np.float32), np.asarray(g, np.float32)
        tol = 0.02 * max(np.abs(r).max(), 1e-3)  # bf16 accumulation-order slack
        assert r.shape == g.shape
        assert np.abs(r - g).max() <= tol, f"batch-fold drift {np.abs(r - g).max()} > {tol}"


@pytest.mark.parametrize("seam", [8, 16])
def test_batchfolded_int8_apply_is_bit_exact(fused_nano_and_views, seam):
    """int8 arithmetic is deterministic: the batch-folded int8 forward must be
    BIT-identical to the plain int8 forward (any legal seam)."""
    from wtracker_tpu.models.yolov8 import preprocess_batch
    from wtracker_tpu.models.yolov8_int8 import quantize_detector

    model, variables, views = fused_nano_and_views
    q = quantize_detector(model, variables, views[:8], (64, 64))
    qw = q.device_weights()

    x, _ = preprocess_batch(jnp.asarray(views[8:]), (64, 64), dtype=jnp.bfloat16)
    ref = q.apply(qw, x)
    got = q.apply_batchfolded(qw, x, batch_fold=seam)
    for r, g in zip(list(ref[0]) + list(ref[1]), list(got[0]) + list(got[1])):
        np.testing.assert_array_equal(np.asarray(r, np.float32), np.asarray(g, np.float32))


def test_batchfolded_detect_fns_agree(fused_nano_and_views):
    """End-to-end: the engine-facing detect closures (bf16 + int8, folded stem
    + batch fold) return the same boxes as their plain counterparts."""
    from wtracker_tpu.models.yolov8 import make_folded_detect
    from wtracker_tpu.models.yolov8_int8 import make_detect_fns, quantize_detector

    model, variables, views = fused_nano_and_views
    v56 = jnp.asarray(views[:, :56, :56])

    plain = make_folded_detect(model, (56, 56), (64, 64))
    fold = make_folded_detect(model, (56, 56), (64, 64), batch_fold=8)
    b_plain = np.asarray(plain(None, variables, v56, None, 0.0))
    b_fold = np.asarray(fold(None, variables, v56, None, 0.0))
    np.testing.assert_allclose(b_fold, b_plain, atol=0.75)  # bf16 slack, sub-px

    q = quantize_detector(model, variables, np.asarray(views[:8, :56, :56]), (64, 64))
    qw = q.device_weights()
    di_plain, _ = make_detect_fns(q, src_hw=(56, 56), imgsz=(64, 64))
    di_fold, _ = make_detect_fns(q, src_hw=(56, 56), imgsz=(64, 64), batch_fold=8)
    np.testing.assert_array_equal(
        np.asarray(di_fold(None, qw, v56, None, 0.0)),
        np.asarray(di_plain(None, qw, v56, None, 0.0)),
    )

    # padded letterbox (no folded stem available): batch_fold must still apply
    # — through apply_batchfolded — and stay bit-exact vs the plain int8 path
    v48x56 = jnp.asarray(views[:, :48, :56])
    dp_plain, _ = make_detect_fns(q, src_hw=(48, 56), imgsz=(64, 64))
    dp_fold, _ = make_detect_fns(q, src_hw=(48, 56), imgsz=(64, 64), batch_fold=8)
    np.testing.assert_array_equal(
        np.asarray(dp_fold(None, qw, v48x56, (64, 64), 0.0)),
        np.asarray(dp_plain(None, qw, v48x56, (64, 64), 0.0)),
    )


def test_unfold_shape_contract():
    x = jnp.zeros((7, 12, 9, 3))
    f = fold_batch(x, 2)
    assert f.shape == (1, 7 * 14, 9, 3)
    assert unfold_batch(f, 7, 12).shape == (7, 12, 9, 3)
    m = seam_mask(7, 12, 2, jnp.float32)
    assert m.shape == (7 * 14, 1, 1)
    assert float(m.sum()) == 7 * 12
