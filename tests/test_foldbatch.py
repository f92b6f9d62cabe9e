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


def test_unfold_shape_contract():
    x = jnp.zeros((7, 12, 9, 3))
    f = fold_batch(x, 2)
    assert f.shape == (1, 7 * 14, 9, 3)
    assert unfold_batch(f, 7, 12).shape == (7, 12, 9, 3)
    m = seam_mask(7, 12, 2, jnp.float32)
    assert m.shape == (7 * 14, 1, 1)
    assert float(m.sum()) == 7 * 12
