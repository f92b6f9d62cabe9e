"""General NMS tests."""

import numpy as np

from wtracker_tpu.ops.nms import nms


def test_nms_suppresses_overlaps():
    import jax.numpy as jnp

    boxes = jnp.array(
        [
            [0, 0, 10, 10],
            [1, 1, 11, 11],  # overlaps #0 heavily
            [50, 50, 60, 60],
            [100, 100, 105, 105],
        ],
        dtype=jnp.float32,
    )
    scores = jnp.array([0.9, 0.85, 0.8, 0.05], dtype=jnp.float32)

    out_boxes, out_scores, valid = nms(boxes, scores, 0.45, 0.1, 3)
    out_boxes, out_scores, valid = map(np.asarray, (out_boxes, out_scores, valid))

    assert valid.tolist() == [True, True, False]  # 0 kept, 1 suppressed, 2 kept, 3 below conf
    np.testing.assert_allclose(out_boxes[0], [0, 0, 10, 10])
    np.testing.assert_allclose(out_boxes[1], [50, 50, 60, 60])
    np.testing.assert_allclose(out_scores[:2], [0.9, 0.8])


def test_nms_empty():
    import jax.numpy as jnp

    boxes = jnp.zeros((5, 4), jnp.float32)
    scores = jnp.zeros((5,), jnp.float32)
    _, _, valid = nms(boxes, scores, 0.45, 0.1, 4)
    assert not np.asarray(valid).any()
