"""YOLO-port hardening (VERDICT round-1 item 5).

1. The ultralytics YOLOv8s *state-dict key manifest* is derived here
   independently from the public architecture definition (ultralytics
   nn/modules: Conv=conv+bn, C2f=cv1/cv2/m.i, SPPF=cv1/cv2, Detect=cv2/cv3/dfl)
   — NOT from our port code. ``port_state_dict`` must consume exactly these
   keys (modulo the keys it deliberately ignores) and produce a tree that
   matches our Flax model's own init, shape for shape.

2. Our letterbox is pinned against a host oracle implementing ultralytics'
   LetterBox conventions verbatim (pad value 114, center split with the
   round(x∓0.1) tie-break, python-round new_unpad, cv2 INTER_LINEAR).

What cannot be tested without the missing LFS blobs
(/root/reference/.MISSING_LARGE_BLOBS:6-7): true end-to-end IoU vs the
reference's *trained* yolov8s weights. The manifest pins the naming/shape
contract; tests/test_yolov8.py pins the architecture math against an
independent torch implementation.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


# -- the independent manifest -------------------------------------------------
# (module-layout spec of ultralytics yolov8s, depth 0.33 / width 0.50, nc=1)

W = {64: 32, 128: 64, 256: 128, 512: 256, 1024: 512}  # width-scaled channels


def _conv_keys(prefix, c1, c2, k):
    return {
        f"{prefix}.conv.weight": (c2, c1, k, k),
        f"{prefix}.bn.weight": (c2,),
        f"{prefix}.bn.bias": (c2,),
        f"{prefix}.bn.running_mean": (c2,),
        f"{prefix}.bn.running_var": (c2,),
        f"{prefix}.bn.num_batches_tracked": (),
    }


def _c2f_keys(prefix, c1, c2, n):
    c = c2 // 2
    keys = {}
    keys.update(_conv_keys(f"{prefix}.cv1", c1, 2 * c, 1))
    keys.update(_conv_keys(f"{prefix}.cv2", (2 + n) * c, c2, 1))
    for i in range(n):
        keys.update(_conv_keys(f"{prefix}.m.{i}.cv1", c, c, 3))
        keys.update(_conv_keys(f"{prefix}.m.{i}.cv2", c, c, 3))
    return keys


def _sppf_keys(prefix, c1, c2):
    c = c1 // 2
    keys = {}
    keys.update(_conv_keys(f"{prefix}.cv1", c1, c, 1))
    keys.update(_conv_keys(f"{prefix}.cv2", c * 4, c2, 1))
    return keys


def ultralytics_v8s_manifest(nc=1):
    """Every state-dict key (+shape) of an ultralytics yolov8s DetectionModel."""
    m = {}
    m.update(_conv_keys("model.0", 3, W[64], 3))
    m.update(_conv_keys("model.1", W[64], W[128], 3))
    m.update(_c2f_keys("model.2", W[128], W[128], 1))
    m.update(_conv_keys("model.3", W[128], W[256], 3))
    m.update(_c2f_keys("model.4", W[256], W[256], 2))
    m.update(_conv_keys("model.5", W[256], W[512], 3))
    m.update(_c2f_keys("model.6", W[512], W[512], 2))
    m.update(_conv_keys("model.7", W[512], W[1024], 3))
    m.update(_c2f_keys("model.8", W[1024], W[1024], 1))
    m.update(_sppf_keys("model.9", W[1024], W[1024]))
    # (10 Upsample, 11 Concat, 13 Upsample, 14 Concat, 17, 20 Concat: no params)
    m.update(_c2f_keys("model.12", W[512] + W[1024], W[512], 1))
    m.update(_c2f_keys("model.15", W[256] + W[512], W[256], 1))
    m.update(_conv_keys("model.16", W[256], W[256], 3))
    m.update(_c2f_keys("model.18", W[256] + W[512], W[512], 1))
    m.update(_conv_keys("model.19", W[512], W[512], 3))
    m.update(_c2f_keys("model.21", W[512] + W[1024], W[1024], 1))

    # Detect head over P3/P4/P5 = (128, 256, 512) scaled channels
    ch = (W[256], W[512], W[1024])
    reg4 = 16 * 4
    c2 = max(16, ch[0] // 4, reg4)
    c3 = max(ch[0], min(nc, 100))
    for i, c_in in enumerate(ch):
        m.update(_conv_keys(f"model.22.cv2.{i}.0", c_in, c2, 3))
        m.update(_conv_keys(f"model.22.cv2.{i}.1", c2, c2, 3))
        m[f"model.22.cv2.{i}.2.weight"] = (reg4, c2, 1, 1)
        m[f"model.22.cv2.{i}.2.bias"] = (reg4,)
        m.update(_conv_keys(f"model.22.cv3.{i}.0", c_in, c3, 3))
        m.update(_conv_keys(f"model.22.cv3.{i}.1", c3, c3, 3))
        m[f"model.22.cv3.{i}.2.weight"] = (nc, c3, 1, 1)
        m[f"model.22.cv3.{i}.2.bias"] = (nc,)
    m["model.22.dfl.conv.weight"] = (1, 16, 1, 1)
    return m


class _TrackingDict(dict):
    """Records which keys the port actually reads."""

    def __init__(self, *a, **k):
        super().__init__(*a, **k)
        self.touched = set()

    def __getitem__(self, key):
        self.touched.add(key)
        return super().__getitem__(key)

    def __contains__(self, key):
        return super().__contains__(key)


def test_port_consumes_exact_ultralytics_manifest():
    from wtracker_tpu.models.yolo_port import port_state_dict

    manifest = ultralytics_v8s_manifest(nc=1)
    rng = np.random.default_rng(0)
    sd = _TrackingDict({k: rng.normal(size=s).astype(np.float32) for k, s in manifest.items()})

    variables = port_state_dict(sd, prefix="model.")

    untouched = set(sd) - sd.touched
    # the port must read EVERY key except the ones it deliberately ignores:
    # BN bookkeeping counters and the fixed DFL expectation conv (our decode
    # computes the expectation arithmetically).
    allowed_ignored = {k for k in sd if k.endswith("num_batches_tracked")} | {"model.22.dfl.conv.weight"}
    assert untouched <= allowed_ignored, f"unported weights: {sorted(untouched - allowed_ignored)[:8]}"

    # ...and the resulting tree must match our model's init exactly
    from wtracker_tpu.models.yolov8 import YoloV8

    model = YoloV8(nc=1, scale="s")
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    ported_shapes = jax.tree.map(lambda x: tuple(x.shape), variables)
    init_shapes = jax.tree.map(lambda x: tuple(x.shape), ref)
    assert ported_shapes == init_shapes


def test_port_handles_full_pickle_prefix():
    from wtracker_tpu.models.yolo_port import port_state_dict

    manifest = ultralytics_v8s_manifest(nc=1)
    rng = np.random.default_rng(1)
    sd = {f"model.{k}": rng.normal(size=s).astype(np.float32) for k, s in manifest.items()}
    variables = port_state_dict(sd, prefix="model.model.")
    assert "b0" in variables["params"] and "head" in variables["params"]


# -- letterbox golden fixtures -------------------------------------------------


def _ultralytics_letterbox_oracle(img: np.ndarray, new_shape: tuple[int, int]):
    """Verbatim host reimplementation of ultralytics LetterBox conventions
    (augment.py): scaleup allowed, auto=False, pad 114, center placement with
    the round(x-0.1)/round(x+0.1) split."""
    import cv2

    shape = img.shape[:2]
    r = min(new_shape[0] / shape[0], new_shape[1] / shape[1])
    new_unpad = round(shape[1] * r), round(shape[0] * r)
    dw, dh = new_shape[1] - new_unpad[0], new_shape[0] - new_unpad[1]
    dw /= 2
    dh /= 2
    if shape[::-1] != new_unpad:
        img = cv2.resize(img, new_unpad, interpolation=cv2.INTER_LINEAR)
    top, bottom = int(round(dh - 0.1)), int(round(dh + 0.1))
    left, right = int(round(dw - 0.1)), int(round(dw + 0.1))
    img = cv2.copyMakeBorder(img, top, bottom, left, right, cv2.BORDER_CONSTANT, value=(114, 114, 114))
    return img, r, (top, left)


@pytest.mark.parametrize("src_hw,dst", [((99, 108), 384), ((360, 360), 416), ((101, 117), 384), ((55, 131), 416)])
def test_letterbox_matches_ultralytics_conventions(src_hw, dst):
    from wtracker_tpu.ops.image import letterbox

    rng = np.random.default_rng(sum(src_hw) + dst)
    img = rng.integers(0, 255, size=src_hw, dtype=np.uint8)

    ours, (scale, pad_top, pad_left) = letterbox(jnp.asarray(img[None]), (dst, dst))
    oracle, r, (top, left) = _ultralytics_letterbox_oracle(img, (dst, dst))

    # geometry parity: scale and center offsets agree with ultralytics
    assert np.isclose(scale, r)
    assert (pad_top, pad_left) == (top, left)

    got = np.asarray(ours[0, :, :, 0])
    assert got.shape == oracle.shape

    # pixel parity vs the uint8 pipeline is bounded by ultralytics' own
    # mid-pipeline quantization (cv2.resize emits uint8, computed with 11-bit
    # fixed-point weights, before normalize); we deliberately keep float
    # precision, so the gap is bounded by one uint8 quantum
    oracle_norm = oracle.astype(np.float32) / 255.0
    assert np.abs(got - oracle_norm).max() <= 1.0 / 255.0

    # the interpolation weights themselves are exact: against a float oracle
    # (same resize, no uint8 rounding) the outputs agree to float eps
    import cv2

    r_ = min(dst / src_hw[0], dst / src_hw[1])
    new_unpad = round(src_hw[1] * r_), round(src_hw[0] * r_)
    float_resized = cv2.resize(img.astype(np.float32) / 255.0, new_unpad, interpolation=cv2.INTER_LINEAR)
    inner = got[pad_top : pad_top + new_unpad[1], pad_left : pad_left + new_unpad[0]]
    assert np.abs(inner - float_resized).max() < 1e-5

    assert np.abs(np.asarray(ours[0]) - np.asarray(ours[0, :, :, :1])).max() == 0  # channels identical


# -- the inverse port (export) ------------------------------------------------


def test_export_state_dict_round_trip():
    """Flax → ultralytics layout → Flax must be the identity, and the emitted
    key set must be the exact independent manifest."""
    from wtracker_tpu.models.yolo_port import export_state_dict, port_state_dict
    from wtracker_tpu.models.yolov8 import YoloV8

    model = YoloV8(nc=1, scale="s")
    variables = model.init(jax.random.PRNGKey(7), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False)

    sd = export_state_dict(variables)
    manifest = ultralytics_v8s_manifest(nc=1)
    assert set(sd) == set(manifest), (
        sorted(set(manifest) - set(sd))[:5], sorted(set(sd) - set(manifest))[:5]
    )
    for k, shape in manifest.items():
        assert tuple(sd[k].shape) == shape, (k, sd[k].shape, shape)

    back = port_state_dict(sd, prefix="model.")
    flat_a = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, variables))
    flat_b = jax.tree_util.tree_leaves_with_path(jax.tree.map(np.asarray, back))
    assert len(flat_a) == len(flat_b)
    for (pa, va), (pb, vb) in zip(flat_a, flat_b):
        assert pa == pb
        np.testing.assert_array_equal(va, vb)


def test_export_refuses_fused_variables():
    from wtracker_tpu.models.yolo_port import export_state_dict
    from wtracker_tpu.models.yolov8 import YoloV8Detector

    det = YoloV8Detector.init_random(nc=1, scale="n", imgsz=(64, 64)).fuse()
    with pytest.raises(ValueError, match="unfused"):
        export_state_dict(det.variables)


def test_save_torch_state_dict_loads_back():
    """The .pt file written by the exporter must load through the existing
    ultralytics-checkpoint loader and detect identically."""
    import tempfile, os
    from wtracker_tpu.models.yolo_port import load_ultralytics_checkpoint, save_torch_state_dict
    from wtracker_tpu.models.yolov8 import YoloV8Detector

    det = YoloV8Detector.init_random(nc=1, scale="s", imgsz=(64, 64), conf=0.0, seed=3)
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "export.pt")
        save_torch_state_dict(det, path)
        back = load_ultralytics_checkpoint(path, imgsz=(64, 64), conf=0.0)

    rng = np.random.default_rng(0)
    frames = rng.integers(0, 255, size=(2, 64, 64), dtype=np.uint8)
    np.testing.assert_allclose(
        np.asarray(det.detect(frames)), np.asarray(back.detect(frames)), atol=1e-5
    )
