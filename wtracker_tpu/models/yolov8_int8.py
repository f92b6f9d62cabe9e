"""Post-training int8 inference path for the YOLOv8 detector.

The v5e MXU runs s8×s8→s32 at twice the bf16 rate, and the early C2f stages
are HBM-bandwidth-bound (docs/performance.md round 3) — halving activation
bytes attacks exactly that roofline. Measured on the hot shapes the fused
int8 chain is 1.45-1.74× the bf16 one; end-to-end the closed loop runs
10,229 vs 7,624 steps/s (1.34×, bench.py's ``int8`` field).

Scheme (standard symmetric PTQ, TPU-shaped):

- **weights**: per-output-channel symmetric int8. Before quantization each
  kernel is folded with its *input* activation scales (``W' = W · s_in[ic]``)
  so per-channel input scales — which arise naturally when int8 tensors with
  different scales are concatenated (C2f, SPPF, PAN) — cost nothing at
  runtime: the contraction absorbs them.
- **activations**: per-tensor symmetric scales calibrated by an abs-max
  forward over a calibration batch. The int8 tensor is the inter-op currency;
  concat/max-pool/nearest-upsample run directly on int8 (scale-preserving),
  residual adds and SiLU go through bf16 inside the conv epilogue and
  requantize — XLA fuses the whole epilogue into the convolution, so no s32
  or bf16 intermediate ever hits HBM (the round-2 attempt materialized the
  s32 accumulator and got only 1.27×).
- **head logits** stay bf16; decode/NMS are unchanged
  (:func:`wtracker_tpu.models.yolov8.decode_top1`).

All scales are baked as compile-time constants; the quantized weights ride in
a flat dict of jit arguments. The forward topology is written once
(``_forward``) and driven by three "ops" engines — calibrate (bf16 + abs-max
recording), build (host-side scale propagation + weight quantization), and
apply (the int8 graph) — so the three phases cannot drift apart.

Reference parity: this is a deployment-form optimization of the same
detector the reference runs through ultralytics (yolo_controller.py:72-78);
accuracy is gated by tests/test_yolov8_int8.py (top-1 box agreement vs the
bf16 forward).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.models.yolov8 import (
    SCALES,
    YoloV8,
    _make_divisible,
    _silu,
    decode_top1,
    letterbox_params,
    preprocess_batch,
    top1_source_boxes,
)


def _conv_s8(x, w, stride=1):
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def _conv_bf16(x, w, stride=1):
    pad = w.shape[0] // 2
    return jax.lax.conv_general_dilated(
        x, w, (stride, stride), ((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.bfloat16,
    )


def _quant(y_bf16, scale: float):
    q = jnp.round(y_bf16.astype(jnp.float32) * np.float32(1.0 / scale))
    return jnp.clip(q, -127, 127).astype(jnp.int8)


class _CalibOps:
    """bf16 forward over the fused variables, recording per-point abs-max.

    With ``record=False`` this doubles as a plain (jit-safe) bf16 walker
    forward (:func:`forward_bf16_reference`).
    """

    def __init__(self, params: dict, record: bool = True):
        self.params = params
        self.record = record
        self.absmax: dict[str, float] = {}

    def _rec(self, name, y):
        if not self.record:
            return
        self.absmax[name] = max(self.absmax.get(name, 0.0), float(jnp.max(jnp.abs(y))))

    def input(self, x):
        self._rec("__input__", x)
        return x.astype(jnp.bfloat16)

    def _wb(self, name):
        node = self.params
        for part in name.split("."):
            node = node[part]
        if "conv" in node:  # ConvBN blocks nest the conv; head finals don't
            node = node["conv"]
        return node["kernel"].astype(jnp.bfloat16), node["bias"].astype(jnp.bfloat16)

    def convbn(self, name, x, stride=1):
        w, b = self._wb(name)
        y = _silu(_conv_bf16(x, w, stride) + b)
        self._rec(name, y)
        return y

    def plain_conv(self, name, x):
        w, b = self._wb(name)
        return _conv_bf16(x, w) + b  # logits stay bf16: no quant point

    def add(self, name, a, b):
        y = a + b
        self._rec(name, y)
        return y

    def concat(self, parts):
        return jnp.concatenate(parts, axis=-1)

    def split2(self, x, c):
        return x[..., :c], x[..., c:]

    def maxpool(self, x, k=5):
        import flax.linen as nn

        return nn.max_pool(x, (k, k), strides=(1, 1), padding=((k // 2, k // 2),) * 2)

    def upsample(self, x):
        n, h, w, c = x.shape
        return jax.image.resize(x, (n, h * 2, w * 2, c), method="nearest")

class _ScaleVec:
    """Build-phase value: per-channel activation scales of an int8 tensor."""

    def __init__(self, scales: np.ndarray):
        self.scales = np.asarray(scales, np.float32)  # (C,)

    @property
    def shape(self):  # channel count only — build phase has no spatial data
        return (len(self.scales),)


class _BuildOps:
    """Propagate scales host-side; fold + quantize every conv kernel."""

    def __init__(self, params: dict, absmax: dict[str, float]):
        self.params = params
        self.absmax = absmax
        self.qweights: dict[str, dict[str, np.ndarray]] = {}

    def _scale_of(self, name) -> float:
        # guard against a dead calibration point (all-zero activations)
        return max(self.absmax[name], 1e-6) / 127.0

    def input(self, x: _ScaleVec):
        s = self._scale_of("__input__")
        return _ScaleVec(np.full(x.shape[0], s))

    def _wb(self, name):
        node = self.params
        for part in name.split("."):
            node = node[part]
        if "conv" in node:
            node = node["conv"]
        return np.asarray(node["kernel"], np.float32), np.asarray(node["bias"], np.float32)

    def _fold_quant(self, name, s_in: np.ndarray):
        w, b = self._wb(name)  # (k, k, ic, oc), (oc,)
        w = w * s_in[None, None, :, None]  # absorb per-input-channel scales
        sw = np.maximum(np.abs(w).max(axis=(0, 1, 2)), 1e-12) / 127.0  # (oc,)
        wq = np.clip(np.round(w / sw[None, None, None, :]), -127, 127).astype(np.int8)
        self.qweights[name] = {"w": wq, "sw": sw.astype(np.float32), "b": b.astype(np.float32)}
        return w.shape[3]

    def convbn(self, name, x: _ScaleVec, stride=1):
        oc = self._fold_quant(name, x.scales)
        return _ScaleVec(np.full(oc, self._scale_of(name)))

    def plain_conv(self, name, x: _ScaleVec):
        oc = self._fold_quant(name, x.scales)
        return _ScaleVec(np.zeros(oc))  # bf16 logits: scale unused

    def add(self, name, a: _ScaleVec, b: _ScaleVec):
        return _ScaleVec(np.full(a.shape[0], self._scale_of(name)))

    def concat(self, parts):
        return _ScaleVec(np.concatenate([p.scales for p in parts]))

    def split2(self, x: _ScaleVec, c):
        return _ScaleVec(x.scales[:c]), _ScaleVec(x.scales[c:])

    def maxpool(self, x, k=5):
        return x  # max pooling preserves values and therefore scales

    def upsample(self, x):
        return x


class _QT:
    """Apply-phase value: int8 data + its static per-tensor scale(s)."""

    __slots__ = ("data", "scales")

    def __init__(self, data, scales):
        self.data = data
        self.scales = scales  # np (C,) — static, only used by adds


class _ApplyOps:
    """The int8 graph. Weights/scales prepared by _BuildOps; the quantized
    kernels arrive as jit arguments (``qw`` dict), scales as baked consts."""

    def __init__(self, qw: dict, build: _BuildOps):
        self.qw = qw
        self.absmax = build.absmax
        self.sw = {k: v["sw"] for k, v in build.qweights.items()}

    def _scale_of(self, name) -> float:
        return max(self.absmax[name], 1e-6) / 127.0

    def input(self, x):
        s = self._scale_of("__input__")
        q = _quant(x, s)
        return _QT(q, np.full(x.shape[-1], s))

    def convbn(self, name, x: _QT, stride=1):
        node = self.qw[name]
        acc = _conv_s8(x.data, node["w"], stride)
        # dequant epilogue in f32: s32 accumulators reach ~1e7, beyond bf16's
        # 8-bit mantissa; the whole epilogue fuses into the conv either way
        y = acc.astype(jnp.float32) * jnp.asarray(self.sw[name], jnp.float32)
        y = _silu(y + jnp.asarray(node["b"], jnp.float32))
        s_out = self._scale_of(name)
        return _QT(_quant(y, s_out), np.full(y.shape[-1], s_out))

    def plain_conv(self, name, x: _QT):
        node = self.qw[name]
        acc = _conv_s8(x.data, node["w"])
        y = acc.astype(jnp.float32) * jnp.asarray(self.sw[name], jnp.float32)
        return (y + jnp.asarray(node["b"], jnp.float32)).astype(jnp.bfloat16)  # logits

    def add(self, name, a: _QT, b: _QT):
        # dequant-add-requant in f32; fused into the neighbors by XLA
        ya = a.data.astype(jnp.float32) * jnp.asarray(a.scales, jnp.float32)
        yb = b.data.astype(jnp.float32) * jnp.asarray(b.scales, jnp.float32)
        s_out = self._scale_of(name)
        y = ya + yb
        return _QT(_quant(y, s_out), np.full(y.shape[-1], s_out))

    def concat(self, parts):
        return _QT(
            jnp.concatenate([p.data for p in parts], axis=-1),
            np.concatenate([p.scales for p in parts]),
        )

    def split2(self, x: _QT, c):
        return _QT(x.data[..., :c], x.scales[:c]), _QT(x.data[..., c:], x.scales[c:])

    def maxpool(self, x: _QT, k=5):
        import flax.linen as nn

        return _QT(nn.max_pool(x.data, (k, k), strides=(1, 1), padding=((k // 2, k // 2),) * 2), x.scales)

    def upsample(self, x: _QT):
        n, h, w, c = x.data.shape
        return _QT(jax.image.resize(x.data, (n, h * 2, w * 2, c), method="nearest"), x.scales)

# ---------------------------------------------------------------------------
# topology (must mirror YoloV8.__call__ exactly — pinned by the parity test)
# ---------------------------------------------------------------------------


def _bottleneck(ops, name, x, hidden, shortcut):
    y = ops.convbn(f"{name}.cv1", x)
    y = ops.convbn(f"{name}.cv2", y)
    if shortcut:
        y = ops.add(f"{name}.__add__", x, y)
    return y


def _c2f(ops, name, x, out_ch, n, shortcut):
    hidden = out_ch // 2
    y = ops.convbn(f"{name}.cv1", x)
    a, b = ops.split2(y, hidden)
    parts = [a, b]
    for i in range(n):
        parts.append(_bottleneck(ops, f"{name}.m_{i}", parts[-1], hidden, shortcut))
    return ops.convbn(f"{name}.cv2", ops.concat(parts))


def _sppf(ops, name, x, out_ch):
    y = ops.convbn(f"{name}.cv1", x)
    pools = [y]
    for _ in range(3):
        pools.append(ops.maxpool(pools[-1], 5))
    return ops.convbn(f"{name}.cv2", ops.concat(pools))


def _forward(ops, x, nc: int, scale: str):
    x = ops.input(x)
    x = ops.convbn("b0", x, 2)
    return _forward_from_b0(ops, x, nc, scale)


def _forward_from_b0(ops, x, nc: int, scale: str):
    """The graph after the stem — shared with the folded-stem serving entry
    (:meth:`QuantizedYolo.apply_folded`), which computes b0 as letterbox
    matmuls (:func:`wtracker_tpu.models.yolov8.stem_apply_weff`)."""
    depth, width, max_ch = SCALES[scale]
    chn = lambda c: _make_divisible(min(c, max_ch) * width)
    rep = lambda n: max(round(n * depth), 1)

    x = ops.convbn("b1", x, 2)
    x = _c2f(ops, "b2", x, chn(128), rep(3), True)
    x = ops.convbn("b3", x, 2)
    p3 = _c2f(ops, "b4", x, chn(256), rep(6), True)
    x = ops.convbn("b5", p3, 2)
    p4 = _c2f(ops, "b6", x, chn(512), rep(6), True)
    x = ops.convbn("b7", p4, 2)
    x = _c2f(ops, "b8", x, chn(1024), rep(3), True)
    p5 = _sppf(ops, "b9", x, chn(1024))

    x = ops.concat([ops.upsample(p5), p4])
    n4 = _c2f(ops, "n12", x, chn(512), rep(3), False)
    x = ops.concat([ops.upsample(n4), p3])
    n3 = _c2f(ops, "n15", x, chn(256), rep(3), False)

    x = ops.convbn("n16", n3, 2)
    x = ops.concat([x, n4])
    n4out = _c2f(ops, "n18", x, chn(512), rep(3), False)
    x = ops.convbn("n19", n4out, 2)
    x = ops.concat([x, p5])
    n5out = _c2f(ops, "n21", x, chn(1024), rep(3), False)

    # head
    reg_max = 16
    box_out, cls_out = [], []
    for i, f in enumerate((n3, n4out, n5out)):
        b = ops.convbn(f"head.cv2_{i}_0", f)
        b = ops.convbn(f"head.cv2_{i}_1", b)
        box_out.append(ops.plain_conv(f"head.cv2_{i}_2", b))
        c = ops.convbn(f"head.cv3_{i}_0", f)
        c = ops.convbn(f"head.cv3_{i}_1", c)
        cls_out.append(ops.plain_conv(f"head.cv3_{i}_2", c))
    return box_out, cls_out


def forward_bf16_reference(fused_variables: dict, x, nc: int, scale: str):
    """The walker's bf16 forward — must equal ``YoloV8(fused=True).apply``
    (tests/test_yolov8_int8.py pins this, so topology drift is caught)."""
    ops = _CalibOps(fused_variables["params"], record=False)
    return _forward(ops, x, nc, scale)


@dataclass(frozen=True)
class QuantizedYolo:
    """Deployment artifact: int8 kernels + folded scales for one detector."""

    nc: int
    scale: str
    absmax: dict  # calibrated per-point abs-max (static floats)
    qweights: dict  # name -> {"w": int8 HWIO, "sw": f32 (oc,), "b": f32 (oc,)}
    reg_max: int = 16

    def device_weights(self) -> dict:
        """The jit-argument pytree (upload once, pass per call)."""
        return jax.tree.map(jnp.asarray, self.qweights)

    def apply(self, qw: dict, x) -> tuple[list, list]:
        """int8 forward; ``x`` is the preprocessed (B, H, W, 3) batch in
        [0, 1] (any float dtype), ``qw`` = :meth:`device_weights` output."""
        ops = self._apply_ops(qw)
        # grayscale broadcast: all 3 channels are identical, quantize once
        return _forward(ops, x.astype(jnp.bfloat16), self.nc, self.scale)

    def apply_folded(self, qw: dict, views, folded) -> tuple[list, list]:
        """int8 forward on raw grayscale views with the stem computed as
        letterbox matmuls (the 3-channel stem conv has no good TPU layout —
        see :class:`wtracker_tpu.models.yolov8.FoldedStem`).

        The channel-summed bf16 stem kernel is reconstructed in-graph from
        the quantized b0 node (``W = wq·sw / s_in``; ``s_in`` is the
        calibrated input scale the build phase folded in), the bf16 stem
        output is requantized at b0's calibrated activation scale, and the
        int8 graph continues from b1 — downstream scales are untouched.
        """
        from wtracker_tpu.models.yolov8 import stem_apply_weff

        ops = self._apply_ops(qw)
        b0 = qw["b0"]
        z = stem_apply_weff(folded, self.stem_weff(qw), b0["b"], views)
        s_b0 = ops._scale_of("b0")
        xq = _QT(_quant(z, s_b0), np.full(z.shape[-1], s_b0))
        return _forward_from_b0(ops, xq, self.nc, self.scale)

    def stem_weff(self, qw: dict) -> jnp.ndarray:
        """Channel-summed bf16-equivalent (9, out_ch) stem kernel reconstructed
        in-graph from the quantized b0 node: ``W = wq·sw / s_in`` (``s_in`` is
        the calibrated input scale the build phase folded in)."""
        s_in = max(self.absmax["__input__"], 1e-6) / 127.0
        b0 = qw["b0"]
        return (
            b0["w"].astype(jnp.float32).sum(axis=2).reshape(9, -1)
            * b0["sw"][None, :]
            / np.float32(s_in)
        )

    def _apply_ops(self, qw: dict) -> "_ApplyOps":
        build = _BuildOps.__new__(_BuildOps)
        build.absmax = self.absmax
        build.qweights = self.qweights
        return _ApplyOps(qw, build)

    # -- serialization ------------------------------------------------------

    def save(self, path) -> None:
        """Write the deployment artifact as one ``.npz`` (kernels int8 on
        disk; scales/meta as json — no pickle, loadable anywhere)."""
        import json

        arrays = {}
        for name, node in self.qweights.items():
            for k, v in node.items():
                arrays[f"{name}|{k}"] = v
        meta = {"nc": self.nc, "scale": self.scale, "reg_max": self.reg_max, "absmax": self.absmax}
        arrays["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
        np.savez(path, **arrays)

    @staticmethod
    def load(path) -> "QuantizedYolo":
        """Inverse of :meth:`save`."""
        import json

        with np.load(path) as z:
            meta = json.loads(bytes(z["__meta__"]).decode())
            qweights: dict[str, dict[str, np.ndarray]] = {}
            for key in z.files:
                if key == "__meta__":
                    continue
                name, k = key.rsplit("|", 1)
                qweights.setdefault(name, {})[k] = z[key]
        return QuantizedYolo(
            nc=meta["nc"], scale=meta["scale"], reg_max=meta["reg_max"],
            absmax=meta["absmax"], qweights=qweights,
        )


def quantize_detector(
    model: YoloV8, fused_variables: dict, calib_frames, imgsz: tuple[int, int]
) -> QuantizedYolo:
    """Calibrate + quantize a BN-fused detector.

    Args:
        model: the (``fused=True``) architecture the variables belong to.
        calib_frames: (B, H, W[, C]) uint8/float frames, *source* scale —
            they go through the same letterbox preprocessing as inference.
        imgsz: inference size the scales are calibrated at.
    """
    assert model.fused, "quantize_detector expects BN-fused variables (fuse_conv_bn)"
    x, _ = preprocess_batch(jnp.asarray(calib_frames), imgsz, dtype=jnp.bfloat16)
    calib = _CalibOps(fused_variables["params"])
    _forward(calib, x, model.nc, model.scale)

    build = _BuildOps(fused_variables["params"], calib.absmax)
    _forward(build, _ScaleVec(np.zeros(3)), model.nc, model.scale)
    return QuantizedYolo(nc=model.nc, scale=model.scale, absmax=dict(calib.absmax), qweights=build.qweights)


def detect_top1_int8(
    q: QuantizedYolo, qw: dict, frames, imgsz: tuple[int, int], conf: float
):
    """int8 twin of :func:`wtracker_tpu.models.yolov8.detect_top1` — same
    contract: (B, H, W[, C]) frames → (B, 4) xywh source-pixel boxes, NaN
    rows below ``conf``."""
    x, geometry = preprocess_batch(frames, imgsz, dtype=jnp.bfloat16)
    box_logits, cls_logits = q.apply(qw, x)
    return top1_source_boxes(box_logits, cls_logits, imgsz, q.reg_max, geometry, conf)


def detect_top1_preprocessed_int8(
    q: QuantizedYolo, qw: dict, x, geometry, imgsz: tuple[int, int], conf: float
):
    """int8 twin of :func:`wtracker_tpu.models.yolov8.detect_top1_preprocessed`
    — top-1 detection on an already-letterboxed (B, h, w, 3) tensor, pairing
    with the fused Pallas crop+letterbox kernel (ops/pallas_preproc.py)."""
    box_logits, cls_logits = q.apply(qw, x)
    return top1_source_boxes(box_logits, cls_logits, imgsz, q.reg_max, geometry, conf)


def detect_top1_int8_folded(
    q: QuantizedYolo, qw: dict, views, imgsz: tuple[int, int], conf: float, folded
):
    """Folded-stem twin of :func:`detect_top1_int8`: raw (B, H, W) grayscale
    views, stem computed as letterbox matmuls, int8 graph from b1."""
    box_logits, cls_logits = q.apply_folded(qw, views, folded)
    return top1_source_boxes(
        box_logits, cls_logits, imgsz, q.reg_max, folded.geometry, conf
    )


def make_detect_fns(
    q: QuantizedYolo,
    src_hw: tuple[int, int] | None = None,
    imgsz: tuple[int, int] | None = None,
):
    """(detect_fn, detect_preprocessed_fn) closures over one quantized
    detector, matching the engine hooks' ``(model, variables, ...)``
    signatures — ``variables`` must be :meth:`QuantizedYolo.device_weights`
    output (the model argument is ignored; topology/scales live in ``q``).

    With ``src_hw``/``imgsz`` given and a padding-free letterbox, ``detect``
    runs the folded-stem graph (:meth:`QuantizedYolo.apply_folded`); otherwise
    the standard preprocess→int8 path.
    """
    from wtracker_tpu.models.yolov8 import fold_stem_matrices

    folded = None
    if src_hw is not None and imgsz is not None:
        folded = fold_stem_matrices(src_hw, imgsz, dtype=jnp.bfloat16)

    if folded is not None:
        _imgsz = imgsz

        def detect(model, variables, views, imgsz, conf):
            # the folded geometry is built for _imgsz — the runtime argument
            # is ignored, matching make_folded_detect's bf16 closure
            return detect_top1_int8_folded(q, variables, views, _imgsz, conf, folded)

        # engines route raw views here instead of the preprocessed branch
        detect.folds_preproc = True

    else:

        def detect(model, variables, views, imgsz, conf):
            return detect_top1_int8(q, variables, views, imgsz, conf)

    def detect_preprocessed(model, variables, x, geometry, imgsz, conf):
        return detect_top1_preprocessed_int8(q, variables, x, geometry, imgsz, conf)

    return detect, detect_preprocessed


def is_quantized_artifact(path) -> bool:
    """True when ``path`` is a :meth:`QuantizedYolo.save` npz (lets loaders
    dispatch between bf16 weight files and int8 deployment artifacts)."""
    try:
        with np.load(path) as z:
            return "__meta__" in z.files and any("|" in k for k in z.files)
    except (OSError, ValueError):
        return False
