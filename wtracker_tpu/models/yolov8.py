"""From-scratch Flax YOLOv8 detector (CSPDarknet + PAN + decoupled DFL head).

TPU-native replacement for the ultralytics YOLO dependency used by the
reference's live detection controller (yolo_controller.py:72-90: custom-trained
YOLOv8s, ``imgsz 384/416``, ``conf 0.1``, ``max_det=1``).  Nothing here derives
from ultralytics code — the architecture follows the public YOLOv8 description:

* backbone: stem + 4 stages of stride-2 Conv + C2f (cross-stage partial blocks
  with 2-conv bottlenecks), topped by SPPF;
* neck: PAN — two top-down upsample/concat/C2f stages, two bottom-up
  downsample/concat/C2f stages;
* head: per-scale decoupled branches — box branch predicting 4×``reg_max``
  distribution-focal logits, class branch predicting ``nc`` logits;
* decode: DFL softmax expectation → ltrb distances from anchor centers at
  strides (8, 16, 32) → xyxy.

Design choices for TPU: NHWC layout end-to-end, bf16 compute with f32 params
and f32 accumulation (MXU-friendly), all shapes static, single fused forward.
``max_det=1`` makes NMS a score argmax (SURVEY.md §2c); a general batched NMS
lives in :mod:`wtracker_tpu.ops.nms`.

Weight port: :func:`load_ultralytics_state_dict` maps an ultralytics
``model.model.{i}`` state-dict layout onto this module tree, so the
reference's trained ``yolov8s_trained.pt`` drops in when available.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# scale presets: (depth_multiple, width_multiple, max_channels)
SCALES = {
    "n": (1 / 3, 0.25, 1024),
    "s": (1 / 3, 0.50, 1024),
    "m": (2 / 3, 0.75, 768),
    "l": (1.0, 1.00, 512),
    "x": (1.0, 1.25, 512),
}

STRIDES = (8, 16, 32)


def _make_divisible(x: float, divisor: int = 8) -> int:
    return int(math.ceil(x / divisor) * divisor)


def _silu(x: jnp.ndarray) -> jnp.ndarray:
    """SiLU via tanh: x·σ(x) = 0.5·x·(tanh(x/2)+1).

    Mathematically identical to ``nn.silu``; on TPU the tanh lowers to the
    transcendental unit while ``1/(1+e⁻ˣ)`` lowers to exp+divide — the SiLU
    divides were the largest elementwise share of the live loop
    (divide_multiply fusions ≈ 84 ms/cycle at S=96, docs/performance.md)."""
    return 0.5 * x * (jnp.tanh(0.5 * x) + 1.0)


class ConvBN(nn.Module):
    """Conv2d + BatchNorm + SiLU — the basic YOLO conv block (NHWC).

    With ``fused=True`` the block is a biased conv + SiLU — the inference
    deployment form after :func:`fuse_conv_bn` folds the BN statistics into
    the kernel/bias (one fewer memory-bound op per block).
    """

    out_ch: int
    kernel: int = 1
    stride: int = 1
    compute_dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.kernel // 2
        x = nn.Conv(
            self.out_ch,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=((pad, pad), (pad, pad)),
            use_bias=self.fused,
            dtype=self.compute_dtype,
            name="conv",
        )(x)
        if not self.fused:
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.97,  # torch BN momentum 0.03
                epsilon=1e-3,
                dtype=self.compute_dtype,
                name="bn",
            )(x)
        return _silu(x)


class Bottleneck(nn.Module):
    """Two 3x3 ConvBN blocks with an optional residual."""

    out_ch: int
    shortcut: bool = True
    compute_dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = ConvBN(self.out_ch, 3, compute_dtype=self.compute_dtype, fused=self.fused, name="cv1")(x, train)
        y = ConvBN(self.out_ch, 3, compute_dtype=self.compute_dtype, fused=self.fused, name="cv2")(y, train)
        if self.shortcut and x.shape[-1] == self.out_ch:
            y = x + y
        return y


class C2f(nn.Module):
    """Cross-stage-partial block: split, chain bottlenecks, concat, fuse."""

    out_ch: int
    n: int = 1
    shortcut: bool = False
    compute_dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = self.out_ch // 2
        y = ConvBN(2 * hidden, 1, compute_dtype=self.compute_dtype, fused=self.fused, name="cv1")(x, train)
        parts = [y[..., :hidden], y[..., hidden:]]
        for i in range(self.n):
            parts.append(
                Bottleneck(hidden, self.shortcut, compute_dtype=self.compute_dtype, fused=self.fused, name=f"m_{i}")(
                    parts[-1], train
                )
            )
        y = jnp.concatenate(parts, axis=-1)
        return ConvBN(self.out_ch, 1, compute_dtype=self.compute_dtype, fused=self.fused, name="cv2")(y, train)


class SPPF(nn.Module):
    """Spatial pyramid pooling (fast): 3 chained 5x5 max-pools, concatenated."""

    out_ch: int
    pool: int = 5
    compute_dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        hidden = x.shape[-1] // 2
        y = ConvBN(hidden, 1, compute_dtype=self.compute_dtype, fused=self.fused, name="cv1")(x, train)
        pools = [y]
        for _ in range(3):
            pools.append(
                nn.max_pool(
                    pools[-1],
                    (self.pool, self.pool),
                    strides=(1, 1),
                    padding=((self.pool // 2, self.pool // 2),) * 2,
                )
            )
        return ConvBN(self.out_ch, 1, compute_dtype=self.compute_dtype, fused=self.fused, name="cv2")(
            jnp.concatenate(pools, axis=-1), train
        )


class DetectHead(nn.Module):
    """Decoupled per-scale head: box-distribution branch + class branch."""

    nc: int
    reg_max: int = 16
    compute_dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray], train: bool = False):
        ch = [f.shape[-1] for f in feats]
        c2 = max(16, ch[0] // 4, self.reg_max * 4)
        c3 = max(ch[0], min(self.nc, 100))

        box_out, cls_out = [], []
        for i, f in enumerate(feats):
            b = ConvBN(c2, 3, compute_dtype=self.compute_dtype, fused=self.fused, name=f"cv2_{i}_0")(f, train)
            b = ConvBN(c2, 3, compute_dtype=self.compute_dtype, fused=self.fused, name=f"cv2_{i}_1")(b, train)
            # bias priors (trainability): box bins start at 1.0, class logits
            # at a ~1% objectness prior — the standard YOLO head init
            b = nn.Conv(
                4 * self.reg_max,
                (1, 1),
                dtype=self.compute_dtype,
                bias_init=nn.initializers.constant(1.0),
                name=f"cv2_{i}_2",
            )(b)

            c = ConvBN(c3, 3, compute_dtype=self.compute_dtype, fused=self.fused, name=f"cv3_{i}_0")(f, train)
            c = ConvBN(c3, 3, compute_dtype=self.compute_dtype, fused=self.fused, name=f"cv3_{i}_1")(c, train)
            c = nn.Conv(
                self.nc,
                (1, 1),
                dtype=self.compute_dtype,
                bias_init=nn.initializers.constant(-4.595),
                name=f"cv3_{i}_2",
            )(c)

            box_out.append(b)
            cls_out.append(c)
        return box_out, cls_out


class YoloV8(nn.Module):
    """Full detector graph; returns per-scale (box_logits, cls_logits)."""

    nc: int = 1
    scale: str = "s"
    reg_max: int = 16
    compute_dtype: Any = jnp.float32
    fused: bool = False
    external_stem: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        depth, width, max_ch = SCALES[self.scale]

        def chn(c):
            return _make_divisible(min(c, max_ch) * width)

        def rep(n):
            return max(round(n * depth), 1)

        dt = self.compute_dtype
        x = x.astype(dt)

        # backbone.  With ``external_stem`` the caller supplies the b0 output
        # directly (see :func:`fold_stem` — the stem conv computed as part of
        # the letterbox matmuls); the unused b0 params in ``variables`` are
        # ignored by flax.
        if not self.external_stem:
            x = ConvBN(chn(64), 3, 2, dt, fused=self.fused, name="b0")(x, train)  # /2
        x = ConvBN(chn(128), 3, 2, dt, fused=self.fused, name="b1")(x, train)  # /4
        x = C2f(chn(128), rep(3), True, dt, fused=self.fused, name="b2")(x, train)
        x = ConvBN(chn(256), 3, 2, dt, fused=self.fused, name="b3")(x, train)  # /8
        p3 = C2f(chn(256), rep(6), True, dt, fused=self.fused, name="b4")(x, train)
        x = ConvBN(chn(512), 3, 2, dt, fused=self.fused, name="b5")(p3, train)  # /16
        p4 = C2f(chn(512), rep(6), True, dt, fused=self.fused, name="b6")(x, train)
        x = ConvBN(chn(1024), 3, 2, dt, fused=self.fused, name="b7")(p4, train)  # /32
        x = C2f(chn(1024), rep(3), True, dt, fused=self.fused, name="b8")(x, train)
        p5 = SPPF(chn(1024), 5, dt, fused=self.fused, name="b9")(x, train)

        # PAN neck — top-down
        def up2(t):
            n, h, w, c = t.shape
            return jax.image.resize(t, (n, h * 2, w * 2, c), method="nearest")

        x = jnp.concatenate([up2(p5), p4], axis=-1)
        n4 = C2f(chn(512), rep(3), False, dt, fused=self.fused, name="n12")(x, train)
        x = jnp.concatenate([up2(n4), p3], axis=-1)
        n3 = C2f(chn(256), rep(3), False, dt, fused=self.fused, name="n15")(x, train)  # /8 out

        # bottom-up
        x = ConvBN(chn(256), 3, 2, dt, fused=self.fused, name="n16")(n3, train)
        x = jnp.concatenate([x, n4], axis=-1)
        n4out = C2f(chn(512), rep(3), False, dt, fused=self.fused, name="n18")(x, train)  # /16 out
        x = ConvBN(chn(512), 3, 2, dt, fused=self.fused, name="n19")(n4out, train)
        x = jnp.concatenate([x, p5], axis=-1)
        n5out = C2f(chn(1024), rep(3), False, dt, fused=self.fused, name="n21")(x, train)  # /32 out

        return DetectHead(self.nc, self.reg_max, dt, fused=self.fused, name="head")([n3, n4out, n5out], train)


# ---------------------------------------------------------------------------
# BatchNorm folding (inference deployment)
# ---------------------------------------------------------------------------


def fuse_conv_bn(variables: dict, eps: float = 1e-3) -> dict:
    """Fold every ConvBN's BatchNorm into its conv kernel + bias.

    Returns variables for the same architecture with ``fused=True`` (biased
    convs, no batch_stats): ``W' = W · s/√(v+ε)``, ``b' = β − μ·s/√(v+ε)``.
    """
    import numpy as _np

    params = jax.tree.map(_np.asarray, variables["params"])
    stats = jax.tree.map(_np.asarray, variables.get("batch_stats", {}))

    def walk(p: dict, s: dict) -> dict:
        if "conv" in p and "bn" in p and "bn" in s:
            factor = p["bn"]["scale"] / _np.sqrt(s["bn"]["var"] + eps)
            kernel = p["conv"]["kernel"] * factor  # broadcast over out-channels
            bias = p["bn"]["bias"] - s["bn"]["mean"] * factor
            return {"conv": {"kernel": kernel, "bias": bias}}
        return {k: walk(v, s.get(k, {})) if isinstance(v, dict) else v for k, v in p.items()}

    fused = walk(params, stats)
    return {"params": jax.tree.map(jnp.asarray, fused)}


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------


def make_anchors(imgsz: tuple[int, int], strides: Sequence[int] = STRIDES, offset: float = 0.5):
    """Anchor-center coordinates (in stride units) and per-anchor strides."""
    points, strd = [], []
    h, w = imgsz
    for s in strides:
        gh, gw = h // s, w // s
        ys, xs = np.meshgrid(np.arange(gh) + offset, np.arange(gw) + offset, indexing="ij")
        points.append(np.stack([xs.reshape(-1), ys.reshape(-1)], axis=-1))
        strd.append(np.full((gh * gw, 1), s, dtype=np.float32))
    return np.concatenate(points, 0).astype(np.float32), np.concatenate(strd, 0)


def decode_predictions(
    box_logits: Sequence[jnp.ndarray],
    cls_logits: Sequence[jnp.ndarray],
    imgsz: tuple[int, int],
    reg_max: int = 16,
):
    """DFL decode: (B, A, 4) xyxy boxes in input pixels + (B, A, nc) scores."""
    b = box_logits[0].shape[0]
    box_flat = jnp.concatenate([t.reshape(b, -1, 4 * reg_max) for t in box_logits], axis=1)
    cls_flat = jnp.concatenate([t.reshape(b, -1, t.shape[-1]) for t in cls_logits], axis=1)

    anchors, strides = make_anchors(imgsz)
    anchors = jnp.asarray(anchors)
    strides = jnp.asarray(strides)

    dist = box_flat.reshape(b, -1, 4, reg_max).astype(jnp.float32)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    # softmax expectation with a single divide per (B, A, 4) cell instead of
    # dividing all reg_max bins (softmax) — the divide was a top HLO cost
    e = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
    ltrb = jnp.sum(e * bins, axis=-1) / jnp.sum(e, axis=-1)  # (B, A, 4)

    tl = (anchors[None] - ltrb[..., :2]) * strides[None]
    br = (anchors[None] + ltrb[..., 2:]) * strides[None]
    boxes = jnp.concatenate([tl, br], axis=-1)
    scores = jax.nn.sigmoid(cls_flat.astype(jnp.float32))
    return boxes, scores


def decode_top1(
    box_logits: Sequence[jnp.ndarray],
    cls_logits: Sequence[jnp.ndarray],
    imgsz: tuple[int, int],
    reg_max: int = 16,
):
    """Top-1 decode: best xyxy box (B, 4) + its sigmoid score (B,).

    Selects the winning anchor on *raw class logits* (sigmoid is monotonic, so
    the argmax is identical) and runs the DFL expectation only for that one
    anchor — the decode-everything path softmaxes 16 bins × 4 sides for every
    anchor and was the largest elementwise share of the live loop
    (divide_multiply fusions, docs/performance.md). The selection runs
    level-by-level: concatenating the per-level box logits first would
    materialize a (B, A_total, 4·reg_max) tensor plus a layout copy of the
    stride-8 level — ~7 ms/cycle of pure HBM traffic at flagship geometry
    (round-3 device trace) — while three per-level gathers read only the
    winning rows. Tie-breaks match the concat form: ``argmax`` returns the
    first maximum both within a level and across the level stack, which is
    exactly concatenation order. Numerically identical to
    ``decode_predictions`` + argmax.
    """
    b = box_logits[0].shape[0]
    anchors, strides = make_anchors(imgsz)

    lvl_best, lvl_idx, lvl_dist, lvl_anchor, lvl_stride = [], [], [], [], []
    offset = 0
    for box_t, cls_t in zip(box_logits, cls_logits):
        a_l = cls_t.shape[1] * cls_t.shape[2]
        top_l = jnp.max(cls_t.reshape(b, a_l, -1).astype(jnp.float32), axis=-1)  # (B, Al)
        idx_l = jnp.argmax(top_l, axis=-1)  # (B,)
        lvl_best.append(jnp.take_along_axis(top_l, idx_l[:, None], axis=1)[:, 0])
        lvl_idx.append(idx_l)
        box_l = box_t.reshape(b, a_l, 4 * reg_max)
        lvl_dist.append(jnp.take_along_axis(box_l, idx_l[:, None, None], axis=1)[:, 0])
        lvl_anchor.append(jnp.take(jnp.asarray(anchors[offset : offset + a_l]), idx_l, axis=0))
        lvl_stride.append(jnp.take(jnp.asarray(strides[offset : offset + a_l]), idx_l, axis=0))
        offset += a_l

    best = jnp.stack(lvl_best, axis=1)  # (B, L)
    lvl = jnp.argmax(best, axis=-1)  # (B,)
    best_score = jax.nn.sigmoid(jnp.take_along_axis(best, lvl[:, None], axis=1)[:, 0])

    dist = jnp.take_along_axis(jnp.stack(lvl_dist, axis=1), lvl[:, None, None], axis=1)[:, 0]
    dist = dist.reshape(b, 4, reg_max).astype(jnp.float32)
    bins = jnp.arange(reg_max, dtype=jnp.float32)
    e = jnp.exp(dist - jnp.max(dist, axis=-1, keepdims=True))
    ltrb = jnp.sum(e * bins, axis=-1) / jnp.sum(e, axis=-1)  # (B, 4)

    anchor = jnp.take_along_axis(jnp.stack(lvl_anchor, axis=1), lvl[:, None, None], axis=1)[:, 0]
    stride = jnp.take_along_axis(jnp.stack(lvl_stride, axis=1), lvl[:, None, None], axis=1)[:, 0]
    tl = (anchor - ltrb[:, :2]) * stride
    br = (anchor + ltrb[:, 2:]) * stride
    return jnp.concatenate([tl, br], axis=-1), best_score


def top1_source_boxes(
    box_logits,
    cls_logits,
    imgsz: tuple[int, int],
    reg_max: int,
    geometry: tuple,
    conf: float,
) -> jnp.ndarray:
    """Top-1 decode → letterbox un-mapping → confidence mask.

    The shared tail of every detect entry point (bf16, int8, folded-stem,
    mixed-geometry): (B, 4) xywh in *source* pixels, NaN rows below ``conf``
    (the reference's ``max_det=1`` contract, yolo_controller.py:80-90).
    ``geometry`` is the letterbox ``(scale, pad_top, pad_left)`` — scalars for
    one shared geometry, or (B,) arrays for per-sample geometries
    (engine_hetero's per-stream camera sizes).
    """
    scale, pad_top, pad_left = geometry
    sc = jnp.asarray(scale)
    if sc.ndim:  # per-sample geometries: (B,) -> (B, 1) against (B, 2) boxes
        pad = jnp.stack([jnp.asarray(pad_left), jnp.asarray(pad_top)], axis=-1)
        sc = sc[..., None]
    else:  # scalar path: keep the exact original construction (strong-typed
        # list literal — under x64 it promotes the tail to f64, and the
        # byte-parity CSVs are pinned to those low bits)
        pad = jnp.array([pad_left, pad_top])
        sc = scale
    best_box, best_score = decode_top1(box_logits, cls_logits, imgsz, reg_max)
    xy = (best_box[:, :2] - pad) / sc
    wh = (best_box[:, 2:] - best_box[:, :2]) / sc
    out = jnp.concatenate([xy, wh], axis=-1)
    return jnp.where((best_score >= conf)[:, None], out, jnp.nan)


def stem_weff(stem_params: dict) -> jnp.ndarray:
    """Channel-summed (9, out_ch) stem kernel for the folded-stem matmul chain
    (grayscale sources broadcast to 3 identical channels, so the kernel's
    input-channel axis sums out)."""
    return stem_params["kernel"].astype(jnp.float32).sum(axis=2).reshape(9, -1)


# ---------------------------------------------------------------------------
# preprocessing (letterbox) and the end-to-end detector
# ---------------------------------------------------------------------------


def letterbox_params(src_hw: tuple[int, int], dst_hw: tuple[int, int]):
    """Scale + padding of a ratio-preserving letterbox resize (pad value 114)."""
    sh, sw = src_hw
    dh, dw = dst_hw
    scale = min(dh / sh, dw / sw)
    new_h, new_w = round(sh * scale), round(sw * scale)
    pad_top = (dh - new_h) // 2
    pad_left = (dw - new_w) // 2
    return scale, new_h, new_w, pad_top, pad_left


def preprocess_batch(
    frames: jnp.ndarray, imgsz: tuple[int, int], dtype=jnp.float32
) -> tuple[jnp.ndarray, tuple]:
    """uint8 (B, H, W[, C]) frames → normalized letterboxed (B, h, w, 3).

    Grayscale inputs broadcast to 3 channels (the reference converts gray→BGR
    before YOLO, yolo_controller.py:70).  The resize runs as two constant
    interpolation matmuls (MXU-friendly, :mod:`wtracker_tpu.ops.image`);
    bf16-compute detectors pass their compute dtype to halve the
    preprocessing memory traffic.  Returns the tensor and the letterbox
    geometry for mapping boxes back to source coordinates.
    """
    from wtracker_tpu.ops.image import letterbox

    return letterbox(frames, imgsz, dtype=dtype)


def detect_top1_preprocessed(
    model: YoloV8,
    variables: dict,
    x: jnp.ndarray,
    geometry: tuple[float, int, int],
    imgsz: tuple[int, int],
    conf: float,
) -> jnp.ndarray:
    """Top-1 detection on an already-letterboxed (B, h, w, 3) tensor.

    ``geometry`` is the (scale, pad_top, pad_left) of the letterbox, used to
    map boxes back into source pixels — pair with the fused Pallas
    preprocessing kernel (ops/pallas_preproc.py).
    """
    box_logits, cls_logits = model.apply(variables, x, train=False)
    return top1_source_boxes(box_logits, cls_logits, imgsz, model.reg_max, geometry, conf)


def detect_top1(
    model: YoloV8,
    variables: dict,
    frames: jnp.ndarray,
    imgsz: tuple[int, int],
    conf: float,
) -> jnp.ndarray:
    """Pure end-to-end top-1 detection (usable inside other jitted code).

    (B, H, W[, C]) frames → (B, 4) xywh in source pixels; NaN rows when the
    best score is below ``conf`` (the reference's ``max_det=1`` contract).
    """
    x, geometry = preprocess_batch(frames, imgsz, dtype=model.compute_dtype)
    box_logits, cls_logits = model.apply(variables, x, train=False)
    return top1_source_boxes(box_logits, cls_logits, imgsz, model.reg_max, geometry, conf)


# ---------------------------------------------------------------------------
# folded stem: b0 computed as part of the letterbox matmuls
# ---------------------------------------------------------------------------


class FoldedStem(NamedTuple):
    """Geometry part of the letterbox + stem-conv fusion (weight-free).

    The round-3 device trace showed the stem conv (3ch input at full imgsz)
    running at ~1% of MXU peak — 22% of the whole detector — because XLA has
    no good layout for a 3-channel conv.  For grayscale sources the letterbox
    is already two constant matmuls ``img = Ah @ V @ Awᵀ`` (ops/image.py), and
    each of the nine 3×3-stride-2 stem taps is a row/column-shifted variant of
    the same product, so the stem output is exactly

        z[b, y, x, oc] = Σ_{p,q} Weff[p, q, oc] · (Ah[2y+p-1] @ V[b] @ Aw[2x+q-1]ᵀ)

    — twelve large MXU matmuls plus a (9 → out_ch) projection, never
    materializing the (B, h, w, 3) letterboxed tensor or running the
    pathological conv.  ``Weff`` sums the kernel over its 3 (identical,
    grayscale-broadcast) input channels; the math is exact (f32 maxdiff ~1e-6
    vs letterbox→conv).  Only the interpolation matrices live here — the
    weight-derived pieces are computed inside the jitted graph from the
    ``variables`` argument, so cached engine runners never bake stale weights.
    """

    by: jnp.ndarray  # (3, h/2, src_h) row matrices, 1/255 normalize folded in
    bx: jnp.ndarray  # (3, w/2, src_w) column matrices
    geometry: tuple  # (scale, pad_top, pad_left) of the letterbox


def fold_stem_matrices(src_hw: tuple[int, int], imgsz: tuple[int, int], dtype=jnp.bfloat16):
    """Build the :class:`FoldedStem` interpolation matrices, or ``None``.

    Returns ``None`` when the geometry letterboxes with padding (source and
    target aspect ratios differ) or the target size is odd — callers fall
    back to the standard letterbox→conv path.
    """
    from wtracker_tpu.ops.image import _interp_matrix

    scale, new_h, new_w, pad_top, pad_left = letterbox_params(src_hw, imgsz)
    if (new_h, new_w) != tuple(imgsz) or pad_top or pad_left or new_h % 2 or new_w % 2:
        return None

    def shifted(a: np.ndarray, tap: int, n_out: int) -> np.ndarray:
        m = np.zeros((n_out, a.shape[1]), np.float32)
        for i in range(n_out):
            r = 2 * i + tap - 1  # stride 2, pad 1: tap rows 2i-1 .. 2i+1
            if 0 <= r < a.shape[0]:
                m[i] = a[r]
        return m

    ah = _interp_matrix(src_hw[0], new_h) * np.float32(1.0 / 255.0)
    aw = _interp_matrix(src_hw[1], new_w)
    by = jnp.asarray(np.stack([shifted(ah, t, new_h // 2) for t in range(3)]), dtype)
    bx = jnp.asarray(np.stack([shifted(aw, t, new_w // 2) for t in range(3)]), dtype)
    return FoldedStem(by, bx, (scale, pad_top, pad_left))


def stem_apply_weff(folded: FoldedStem, weff, bias, views: jnp.ndarray) -> jnp.ndarray:
    """Folded-stem matmul chain on a channel-summed (9, out_ch) kernel.

    Lower-level entry shared with the int8 serving path (which derives its
    ``weff`` from the quantized kernel + scales instead of bf16 weights).
    """
    if views.ndim == 4:  # tolerate a trailing singleton channel
        views = views[..., 0]
    dt = folded.by.dtype
    v = views.astype(dt)
    u = jnp.einsum("pyh,bhw->pbyw", folded.by, v, preferred_element_type=jnp.float32).astype(dt)
    t = jnp.einsum("pbyw,qxw->byxpq", u, folded.bx, preferred_element_type=jnp.float32).astype(dt)
    b, h, w = t.shape[:3]
    z = jnp.einsum("byxk,ko->byxo", t.reshape(b, h, w, 9), weff.astype(dt),
                   preferred_element_type=jnp.float32)
    return _silu((z + bias.astype(jnp.float32)).astype(dt))


def stem_apply(folded: FoldedStem, stem_params: dict, views: jnp.ndarray) -> jnp.ndarray:
    """(B, H, W) grayscale uint8 views → (B, h/2, w/2, out_ch) stem output.

    ``stem_params`` is the BN-fused b0 conv node ``{"kernel", "bias"}`` —
    traced, so weights flow through jit arguments like every other layer.
    """
    return stem_apply_weff(folded, stem_weff(stem_params), stem_params["bias"], views)


def can_fold_stem(variables: dict) -> bool:
    """BN-fused variables with the standard 3×3×3 stem kernel?"""
    try:
        b0 = variables["params"]["b0"]["conv"]
        return "bias" in b0 and tuple(b0["kernel"].shape[:3]) == (3, 3, 3)
    except (KeyError, TypeError):
        return False


def make_folded_detect(model: YoloV8, src_hw: tuple[int, int], imgsz: tuple[int, int]):
    """Engine-hook detect_fn running the folded-stem graph, or ``None``.

    Signature matches the engines' ``detect_fn`` contract
    ``(model, variables, views, imgsz, conf) -> (B, 4) xywh`` — the model and
    imgsz arguments are ignored in favor of the folded closure.  Requires
    BN-fused variables (check with :func:`can_fold_stem`).
    """
    folded = fold_stem_matrices(src_hw, imgsz, dtype=model.compute_dtype)
    if folded is None:
        return None
    rest = model.clone(external_stem=True)

    def detect(_model, variables, views, _imgsz, conf):
        z = stem_apply(folded, variables["params"]["b0"]["conv"], views)
        box_logits, cls_logits = rest.apply(variables, z, train=False)
        return top1_source_boxes(
            box_logits, cls_logits, imgsz, rest.reg_max, folded.geometry, conf
        )

    detect.folds_preproc = True  # engines route raw views here, not the Pallas branch
    return detect


@dataclass
class YoloV8Detector:
    """End-to-end worm-head detector: preprocess → forward → decode → top-1.

    Mirrors the reference's inference contract: best box above ``conf`` wins
    (``max_det=1``), otherwise a NaN bbox; outputs are xywh in *source frame*
    pixels (yolo_controller.py:80-90).
    """

    model: YoloV8
    variables: dict
    imgsz: tuple[int, int] = (384, 384)
    conf: float = 0.1
    _detect_fn: Callable = field(init=False, repr=False, default=None)

    def __post_init__(self):
        model, imgsz, conf = self.model, self.imgsz, self.conf

        @jax.jit
        def detect(variables, frames):
            return detect_top1(model, variables, frames, imgsz, conf)

        object.__setattr__(self, "_detect_fn", detect)

    def detect(self, frames) -> jnp.ndarray:
        """(B, H, W[, C]) uint8 → (B, 4) xywh in source pixels; NaN = no hit."""
        return self._detect_fn(self.variables, jnp.asarray(frames))

    def fuse(self) -> "YoloV8Detector":
        """Inference-fused copy: BN folded into conv kernels/biases."""
        fused_model = YoloV8(
            nc=self.model.nc,
            scale=self.model.scale,
            reg_max=self.model.reg_max,
            compute_dtype=self.model.compute_dtype,
            fused=True,
        )
        return YoloV8Detector(
            model=fused_model,
            variables=fuse_conv_bn(self.variables),
            imgsz=self.imgsz,
            conf=self.conf,
        )

    def raw(self, frames) -> tuple[jnp.ndarray, jnp.ndarray]:
        """All decoded boxes + scores (for general NMS / evaluation)."""
        x, _ = preprocess_batch(jnp.asarray(frames), self.imgsz)
        box_logits, cls_logits = self.model.apply(self.variables, x, train=False)
        return decode_predictions(box_logits, cls_logits, self.imgsz, self.model.reg_max)

    def detect_multi(
        self, frames, max_det: int = 300, iou: float = 0.7
    ) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        """Multi-detection inference through the general TPU NMS.

        The reference exposes ``max_det`` on its YoloController config
        (yolo_controller.py:30) and runs validation NMS at iou 0.7 / max_det
        300 (yolo_train_config.yaml:49-50); this is the native counterpart:
        decode every anchor, suppress with :func:`wtracker_tpu.ops.nms.nms`,
        map survivors back to source pixels.

        Returns ``(boxes, scores, valid)``: (B, max_det, 4) xywh in source
        frame pixels (zero rows where invalid), (B, max_det) scores, and the
        (B, max_det) validity mask.
        """
        from wtracker_tpu.ops.nms import batched_nms

        frames = jnp.asarray(frames)
        x, (scale, pad_top, pad_left) = preprocess_batch(frames, self.imgsz)
        box_logits, cls_logits = self.model.apply(self.variables, x, train=False)
        boxes, scores = decode_predictions(box_logits, cls_logits, self.imgsz, self.model.reg_max)
        top = jnp.max(scores, axis=-1)  # class-agnostic (single-class contract)
        kept, kept_scores, valid = batched_nms(boxes, top, iou, self.conf, max_det)

        xy = (kept[..., :2] - jnp.array([pad_left, pad_top])) / scale
        wh = (kept[..., 2:] - kept[..., :2]) / scale
        out = jnp.concatenate([xy, wh], axis=-1)
        return jnp.where(valid[..., None], out, 0.0), kept_scores, valid

    # -- construction ------------------------------------------------------

    @staticmethod
    def init_random(
        nc: int = 1,
        scale: str = "s",
        imgsz: tuple[int, int] | int = (384, 384),
        conf: float = 0.1,
        compute_dtype=jnp.float32,
        seed: int = 0,
    ) -> "YoloV8Detector":
        if isinstance(imgsz, int):
            imgsz = (imgsz, imgsz)
        model = YoloV8(nc=nc, scale=scale, compute_dtype=compute_dtype)
        variables = model.init(
            jax.random.PRNGKey(seed), jnp.zeros((1, *imgsz, 3), jnp.float32), train=False
        )
        return YoloV8Detector(model=model, variables=variables, imgsz=imgsz, conf=conf)

    @staticmethod
    def load(path: str, imgsz: int | tuple[int, int] = 384, conf: float = 0.1) -> "YoloV8Detector":
        """Load weights from a Flax ``.npz``/msgpack export or an ultralytics .pt."""
        if isinstance(imgsz, int):
            imgsz = (imgsz, imgsz)
        if str(path).endswith(".pt"):
            from wtracker_tpu.models.yolo_port import load_ultralytics_checkpoint

            return load_ultralytics_checkpoint(path, imgsz=imgsz, conf=conf)
        data = np.load(path, allow_pickle=True)
        meta = data["__meta__"].item()
        flat = {k: data[k] for k in data.files if k != "__meta__"}
        variables = _unflatten_dict(flat)
        model = YoloV8(nc=meta["nc"], scale=meta["scale"])
        return YoloV8Detector(model=model, variables=variables, imgsz=imgsz, conf=conf)

    def save(self, path: str) -> None:
        flat = _flatten_dict(jax.tree.map(np.asarray, self.variables))
        flat["__meta__"] = np.array({"nc": self.model.nc, "scale": self.model.scale}, dtype=object)
        np.savez(path, **flat)


def _flatten_dict(tree: dict, prefix: str = "") -> dict:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_dict(v, key))
        else:
            out[key] = v
    return out


def _unflatten_dict(flat: dict) -> dict:
    out: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(v)
    return out
