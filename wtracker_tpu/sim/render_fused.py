"""Render→stem fusion: synthetic views computed directly in stem space.

The flagship live loop renders a (B, cam_h, cam_w) synthetic view per frame
(sim/synthetic.py) and immediately pushes it through the letterbox+stem
matmul chain (models/yolov8.py FoldedStem).  Both maps are linear, and the
scene itself is *structured*: the agar texture is a sum of four separable
(rank-1) terms and the worm blob lives on a 64² window.  So the stem input

    t[p, q] = by_p @ V @ bx_qᵀ,   V = clip(bg + placed, 0, 255)

never needs the (B, cam_h, cam_w) view materialized.  When the scene
provably cannot clip (:func:`scene_is_clip_free` — default params peak at
222.5 of 255), linearity gives

    by_p @ V @ bx_qᵀ = Σ_r (by_p u_r)(bx_q v_r)ᵀ  +  (by_p[:, ty:ty+w]) @ blob @ (bx_q[:, tx:tx+w])ᵀ

where the texture factors ``u_r``/``v_r`` are single-frequency sinusoids:
by the angle-addition identity each per-view factor is a 2-term combination
of *camera-independent* precomputed vectors, so the whole background costs
eight scalar sin/cos per view plus tiny outer products — versus the dense
(cam_h·cam_w) texture evaluation and two (H2, cam) matmuls per tap it
replaces (~7× less math, ~10⁴× fewer transcendentals).  The worm term is the
blob window pushed through *sliced* interpolation matrices — the selection
matmul ``by_p @ Py`` is exactly ``by_p[:, ty:ty+win]``.

The result is numerically the same computation reassociated (bf16
accumulation differences only; parity pinned by tests/test_render_fused.py).

Reference lineage: the view render is ViewController's crop
(view_controller.py:158-190) over the DummyReader-style synthetic backend;
the stem fold is documented at models/yolov8.py FoldedStem.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from wtracker_tpu.models.yolov8 import (
    FoldedStem,
    _silu,
    can_fold_stem,
    fold_stem_matrices,
    stem_weff,
    top1_source_boxes,
)
from wtracker_tpu.sim.synthetic import (
    TEX_FX1 as _FX1,
    TEX_FX2 as _FX2,
    TEX_FY1 as _FY1,
    TEX_FY2 as _FY2,
    TEXTURE_BOUND,
    SyntheticScene,
)


def scene_is_clip_free(scene: SyntheticScene) -> bool:
    """True when ``clip(bg + blob, 0, 255)`` is provably the identity.

    The texture term is bounded by ±TEXTURE_BOUND·amp (sim/synthetic.py) and
    the blob by [0, intensity]."""
    lo = scene.bg_level - TEXTURE_BOUND * scene.texture_amp
    hi = scene.bg_level + TEXTURE_BOUND * scene.texture_amp + scene.worm_intensity
    return lo >= 0.0 and hi <= 255.0


class _FusedTables(NamedTuple):
    """Camera-independent precomputes of the fused render→stem operator."""

    by: jnp.ndarray  # (3, H2, src_h) row interp (1/255 folded), compute dtype
    bx: jnp.ndarray  # (3, W2, src_w)
    y_base: jnp.ndarray  # (3, H2, 5) f32: by_p @ [1, cos(b·y), sin(b·y), cos(d·y), sin(d·y)]
    x_base: jnp.ndarray  # (3, W2, 5) f32: bx_q @ [1, cos(a·x), sin(a·x), cos(c·x), sin(c·x)]
    geometry: tuple  # letterbox (scale, pad_top, pad_left)


def _build_tables(src_hw: tuple[int, int], imgsz: tuple[int, int], dtype) -> _FusedTables | None:
    folded = fold_stem_matrices(src_hw, imgsz, dtype=jnp.float32)
    if folded is None:
        return None
    by32 = np.asarray(folded.by, np.float32)  # (3, H2, src_h)
    bx32 = np.asarray(folded.bx, np.float32)
    ys = np.arange(src_hw[0], dtype=np.float32)
    xs = np.arange(src_hw[1], dtype=np.float32)
    ybasis = np.stack(
        [np.ones_like(ys), np.cos(_FY1 * ys), np.sin(_FY1 * ys), np.cos(_FY2 * ys), np.sin(_FY2 * ys)],
        axis=1,
    )  # (src_h, 5)
    xbasis = np.stack(
        [np.ones_like(xs), np.cos(_FX1 * xs), np.sin(_FX1 * xs), np.cos(_FX2 * xs), np.sin(_FX2 * xs)],
        axis=1,
    )
    return _FusedTables(
        by=jnp.asarray(by32, dtype),
        bx=jnp.asarray(bx32, dtype),
        y_base=jnp.asarray(by32 @ ybasis),  # (3, H2, 5) f32
        x_base=jnp.asarray(bx32 @ xbasis),
        geometry=folded.geometry,
    )


def _texture_stem(scene: SyntheticScene, tab: _FusedTables, cam_tls: jnp.ndarray) -> jnp.ndarray:
    """(B, 2) camera top-lefts → (B, 3, 3, H2, W2) f32 texture term of t.

    bg = L + A·sin(a·X)cos(b·Y) + A/2·[sin(c·X)cos(d·Y) + cos(c·X)sin(d·Y)]
    with X = x + cx, Y = y + cy; every per-view factor is a rotation of the
    precomputed y_base/x_base columns by the camera-offset angle.
    """
    cx = cam_tls[:, 0].astype(jnp.float32)
    cy = cam_tls[:, 1].astype(jnp.float32)
    ca, sa = jnp.cos(_FX1 * cx), jnp.sin(_FX1 * cx)
    cb, sb = jnp.cos(_FY1 * cy), jnp.sin(_FY1 * cy)
    cc, sc = jnp.cos(_FX2 * cx), jnp.sin(_FX2 * cx)
    cd, sd = jnp.cos(_FY2 * cy), jnp.sin(_FY2 * cy)
    zero = jnp.zeros_like(ca)
    one = jnp.ones_like(ca)
    L = jnp.float32(scene.bg_level)
    A = jnp.float32(scene.texture_amp)

    # per-view mixing matrices: columns of y_base/x_base → 4 rank-1 factors
    # (B, 5, 4): [const, cos(b(y+cy)), cos(d(y+cy)), sin(d(y+cy))] for y
    ymix = jnp.stack(
        [
            jnp.stack([one, zero, zero, zero], -1),
            jnp.stack([zero, cb, zero, zero], -1),
            jnp.stack([zero, -sb, zero, zero], -1),
            jnp.stack([zero, zero, cd, sd], -1),
            jnp.stack([zero, zero, -sd, cd], -1),
        ],
        axis=1,
    )
    # (B, 5, 4): [L·const, A·sin(a(x+cx)), A/2·sin(c(x+cx)), A/2·cos(c(x+cx))]
    xmix = jnp.stack(
        [
            jnp.stack([L * one, zero, zero, zero], -1),
            jnp.stack([zero, A * sa, zero, zero], -1),
            jnp.stack([zero, A * ca, zero, zero], -1),
            jnp.stack([zero, zero, 0.5 * A * sc, 0.5 * A * cc], -1),
            jnp.stack([zero, zero, 0.5 * A * cc, -0.5 * A * sc], -1),
        ],
        axis=1,
    )
    yfac = jnp.einsum("pyk,bkr->bpyr", tab.y_base, ymix)  # (B, 3, H2, 4) f32
    xfac = jnp.einsum("qxk,bkr->bqxr", tab.x_base, xmix)  # (B, 3, W2, 4) f32
    # the big (B, 3, 3, H2, W2) product runs in the compute dtype — matching
    # the precision of the view tensor the standard path quantizes to
    dt = tab.by.dtype
    return jnp.einsum(
        "bpyr,bqxr->bpqyx", yfac.astype(dt), xfac.astype(dt), preferred_element_type=jnp.float32
    ).astype(dt)


def _blob_stem(
    scene: SyntheticScene,
    tab: _FusedTables,
    worm_xys: jnp.ndarray,
    cam_tls: jnp.ndarray,
    frame_idx: jnp.ndarray,
    src_hw: tuple[int, int],
) -> jnp.ndarray:
    """Worm-blob term of t: (B, 3, 3, H2, W2) in the compute dtype.

    Same window geometry as SyntheticScene.render_view — the selection
    matmuls become dynamic slices of the interpolation matrices.
    """
    h, w = src_hw
    win = min(scene.worm_window, h, w)
    dt = tab.by.dtype

    def one(wxy, ctl, fi):
        wx = wxy[0] - ctl[0].astype(jnp.float32)
        wy = wxy[1] - ctl[1].astype(jnp.float32)
        tx = jnp.clip(jnp.round(wx).astype(jnp.int32) - win // 2, 0, w - win)
        ty = jnp.clip(jnp.round(wy).astype(jnp.int32) - win // 2, 0, h - win)
        pys = (jnp.arange(win, dtype=jnp.float32)[:, None] + ty.astype(jnp.float32)) - wy
        pxs = (jnp.arange(win, dtype=jnp.float32)[None, :] + tx.astype(jnp.float32)) - wx
        blob = scene._worm_blob(
            jnp.broadcast_to(pxs, (win, win)), jnp.broadcast_to(pys, (win, win)), fi
        ).astype(dt)
        zero = jnp.int32(0)  # literal ints promote to i64 under jax_enable_x64
        a = jax.lax.dynamic_slice(tab.by, (zero, zero, ty), (3, tab.by.shape[1], win))  # by_p @ Py
        b = jax.lax.dynamic_slice(tab.bx, (zero, zero, tx), (3, tab.bx.shape[1], win))
        m = jnp.einsum("pyk,kl->pyl", a, blob, preferred_element_type=jnp.float32).astype(dt)
        return jnp.einsum("pyl,qxl->pqyx", m, b, preferred_element_type=jnp.float32)

    return jax.vmap(one)(worm_xys, cam_tls, frame_idx)


def render_stem(
    scene: SyntheticScene,
    tab: _FusedTables,
    weff: jnp.ndarray,
    bias: jnp.ndarray,
    worm_xys: jnp.ndarray,
    cam_tls: jnp.ndarray,
    frame_idx: jnp.ndarray,
    src_hw: tuple[int, int],
) -> jnp.ndarray:
    """(B,) scene views → (B, H2, W2, out_ch) stem activations, no view tensor.

    Equals ``stem_apply(folded, stem_params, scene.render_views(...))`` up to
    bf16 reassociation (requires :func:`scene_is_clip_free`).
    """
    dt = tab.by.dtype
    t = _texture_stem(scene, tab, cam_tls) + _blob_stem(
        scene, tab, worm_xys, cam_tls, frame_idx, src_hw
    ).astype(dt)
    b, _, _, h2, w2 = t.shape
    tk = jnp.moveaxis(t.reshape(b, 9, h2, w2), 1, -1)  # (B, H2, W2, 9)
    z = jnp.einsum("byxk,ko->byxo", tk, weff.astype(dt), preferred_element_type=jnp.float32)
    return _silu((z + bias.astype(jnp.float32)).astype(dt))


def make_fused_render_detect(
    model,
    scene: SyntheticScene,
    src_hw: tuple[int, int],
    imgsz: tuple[int, int],
    conf: float,
    batch_fold: int = 0,
):
    """Engine hook ``(variables, worm_xys, cam_tls, frame_idx) -> (B, 4)``
    running render→stem→detector with no view tensor, or ``None`` when the
    geometry can't fold or the scene can clip.

    The returned boxes are xywh in *view* coordinates with NaN rows below
    ``conf`` — the same contract as the folded-stem detect path
    (models/yolov8.py make_folded_detect); callers add the camera offset.
    """
    if not scene_is_clip_free(scene):
        return None
    if model.compute_dtype != jnp.bfloat16:
        # the post-stem walker computes in bf16; refusing beats a silent
        # precision downgrade of an f32-typed detector
        raise ValueError("fuse_render requires a bf16-compute detector")
    tab = _build_tables(src_hw, imgsz, model.compute_dtype)
    if tab is None:
        return None
    nc, mscale, reg_max = model.nc, model.scale, model.reg_max

    def detect(variables, worm_xys, cam_tls, frame_idx):
        from wtracker_tpu.models.yolov8_int8 import forward_from_b0_bf16

        stem = variables["params"]["b0"]["conv"]
        z = render_stem(
            scene, tab, stem_weff(stem), stem["bias"], worm_xys,
            cam_tls.astype(jnp.float32), frame_idx, src_hw,
        )
        box_logits, cls_logits = forward_from_b0_bf16(variables, z, nc, mscale, batch_fold)
        return top1_source_boxes(box_logits, cls_logits, imgsz, reg_max, tab.geometry, conf)

    detect.fuses_render = True
    return detect


def make_fused_render_detect_int8(
    q,
    scene: SyntheticScene,
    src_hw: tuple[int, int],
    imgsz: tuple[int, int],
    conf: float,
    batch_fold: int = 0,
):
    """int8 twin of :func:`make_fused_render_detect`: render→stem in bf16,
    requantize at b0's calibrated scale, continue the int8 graph from b1
    (mirrors :meth:`wtracker_tpu.models.yolov8_int8.QuantizedYolo.apply_folded`).

    ``q`` is a QuantizedYolo; the returned hook takes ``(qw, worm_xys,
    cam_tls, frame_idx)`` with ``qw = q.device_weights()`` and carries
    ``fuses_render=True`` — pass it as the engine's ``detect_fn``.
    """
    if not scene_is_clip_free(scene):
        return None
    tab = _build_tables(src_hw, imgsz, jnp.bfloat16)
    if tab is None:
        return None

    def detect(qw, worm_xys, cam_tls, frame_idx):
        from wtracker_tpu.models.yolov8_int8 import (
            _forward_from_b0,
            _forward_from_b0_batchfolded,
            _QT,
            _quant,
        )

        ops = q._apply_ops(qw)
        z = render_stem(scene, tab, q.stem_weff(qw), qw["b0"]["b"], worm_xys,
                        cam_tls.astype(jnp.float32), frame_idx, src_hw)
        s_b0 = ops._scale_of("b0")
        xq = _QT(_quant(z, s_b0), np.full(z.shape[-1], s_b0))
        if batch_fold:
            box_logits, cls_logits = _forward_from_b0_batchfolded(
                ops, xq, q.nc, q.scale, worm_xys.shape[0], batch_fold
            )
        else:
            box_logits, cls_logits = _forward_from_b0(ops, xq, q.nc, q.scale)
        return top1_source_boxes(box_logits, cls_logits, imgsz, q.reg_max, tab.geometry, conf)

    detect.fuses_render = True
    return detect
