"""On-device synthetic microscopy: rendered worm views without frame storage.

The reference's no-data backend is a white-frame DummyReader
(frame_reader.py:247-272).  This module is its content-bearing TPU twin: given
a ground-truth trajectory, it renders camera views directly on device — a
textured agar-like background plus an anisotropic worm blob — as a pure
function of (frame index, camera position).  Full-scale closed-loop runs with
a live detector then need zero bytes of image storage or host→device traffic:
the view is generated inside the scan right where the detector consumes it.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np


def make_trajectory(
    num_frames: int,
    arena_hw: tuple[int, int],
    seed: int = 0,
    speed: float = 0.9,
    drift: float = 0.25,
    margin: int = 40,
) -> np.ndarray:
    """A smooth random-walk worm trajectory, (F, 2) float64 (x, y)."""
    rng = np.random.default_rng(seed)
    h, w = arena_hw
    steps = rng.normal(0, speed, size=(num_frames - 1, 2)) + drift
    # smooth with a running average for worm-like motion
    kernel = np.ones(15) / 15
    steps[:, 0] = np.convolve(steps[:, 0], kernel, mode="same")
    steps[:, 1] = np.convolve(steps[:, 1], kernel, mode="same")
    pos = np.concatenate([[[w / 2, h / 2]], steps]).cumsum(axis=0)
    pos[:, 0] = margin + np.abs(pos[:, 0] - margin) % (2 * (w - 2 * margin)) % (w - 2 * margin)
    pos[:, 1] = margin + np.abs(pos[:, 1] - margin) % (2 * (h - 2 * margin)) % (h - 2 * margin)
    return pos


# texture frequencies of SyntheticScene._texture, exposed for analysis
# tooling that reproduces the texture analytically
TEX_FX1, TEX_FY1 = 0.07, 0.05  # sin(FX1·X)·cos(FY1·Y)
TEX_FX2, TEX_FY2 = 0.013, 0.017  # 0.5·sin(FX2·X + FY2·Y), expanded separably
TEXTURE_BOUND = 1.5
"""Peak |texture| in units of ``texture_amp`` (one unit-amplitude separable
product plus half a unit-amplitude phase-sum sinusoid)."""


@dataclass(frozen=True)
class SyntheticScene:
    """Parametric scene: background texture + worm appearance.

    The renderer is transcendental-budgeted for the live loop (it runs for
    every frame of every stream): the background texture is fully separable —
    the mixed-frequency term expands via sin(a+b) = sin·cos + cos·sin — so
    per view only O(h+w) sin/cos evaluate; and the worm Gaussian evaluates on
    a ``worm_window``² patch around the worm (beyond ~5σ it is zero at f32),
    not the full plane.  The round-1 full-plane renderer was the largest
    elementwise share of the cycle (docs/performance.md).
    """

    worm_sigma_x: float = 5.0
    worm_sigma_y: float = 3.0
    worm_intensity: float = 160.0
    bg_level: float = 40.0
    texture_amp: float = 10.0
    worm_window: int = 64
    """Static side of the patch the worm blob is evaluated on (≥ ~10σ)."""

    def _texture(self, xs: jnp.ndarray, ys: jnp.ndarray) -> jnp.ndarray:
        """Separable agar texture over absolute coords (stable under camera
        motion). ``xs``/``ys`` are broadcastable row/column coordinate arrays."""
        cross = jnp.sin(xs * TEX_FX2) * jnp.cos(ys * TEX_FY2) + jnp.cos(xs * TEX_FX2) * jnp.sin(ys * TEX_FY2)
        tex = jnp.sin(xs * TEX_FX1) * jnp.cos(ys * TEX_FY1) + 0.5 * cross
        return self.bg_level + self.texture_amp * tex

    def _worm_blob(self, dx: jnp.ndarray, dy: jnp.ndarray, frame_idx) -> jnp.ndarray:
        """Anisotropic Gaussian at offset (dx, dy) from the worm center."""
        t = jnp.asarray(frame_idx, dtype=jnp.float32)
        angle = 0.35 * jnp.sin(0.13 * t)
        ca, sa = jnp.cos(angle), jnp.sin(angle)
        # reciprocal sigmas as compile-time multiplies (divides are expensive
        # per-pixel on the VPU)
        inv_sx = jnp.float32(1.0 / self.worm_sigma_x)
        inv_sy = jnp.float32(1.0 / self.worm_sigma_y)
        u = (ca * dx + sa * dy) * inv_sx
        v = (-sa * dx + ca * dy) * inv_sy
        return self.worm_intensity * jnp.exp(-0.5 * (u * u + v * v))

    def render_view(
        self,
        worm_xy: jnp.ndarray,
        cam_tl: jnp.ndarray,
        view_hw: tuple[int, int],
        frame_idx: jnp.ndarray | int = 0,
        content_wh: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Render one camera view, (h, w) float32 in [0, 255].

        Args:
            worm_xy: (2,) ground-truth worm center in arena coordinates.
            cam_tl: (2,) camera top-left in arena coordinates.
            view_hw: static (h, w) of the view.
            frame_idx: seeds slight per-frame wiggle of the worm shape.
            content_wh: optional dynamic (w, h) content extent within the
                view canvas — for mixed-geometry batches where streams with
                smaller cameras render into a shared max-size canvas, the worm
                window clamps against the stream's own extent so the content
                region is bit-identical to a native-size render.
        """
        h, w = view_hw
        ys = jnp.arange(h, dtype=jnp.float32)[:, None] + cam_tl[1]
        xs = jnp.arange(w, dtype=jnp.float32)[None, :] + cam_tl[0]
        bg = jnp.broadcast_to(self._texture(xs, ys), (h, w))

        win = min(self.worm_window, h, w)
        clamp_w = w - win if content_wh is None else jnp.maximum(content_wh[0] - win, 0)
        clamp_h = h - win if content_wh is None else jnp.maximum(content_wh[1] - win, 0)
        # patch top-left in view coords, clamped inside the view; the Gaussian
        # is ≤1e-9·intensity beyond the patch, invisible at image scale
        wx = worm_xy[0] - cam_tl[0].astype(jnp.float32)
        wy = worm_xy[1] - cam_tl[1].astype(jnp.float32)
        tx = jnp.clip(jnp.round(wx).astype(jnp.int32) - win // 2, 0, clamp_w)
        ty = jnp.clip(jnp.round(wy).astype(jnp.int32) - win // 2, 0, clamp_h)

        pys = (jnp.arange(win, dtype=jnp.float32)[:, None] + ty.astype(jnp.float32)) - wy
        pxs = (jnp.arange(win, dtype=jnp.float32)[None, :] + tx.astype(jnp.float32)) - wx
        dy = jnp.broadcast_to(pys, (win, win))
        dx = jnp.broadcast_to(pxs, (win, win))
        blob = self._worm_blob(dx, dy, frame_idx)

        # Patch placement as two selection matmuls: Py @ blob @ Pxᵀ with 0/1
        # matrices built from iota comparisons.  A vmapped
        # dynamic_update_slice lowers to a scatter, which measured ~10× the
        # cost of the whole rest of the renderer at bench scale (1440 views:
        # 11.8 ms scatter vs 1.2 ms matmul form — docs/performance.md round
        # 3); HIGHEST-precision selection is bit-exact (one exact product per
        # output cell), so this is a pure lowering change.
        ks = jnp.arange(win, dtype=jnp.int32)[None, :]
        p_y = (jnp.arange(h, dtype=jnp.int32)[:, None] == ty + ks).astype(jnp.float32)
        p_x = (jnp.arange(w, dtype=jnp.int32)[:, None] == tx + ks).astype(jnp.float32)
        placed = jnp.einsum(
            "hk,kl,wl->hw", p_y, blob, p_x, precision=jax.lax.Precision.HIGHEST
        )
        return jnp.clip(bg + placed, 0, 255)

    def render_views(
        self,
        worm_xys: jnp.ndarray,
        cam_tls: jnp.ndarray,
        view_hw: tuple[int, int],
        frame_idx: jnp.ndarray,
        content_whs: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        """Batched rendering: (N, 2) worms + (N, 2) cameras → (N, h, w).

        ``content_whs`` (N, 2) optionally gives each view its own content
        extent inside the shared canvas (mixed-geometry batches).
        """
        if content_whs is None:
            return jax.vmap(lambda wxy, ctl, fi: self.render_view(wxy, ctl, view_hw, fi))(
                worm_xys, cam_tls, frame_idx
            )
        return jax.vmap(
            lambda wxy, ctl, fi, cwh: self.render_view(wxy, ctl, view_hw, fi, cwh)
        )(worm_xys, cam_tls, frame_idx, content_whs)

    def gt_bboxes(self, worm_xys: jnp.ndarray, k_sigma: float = 2.0) -> jnp.ndarray:
        """Ground-truth xywh boxes implied by the worm blob extent."""
        wx = 2 * k_sigma * self.worm_sigma_x
        wy = 2 * k_sigma * self.worm_sigma_y
        return jnp.concatenate(
            [
                worm_xys[..., 0:1] - wx / 2,
                worm_xys[..., 1:2] - wy / 2,
                jnp.full((*worm_xys.shape[:-1], 1), wx),
                jnp.full((*worm_xys.shape[:-1], 1), wy),
            ],
            axis=-1,
        )
