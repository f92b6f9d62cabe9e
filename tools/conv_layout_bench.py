"""A/B the batch→height folding (ops/foldbatch.py) on the problem convs.

The round-3 trace showed the early detector convs (≤128 channels at 208²/104²
/52², B≈360) running batch-minor layouts at 8-16% MXU.  This tool measures,
per shape, the device time of

* ``plain``    — the batched conv as the detector runs it today;
* ``fold``     — fold + conv + unfold (what a single-op swap would cost);
* ``fold_pre`` — conv on an already-folded input (what chained integration
  amortizes to, including the seam re-zero mask);
* ``group``    — batch→channel folding: G images reshaped into G·C channels,
  conv with a G-tiled kernel + ``feature_group_count=G`` (full 128-wide
  lanes, no seams; viable only if XLA lowers grouped convs well);
* ``group_pre`` — the grouped conv on an already-grouped input.

Methodology follows docs/performance.md round 3: each variant runs as a
``lax.scan`` whose *inputs vary per iteration* (two rotating buffers — a
loop-invariant body gets hoisted and measures nothing), traced with
``jax.profiler.trace``, and scored by the xplane "XLA Modules" device time.

Usage::

    python tools/conv_layout_bench.py [--iters 24] [--batch 360] [--shapes b1,b3]
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# (in_h, in_ch, out_ch, stride) at B=360 — the flagship detect-chunk geometry
SHAPES = {
    "b1": (208, 32, 64, 2),
    "b2m": (104, 32, 32, 1),
    "b3": (104, 64, 128, 2),
    "b4m": (52, 64, 64, 1),
    "n16": (52, 128, 128, 2),
    "h52": (52, 128, 128, 1),
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--batch", type=int, default=360)
    ap.add_argument("--shapes", default="all")
    ap.add_argument("--seams", default="auto", help="comma list, or auto (8 and 16)")
    ap.add_argument("--groups", type=int, default=8, help="batch->channel group count (0 = skip)")
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"],
                    help="int8 = s8xs8->s32 convs with an f32 dequant epilogue (the serving path's shape)")
    ap.add_argument("--trace-dir", default="/tmp/wtracker-foldbench")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import wtracker_tpu  # noqa: F401
    from tools.trace_profile import parse_xspace
    from wtracker_tpu.ops.foldbatch import fold_batch, seam_mask, unfold_batch

    names = list(SHAPES) if args.shapes == "all" else args.shapes.split(",")
    int8 = args.dtype == "int8"
    dt = jnp.int8 if int8 else jnp.bfloat16
    G = args.groups

    def conv(x, k, stride, groups=1):
        y = jax.lax.conv_general_dilated(
            x, k, (stride, stride), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=groups,
            preferred_element_type=jnp.int32 if int8 else None,
        )
        if int8:  # serving-path shape: dequant epilogue fused into the conv
            y = jnp.clip(jnp.round(y.astype(jnp.float32) * 0.02), -127, 127).astype(jnp.int8)
        return y

    def to_grouped(x, g):
        b, h, w, c = x.shape
        return x.reshape(b // g, g, h, w, c).transpose(0, 2, 3, 1, 4).reshape(b // g, h, w, g * c)

    def from_grouped(y, g):
        bg, h, w, gc = y.shape
        return y.reshape(bg, h, w, g, gc // g).transpose(0, 3, 1, 2, 4).reshape(bg * g, h, w, gc // g)

    def run_traced(fn, bufs, tag):
        scan = jax.jit(
            lambda bufs: jax.lax.scan(
                lambda c, i: (c + fn(bufs, i), None), jnp.float32(0), jnp.arange(args.iters)
            )[0]
        )
        _ = float(scan(bufs))  # compile + warm
        d = os.path.join(args.trace_dir, tag)
        shutil.rmtree(d, ignore_errors=True)
        with jax.profiler.trace(d):
            _ = float(scan(bufs))
        module_ps, _, _ = parse_xspace(d)
        if module_ps == 0:
            print("no device plane in the trace — run this on the TPU", file=sys.stderr)
            sys.exit(1)
        return module_ps / 1e9 / args.iters  # ms per iteration

    rng = np.random.default_rng(0)
    print(f"B={args.batch}, {args.iters} iters/window, {args.dtype}, device-trace ms/iter")
    print(f"{'shape':>6} {'conv':>16} {'plain':>8}", end="")
    for name in names:
        h, cin, cout, stride = SHAPES[name]
        seams = [8, 16] if args.seams == "auto" else [int(s) for s in args.seams.split(",")]
        b = args.batch
        if int8:
            k = jnp.asarray(rng.integers(-127, 128, (3, 3, cin, cout)), dt)
            bufs = jnp.asarray(rng.integers(-127, 128, (2, b, h, h, cin)), dt)
        else:
            k = jnp.asarray(rng.standard_normal((3, 3, cin, cout)) * 0.05, dt)
            bufs = jnp.asarray(rng.standard_normal((2, b, h, h, cin)), dt)

        def probe(out):  # cheap DCE guard: conv must run, reduce only a sliver
            return jnp.sum(out[:, 0, 0, :].astype(jnp.float32))

        t_plain = run_traced(
            lambda bufs, i: probe(conv(bufs[i % 2], k, stride)), bufs, f"{name}-plain"
        )
        row = f"\n{name:>6} {f'3x3 s{stride} {cin}->{cout} @{h}':>18} plain {t_plain:6.2f}"
        for seam in seams:
            if stride == 2 and seam % 2:
                continue
            fbufs = jnp.stack([fold_batch(bufs[j], seam) for j in range(2)])
            mask = seam_mask(b, h, seam, dt)

            t_fold = run_traced(
                lambda bufs, i, seam=seam: probe(
                    unfold_batch(conv(fold_batch(bufs[i % 2], seam), k, stride), b, h // stride)
                ),
                bufs,
                f"{name}-fold{seam}",
            )
            t_pre = run_traced(
                lambda fbufs, i, mask=mask: probe(conv(fbufs[i % 2] * mask, k, stride)),
                fbufs,
                f"{name}-pre{seam}",
            )
            row += f"  s{seam}: fold {t_fold:6.2f} pre {t_pre:6.2f}"
        if G and b % G == 0:
            kg = jnp.tile(k, (1, 1, 1, G))
            gbufs = jnp.stack([to_grouped(bufs[j], G) for j in range(2)])
            t_group = run_traced(
                lambda bufs, i: probe(
                    from_grouped(conv(to_grouped(bufs[i % 2], G), kg, stride, G), G)
                ),
                bufs,
                f"{name}-group{G}",
            )
            t_gpre = run_traced(
                lambda gbufs, i: probe(conv(gbufs[i % 2], kg, stride, G)), gbufs, f"{name}-gpre{G}"
            )
            row += f"  g{G}: grp {t_group:6.2f} gpre {t_gpre:6.2f}"
        print(row, end="", flush=True)
    print()


if __name__ == "__main__":
    main()
