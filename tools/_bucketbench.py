"""Measure conditional-serialization overhead: default live-count switch vs
NEB_FIXED_BUCKET=k pinned bucket (run via env var; knob read at import).

Usage: NEB_FIXED_BUCKET=4 python tools/_bucketbench.py [--iters 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--full-shading", action="store_true")
    ap.add_argument("--sched", action="store_true", help="frame-lagged bucket scheduling")
    args = ap.parse_args()

    cfg = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=not args.full_shading,
        bucket_scheduling=args.sched,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    r = Renderer(fs, cfg)
    cam = bench_camera(fs)
    # Warmup: with --sched, frame 0 is the full-width bootstrap and frame 1
    # compiles the steady-state scheduled program; time only steady state.
    for _ in range(3 if args.sched else 1):
        out = r.render(cam)
        float(out["ldr"].mean())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = r.render(cam)
        m = float(out["ldr"].mean())
    s = (time.perf_counter() - t0) / args.iters
    print(
        f"NEB_FIXED_BUCKET={os.environ.get('NEB_FIXED_BUCKET', '0')} "
        f"full_shading={args.full_shading} fwd_frame_ms={s * 1e3:.1f} mean={m:.5f}"
    )


if __name__ == "__main__":
    main()
