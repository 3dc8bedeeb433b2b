"""Jitted full-frame ablation: where does the frame time go?

Usage: python tools/framebench.py [--iters 4]
Times the bench-scene 1080p frame with features toggled one at a time.
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--grid", type=int, default=3, help="helmet field grid (4 = ~247k tris, chunked BVH)")
    ap.add_argument("--only", type=str, default=None, help="substring filter on variant names")
    args = ap.parse_args()

    base = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=True,
    )
    fs = helmet_field(args.grid, args.grid, max_texture_dim=512)
    print(f"scene: {fs.num_triangles} triangles")
    cam = bench_camera(fs)

    variants = [
        ("full frame", base),
        ("no svgf", replace(base, enable_svgf=False)),
        ("direct only (0 gi bounces)", replace(base, max_bounces=1)),
        ("2 bounces", replace(base, max_bounces=2)),
        ("no gi at all", replace(base, enable_gi=False)),
        ("no tonemap", replace(base, enable_tonemap=False)),
        ("no ray sort", replace(base, sort_rays=False)),
        ("full bounce shading", replace(base, fast_bounce_shading=False)),
    ]

    if args.only:
        variants = [(n, c) for n, c in variants if args.only in n]
    bvh = None
    for name, cfg in variants:
        r = Renderer(fs, cfg, bvh=bvh)
        if bvh is None:
            bvh = r.bvh
        # device-side mean -> scalar readback (a full-image readback rides
        # the tunnel at ~25 MB/frame and would dominate the timing)
        out = r.render(cam)
        float(out["ldr"].mean())
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = r.render(cam)
            float(out["ldr"].mean())
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"{name:32s} {ms:8.1f} ms")


if __name__ == "__main__":
    main()
