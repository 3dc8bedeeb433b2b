"""Time the moving-camera (orbit) frame: exercises the SVGF history warp.

Usage: python tools/_orbitbench.py [--iters 5]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.core.camera import Camera
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--trace", type=str, default=None, help="xprof dir for one orbit frame")
    args = ap.parse_args()

    cfg = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=True,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    cam_obj = bench_camera(fs)
    r = Renderer(fs, cfg)

    def orbit_cam(i):
        ang = 0.02 * (i + 1)
        tgt = np.asarray(cam_obj.target, np.float32)
        rel = np.asarray(cam_obj.eye, np.float32) - tgt
        c, s = np.cos(ang), np.sin(ang)
        rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        return Camera(eye=tgt + rot @ rel, target=tgt, fov_y_deg=cam_obj.fov_y_deg)

    out = r.render(cam_obj)
    float(out["ldr"].mean())
    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = r.render(cam_obj)
        float(out["ldr"].mean())
    static_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"static frame  {static_ms:8.1f} ms", flush=True)

    out = r.render(orbit_cam(0))
    float(out["ldr"].mean())
    t0 = time.perf_counter()
    for i in range(args.iters):
        out = r.render(orbit_cam(i + 1))
        float(out["ldr"].mean())
    orbit_ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"orbit frame   {orbit_ms:8.1f} ms  ({orbit_ms / static_ms:.2f}x static)", flush=True)
    if args.trace:
        with jax.profiler.trace(args.trace):
            out = r.render(orbit_cam(99))
            float(out["ldr"].mean())
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
