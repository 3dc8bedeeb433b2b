"""Isolate why the static-bucket program is slower than the live switch.

Variants (same session):
  switch          -- default live-count lax.switch
  sched-adaptive  -- bucket_scheduling (counts tracked, scan split 1+2)
  sched-explicit  -- bucket_schedule=(4,64,64,64), NO count tracking
  sched-uniform   -- bucket_schedule=(64,64,64,64), ONE scan (inexact b0)
  sched-allfour   -- bucket_schedule=(4,4,4,4), ONE scan (exact, fat buckets)
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from dataclasses import replace

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def time_cfg(name, fs, cam, cfg, bvh, iters=5, warmup=1):
    r = Renderer(fs, cfg, bvh=bvh)
    for _ in range(warmup):
        out = r.render(cam)
        float(out["ldr"].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = r.render(cam)
        m = float(out["ldr"].mean())
    s = (time.perf_counter() - t0) / iters
    print(f"{name}: fwd_frame_ms={s * 1e3:.1f} mean={m:.5f}", flush=True)
    return r.bvh


def main():
    base = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=True,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    cam = bench_camera(fs)
    bvh = time_cfg("switch        ", fs, cam, base, None)
    time_cfg("sched-explicit", fs, cam, replace(base, bucket_schedule=(4, 64, 64, 64)), bvh)
    time_cfg("sched-uniform ", fs, cam, replace(base, bucket_schedule=(64, 64, 64, 64)), bvh)
    time_cfg("sched-allfour ", fs, cam, replace(base, bucket_schedule=(4, 4, 4, 4)), bvh)
    time_cfg("switch2       ", fs, cam, base, bvh)


if __name__ == "__main__":
    main()
