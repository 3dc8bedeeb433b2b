"""Same-session A/B: live-count switch vs frame-lagged bucket scheduling.

Runs both configurations back-to-back in one process/tunnel session so
session-to-session variance (~10-20% through the tunnel) cancels.
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


def time_cfg(name, fs, cam, cfg, bvh, iters=6, warmup=1):
    r = Renderer(fs, cfg, bvh=bvh)
    for _ in range(warmup):
        out = r.render(cam)
        float(out["ldr"].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = r.render(cam)
        m = float(out["ldr"].mean())
    s = (time.perf_counter() - t0) / iters
    sched = getattr(r, "_sched_jits", None)
    extra = ""
    if cfg.bucket_scheduling:
        import numpy as np

        extra = (f" programs={len(sched)} counts={np.asarray(r.state['live_counts']).tolist()}")
    print(f"{name}: fwd_frame_ms={s * 1e3:.1f} mean={m:.5f}{extra}", flush=True)
    return r.bvh


def main():
    full_shading = "--full-shading" in sys.argv
    cfg = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=not full_shading,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    cam = bench_camera(fs)
    bvh = time_cfg("switch   ", fs, cam, cfg, None)
    time_cfg("scheduled", fs, cam, replace(cfg, bucket_scheduling=True), bvh, warmup=3)
    time_cfg("switch2  ", fs, cam, cfg, bvh)


if __name__ == "__main__":
    main()
