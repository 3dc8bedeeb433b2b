"""Dissect the NRC-frame cost: plain vs NRC-query vs NRC-train frame.

The round-3 bench showed nrc_fwd_frame_ms regressing 236.7 -> 339.6 while
the plain frame improved; docs/PERFORMANCE.md attributes ~100 ms to XLA's
memory-space assignment evicting the 7.2 MB tri_fast gather table from VMEM
in the fatter NRC program.  This tool isolates the halves and times fix
candidates on the chip.

Usage: python tools/_nrcbench.py [--iters 4] [--only substr]
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from dataclasses import replace

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def time_renderer(r, cam, iters):
    out = r.render(cam)
    float(out["ldr"].mean())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = r.render(cam)
        float(out["ldr"].mean())
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--trace", type=str, default=None, help="xprof trace dir for the LAST variant")
    args = ap.parse_args()

    base = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=True,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    cam = bench_camera(fs)

    variants = [
        ("plain fwd", base),
        ("nrc fwd", replace(base, enable_nrc=True)),
        ("nrc fwd, carried qrec", replace(base, enable_nrc=True, nrc_inline_resolve=False)),
        ("nrc fwd, no self-training", replace(base, enable_nrc=True, nrc_self_training=False)),
        ("nrc fwd, 1 train iter", replace(base, enable_nrc=True, nrc_train_iterations=1)),
    ]
    if args.only:
        exact = [(n, c) for n, c in variants if args.only == n]
        variants = exact or [(n, c) for n, c in variants if args.only in n]

    bvh = None
    for i, (name, cfg) in enumerate(variants):
        r = Renderer(fs, cfg, bvh=bvh)
        if bvh is None:
            bvh = r.bvh
        ms = time_renderer(r, cam, args.iters)
        print(f"{name:40s} {ms:8.1f} ms", flush=True)
        if args.trace and i == len(variants) - 1:
            with jax.profiler.trace(args.trace):
                out = r.render(cam)
                float(out["ldr"].mean())
            print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
