"""NRC training-schedule sweep: cache quality vs per-frame cost.

Sweeps nrc_train_iterations (k x 16K-record adam steps per frame, the
reference's numTrainingIterations knob, DeferredRenderer.cpp:229-234) on the
atrium scene -- the interior workload where cache termination actually fires
(open scenes leak bounce rays to the sky; SURVEY/PERFORMANCE notes).

For each setting: run N frames, report frame time, final cache loss (EMA of
the last quarter), query fraction, and the cache-vs-pathtrace image gap
(mean |nrc_frame - reference 4-bounce frame| over hit pixels).

Usage: python tools/nrc_sweep.py [--frames 24] [--size 256] [--iters 1,2,4,8]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=24)
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--iters", type=str, default="1,2,4,8")
    ap.add_argument("--grid", type=int, default=2, help="atrium helmet grid")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from dataclasses import replace

    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer
    from nebulae_tpu.utils.testscenes import atrium_camera, helmet_atrium

    fs = helmet_atrium(args.grid, args.grid, max_texture_dim=512)
    cam = atrium_camera(fs)
    print(f"scene: {fs.num_triangles} tris; {args.frames} frames @ {args.size}^2")

    base = RenderConfig(
        width=args.size, height=args.size, spp=1, max_bounces=6,
        enable_svgf=False, enable_tonemap=False, enable_nrc=True,
        nrc_max_path_vertices=6, fast_bounce_shading=True,
    )

    # Reference image: long-path non-NRC render averaged over frames.
    ref_r = Renderer(fs, replace(base, enable_nrc=False, max_bounces=8))
    accum = None
    for i in range(8):
        out = ref_r.render(cam)
        img = np.asarray(out["hdr"])
        accum = img if accum is None else accum + img
    ref_img = accum / 8
    hit = np.asarray(out["hit"])
    bvh = ref_r.bvh

    rows = []
    for iters in [int(x) for x in args.iters.split(",")]:
        cfg = replace(base, nrc_train_iterations=iters)
        r = Renderer(fs, cfg, bvh=bvh)
        out = r.render(cam)
        float(out["hdr"].mean())  # compile + warm
        losses, qf = [], []
        t0 = time.perf_counter()
        for _ in range(args.frames):
            out = r.render(cam)
            losses.append(float(out["nrc_loss"]))
            qf.append(float(out["nrc_query_frac"]))
        dt = (time.perf_counter() - t0) / args.frames
        img = np.asarray(out["hdr"])
        gap = float(np.abs(img - ref_img)[hit].mean())
        tail = losses[-max(len(losses) // 4, 1):]
        row = {
            "nrc_train_iterations": iters,
            "frame_ms": round(dt * 1e3, 1),
            "cache_loss_tail": round(float(np.mean(tail)), 5),
            "query_frac": round(float(np.mean(qf[-4:])), 4),
            "img_gap_vs_ref": round(gap, 5),
        }
        rows.append(row)
        print(json.dumps(row))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
