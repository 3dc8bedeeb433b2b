"""Time + trace the full train step (fwd+bwd+adam) on the bench scene."""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer, init_frame_state
from nebulae_tpu.engine.train import make_train_step, split_scene_params
from nebulae_tpu.passes.gbuffer import make_camera_arrays
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()

    cfg = RenderConfig(
        width=1920, height=1080, spp=1, max_bounces=4,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        lean_outputs=True, fast_bounce_shading=True,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    renderer = Renderer(fs, cfg)
    cam = make_camera_arrays(bench_camera(fs), 1920, 1080)

    params, frozen = split_scene_params(renderer.scene)
    params["sun"] = renderer.sun
    step, optimizer = make_train_step(cfg, frozen, renderer.bvh)
    opt_state = optimizer.init(params)
    state = init_frame_state(cfg)
    target = jnp.zeros((1080, 1920, 3), jnp.float32)
    jstep = jax.jit(step)
    out = jstep(params, opt_state, cam, state, target)
    float(out[3])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        p2, o2, state, loss, img = jstep(params, opt_state, cam, state, target)
        float(loss)
    ms = (time.perf_counter() - t0) / args.iters * 1e3
    print(f"train step {ms:8.1f} ms", flush=True)
    if args.trace:
        with jax.profiler.trace(args.trace):
            p2, o2, state, loss, img = jstep(params, opt_state, cam, state, target)
            float(loss)
        print(f"trace written to {args.trace}")


if __name__ == "__main__":
    main()
