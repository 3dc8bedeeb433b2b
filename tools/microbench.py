"""Jitted traversal-kernel microbench (the ONLY valid way to time kernels:
eager pallas_call pays up to 6x dispatch penalty -- docs/PERFORMANCE.md).

Usage:
    python tools/microbench.py [--leaves 4,8,12,15] [--wides 2,4] [--iters 4]

Measures, per (max_leaf, bvh_wide) config on the bench scene:
  primary closest (coherent), sorted bounce closest, sorted shadow any,
  fused shadow+bounce combo.
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from nebulae_tpu.bvh.builder import build_bvh
from nebulae_tpu.kernels import pallas_trace as pt
from nebulae_tpu.passes.gbuffer import make_camera_arrays, camera_rays_jax
from nebulae_tpu.tracer.sorting import ray_sort_key
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field

W, H = 1920, 1080
N = W * H


def timed(fn, *args, n_iter=4):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf, jnp.float32).ravel()[0])  # force host readback
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.asarray(leaf, jnp.float32).ravel()[0])
    return (time.perf_counter() - t0) / n_iter * 1e3


def make_rays():
    fs = helmet_field(3, 3, max_texture_dim=512)
    tri_pos = np.asarray(fs.tri_pos)
    cam = bench_camera(fs)
    camd = make_camera_arrays(cam, W, H)
    o, d = camera_rays_jax(camd, W, H)
    o = jnp.asarray(o).reshape(-1, 3)
    d = jnp.asarray(d).reshape(-1, 3)

    # primary hits for secondary-ray origins (any tree works; use leaf 8 fat)
    bvh = build_bvh(tri_pos, max_leaf=8)
    fat = {k: jnp.asarray(v) for k, v in pt.pack_bvh_fat(bvh, tri_pos).items()}
    hits = pt.pallas_closest_hit_fat(o, d, fat)
    t = np.asarray(hits["t"])
    tc = np.where(np.isfinite(t), t, 10.0).astype(np.float32)
    po = np.asarray(o) + np.asarray(d) * tc[:, None] * 0.999

    rng = np.random.default_rng(0)
    bd = rng.normal(size=(N, 3)).astype(np.float32)
    bd /= np.linalg.norm(bd, axis=1, keepdims=True)
    sun = np.array([0.35, 0.9, 0.2], np.float32)
    sun /= np.linalg.norm(sun)
    ld = np.broadcast_to(sun, (N, 3)).astype(np.float32)
    ld = ld + 0.01 * rng.normal(size=(N, 3)).astype(np.float32)
    ld /= np.linalg.norm(ld, axis=1, keepdims=True)

    amin, amax = jnp.asarray(fs.aabb_min), jnp.asarray(fs.aabb_max)

    @jax.jit
    def sort3(o_, d_, d2_):
        key = ray_sort_key(o_, d_, amin, amax)
        srt = jax.lax.sort(
            [key, o_[:, 0], o_[:, 1], o_[:, 2], d_[:, 0], d_[:, 1], d_[:, 2],
             d2_[:, 0], d2_[:, 1], d2_[:, 2]],
            num_keys=1,
        )
        return (jnp.stack(srt[1:4], -1), jnp.stack(srt[4:7], -1),
                jnp.stack(srt[7:10], -1))

    so_b, sd_b, sd_bl = sort3(jnp.asarray(po), jnp.asarray(bd), jnp.asarray(ld))
    so_l, sd_l, _ = sort3(jnp.asarray(po), jnp.asarray(ld), jnp.asarray(bd))
    jax.block_until_ready((so_b, sd_b, sd_bl, so_l, sd_l))
    return fs, tri_pos, (o, d), (so_b, sd_b, sd_bl), (so_l, sd_l)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--leaves", default="8")
    ap.add_argument("--wides", default="4")
    ap.add_argument("--groups", default="8")
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()
    leaves = [int(x) for x in args.leaves.split(",")]
    wides = [int(x) for x in args.wides.split(",")]
    groups = [int(x) for x in args.groups.split(",")]

    fs, tri_pos, (o, d), (so_b, sd_b, sd_bl), (so_l, sd_l) = make_rays()
    print(f"scene: {len(tri_pos)} tris, {args.iters} iters, jitted")
    print(f"{'config':16s} {'primary':>8s} {'bounce':>8s} {'shadow':>8s} {'combo':>8s}")

    for leaf in leaves:
        bvh = build_bvh(tri_pos, max_leaf=leaf)
        for wide in wides:
          for grp in groups:
            if wide == 4:
                packed = pt.pack_bvh_fat4(bvh, tri_pos, tri_group=grp)
                closest, anyf, combo = (pt.pallas_closest_hit_fat4,
                                        pt.pallas_any_hit_fat4,
                                        pt.pallas_shadow_closest_fat4)
                packed.pop("fat4_slots", None)
            else:
                packed = pt.pack_bvh_fat(bvh, tri_pos, tri_group=grp)
                closest, anyf, combo = (pt.pallas_closest_hit_fat,
                                        pt.pallas_any_hit_fat,
                                        pt.pallas_shadow_closest_fat)
            packed = {k: jnp.asarray(v) for k, v in packed.items()}
            ms_p = timed(lambda: closest(o, d, packed), n_iter=args.iters)
            ms_b = timed(lambda: closest(so_b, sd_b, packed), n_iter=args.iters)
            ms_s = timed(lambda: anyf(so_l, sd_l, packed, 100.0), n_iter=args.iters)
            ms_c = timed(lambda: combo(so_b, sd_b, sd_bl, packed, jnp.inf, 100.0),
                         n_iter=args.iters)
            print(f"leaf={leaf:<3d} w={wide} G={grp:<2d} {ms_p:8.1f} {ms_b:8.1f} {ms_s:8.1f} {ms_c:8.1f}")


if __name__ == "__main__":
    main()
