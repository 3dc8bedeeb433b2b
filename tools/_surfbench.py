"""Microbench: one bounce iteration's trace+unsort+reconstruct, with the
surface reconstruct (a) full-width after the hit unsort (round-2 shipped
path) vs (b) inside the sorting layer via surf_fn (prefix-domain for small
buckets).  Controlled live fractions pick the compaction bucket.

Usage: python tools/_surfbench.py [--fracs 64 16 4]
"""
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

from nebulae_tpu.config import RenderConfig
from nebulae_tpu.engine.renderer import Renderer
from nebulae_tpu.passes.pathtrace import _SURF_FILL, _reconstruct
from nebulae_tpu.tracer.sorting import ray_sort_key, sorted_shadow_closest
from nebulae_tpu.utils.testscenes import bench_camera, helmet_field
from nebulae_tpu.core.surface import reconstruct_surface_fast

N = 2_073_600
K = 4


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--fracs", type=int, nargs="*", default=[64, 16, 4])
    args = ap.parse_args()

    cfg = RenderConfig(width=1920, height=1080, fast_bounce_shading=True, tracer="auto")
    fs = helmet_field(3, 3, max_texture_dim=512)
    r = Renderer(fs, cfg)
    scene, bvh = r.scene, r.bvh
    from nebulae_tpu.tracer.trace import make_tracer

    closest_fn, any_fn = make_tracer(scene, bvh, cfg)
    combo = getattr(closest_fn, "combo", None)

    rng = np.random.default_rng(0)
    lo, hi = np.asarray(scene["aabb_min"]), np.asarray(scene["aabb_max"])
    o_np = rng.uniform(lo + 0.3 * (hi - lo), hi - 0.3 * (hi - lo), (N, 3)).astype(np.float32)
    d_np = rng.normal(size=(N, 3)).astype(np.float32)
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    l_np = rng.normal(size=(N, 3)).astype(np.float32) * 0.02 + np.array([0.35, 0.8, 0.45], np.float32)
    l_np /= np.linalg.norm(l_np, axis=-1, keepdims=True)
    o, d, l = jnp.asarray(o_np), jnp.asarray(d_np), jnp.asarray(l_np)

    def time_fn(f, *xs):
        g = jax.jit(f)
        out = g(*xs)
        jax.tree.map(lambda x: x.block_until_ready(), out)
        float(jax.tree.leaves(out)[0].sum())
        t0 = time.perf_counter()
        for _ in range(K):
            out = g(*xs)
            float(jax.tree.leaves(out)[0].sum())
        return (time.perf_counter() - t0) / K * 1e3

    def surf_fn(hit, os, ds):
        s = reconstruct_surface_fast(scene, hit["tri"], hit["u"], hit["v"], os, ds, hit["t"], jnp)
        s.pop("position")
        return s

    for frac in args.fracs:
        n_live = N // frac
        alive = jnp.arange(N) < n_live
        # scatter live lanes around the image so the sort does real work
        alive = jnp.roll(alive, 12345)

        def keyed(o, d, alive):
            return ray_sort_key(
                o, d, scene["aabb_min"], scene["aabb_max"], alive,
                low_bits=alive.astype(jnp.int32) + 2 * alive.astype(jnp.int32),
            )

        def baseline(o, l, d, alive):
            key = keyed(o, d, alive)
            occ, hit = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key, combo_fn=combo)
            surf = surf_fn(hit, o, d)
            return occ, hit["t"], surf["albedo"], surf["normal_s"]

        def fused(o, l, d, alive):
            key = keyed(o, d, alive)
            occ, hit, surf = sorted_shadow_closest(
                any_fn, closest_fn, o, l, d, key, combo_fn=combo,
                surf_fn=surf_fn, surf_fill=_SURF_FILL,
            )
            return occ, hit["t"], surf["albedo"], surf["normal_s"]

        def trace_only(o, l, d, alive):
            key = keyed(o, d, alive)
            occ, hit = sorted_shadow_closest(any_fn, closest_fn, o, l, d, key, combo_fn=combo)
            return occ, hit["t"]

        t0 = time_fn(trace_only, o, l, d, alive)
        t1 = time_fn(baseline, o, l, d, alive)
        t2 = time_fn(fused, o, l, d, alive)
        print(f"live 1/{frac:<3d} trace-only {t0:7.1f}  +fullwidth-reconstruct {t1:7.1f}  fused-surf {t2:7.1f} ms")


if __name__ == "__main__":
    main()
