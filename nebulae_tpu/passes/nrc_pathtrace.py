"""Path tracing with the neural radiance cache in the loop.

Mirrors the reference's two-kernel NRC scheme (DeferredRenderer.cpp:396-591):
a full-resolution *query* pass whose paths terminate early into the cache
(spread heuristic), and a reduced-resolution *training* pass whose longer
paths generate per-vertex training records, with self-training tail queries.
Both are plain JAX over the packet tracer; the cache MLP trains in-graph
(nrc.cache.train_cache_step) inside the same jitted frame, replacing the
CUDA-side QueryAndTrain black box (NvRtxgiNRC.cpp:145-148).

RNG: the query pass follows the standard draw-order contract; the training
pass uses an independent seed offset (frame ^ 0x9E3779B9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nebulae_tpu.core import brdf
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core import rng as nrng
from nebulae_tpu.core.surface import reconstruct_surface
from nebulae_tpu.nrc.cache import primary_spread, query_cache, spread_term, train_cache_step
from nebulae_tpu.passes.gbuffer import detach
from nebulae_tpu.tracer.sorting import DEAD_ORIGIN, ray_sort_key, sorted_any, sorted_closest

PI = 3.14159265358979


def _trace_bounce(scene, closest_fn, origin, direction, alive, cfg, sort):
    origin_b = jax.lax.stop_gradient(jnp.where(alive[..., None], origin, DEAD_ORIGIN))
    d_b = jax.lax.stop_gradient(direction)
    if sort:
        key = ray_sort_key(origin_b, d_b, scene["aabb_min"], scene["aabb_max"], alive)
        return detach(sorted_closest(closest_fn, origin_b, d_b, key))
    return detach(closest_fn(origin_b, d_b))


def _nee(scene, surf, view, sun, alive, any_fn, rng_state, cfg, sort):
    """Sun NEE at a vertex (2 draws). Returns (direct_radiance, rng)."""
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    l = brdf.sun_disk_sample(u1, u2, sun.direction[None, :], sun.tan_half_angle, jnp)
    n_dot_l = jnp.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(
        surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], jnp
    )
    origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
    shoot = alive & (n_dot_l > 0.0)
    origin_sh = jax.lax.stop_gradient(jnp.where(shoot[..., None], origin, DEAD_ORIGIN))
    l_sh = jax.lax.stop_gradient(l)
    if sort:
        key = ray_sort_key(origin_sh, l_sh, scene["aabb_min"], scene["aabb_max"], shoot)
        occ = sorted_any(any_fn, origin_sh, l_sh, key)
    else:
        occ = any_fn(origin_sh, l_sh)
    vis = jnp.where(shoot & ~occ, 1.0, 0.0)
    direct = f * (n_dot_l * vis)[..., None] * sun.radiance[None, :]
    return jnp.where(alive[..., None], direct + surf["emissive"], 0.0), rng_state


def path_trace_nrc_query(scene, gbuf, sun, closest_fn, any_fn, rng_state, cfg, cache_params):
    """Full-res query pass: paths terminate into the cache by spread heuristic.

    Returns (radiance, rng_state)."""
    n_pix = gbuf["ray_d"].shape[0]
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    throughput = jnp.ones((n_pix, 3), jnp.float32)
    alive = gbuf["hit"]
    surf = {k: gbuf[k] for k in ("position", "normal_g", "normal_s", "albedo", "roughness", "metalness", "emissive")}
    view = gbuf["view"]

    # Spread tracking (Nrc.hlsli:200-203): primary spread from the G-buffer.
    cos0 = jnp.clip(nmath.dot(surf["normal_s"], view)[..., 0], 1e-3, 1.0)
    spread0 = primary_spread(gbuf["depth"], cos0)
    spread0 = jnp.where(jnp.isfinite(spread0), spread0, 0.0)
    spread = jnp.zeros(n_pix, jnp.float32)

    # Cache-query record (set once, at the terminating vertex).
    q_set = jnp.zeros(n_pix, bool)
    q_surf = {k: jnp.zeros_like(v) for k, v in surf.items()}
    q_view = jnp.zeros_like(view)
    q_thr = jnp.zeros_like(throughput)

    for bounce in range(cfg.max_bounces):
        direct, rng_state = _nee(scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays and bounce > 0)
        acc = acc + throughput * direct

        if bounce == cfg.max_bounces - 1:
            break

        rng_state, u1 = nrng.next_float(rng_state)
        rng_state, u2 = nrng.next_float(rng_state)
        new_d = brdf.cosine_hemisphere_sample(u1, u2, surf["normal_s"], jnp)
        weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], jnp)
        throughput = throughput * weight
        origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])

        hit = _trace_bounce(scene, closest_fn, origin, new_d, alive, cfg, cfg.sort_rays)
        found = hit["tri"] >= 0
        acc = acc + jnp.where((alive & ~found)[..., None], throughput * sun.sky_color[None, :], 0.0)
        alive = alive & found
        surf = reconstruct_surface(scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=jnp)
        view = -new_d

        # Spread accumulation at the new vertex; pdf = cos/pi (cosine sampling).
        cos_g = jnp.clip(nmath.dot(surf["normal_s"], view)[..., 0], 1e-3, 1.0)
        pdf = cos_g / PI
        spread = spread + spread_term(hit["t"], cos_g, pdf)
        terminate = alive & (spread > cfg.nrc_terminate_threshold * spread0) & ~q_set
        # Record the cache query at the terminating vertex.
        for k in q_surf:
            q_surf[k] = jnp.where(terminate[..., None] if q_surf[k].ndim == 2 else terminate, surf[k], q_surf[k])
        q_view = jnp.where(terminate[..., None], view, q_view)
        q_thr = jnp.where(terminate[..., None], throughput, q_thr)
        q_set = q_set | terminate
        alive = alive & ~terminate

    # Resolve: query radiance x prefix throughput (radiance_resolve.hlsl:24-32).
    pred = query_cache(cache_params, q_surf, q_view, scene["aabb_min"], scene["aabb_max"])
    acc = acc + jnp.where(q_set[..., None], q_thr * pred, 0.0)
    return acc, rng_state


def path_trace_nrc_train(scene, sun, closest_fn, any_fn, cfg, cache_state, optimizer, cam, frame):
    """Reduced-res training pass: long paths -> per-vertex records -> 1 adam step.

    Returns (new_cache_state, loss)."""
    from nebulae_tpu.passes.gbuffer import camera_rays_jax, render_gbuffer

    tw = max(cfg.width // 4, 8)
    th = max(cfg.height // 4, 8)
    n_pix = tw * th

    # Jittered rays decorrelate training samples across frames.
    ys, xs = jnp.meshgrid(jnp.arange(th, dtype=jnp.uint32), jnp.arange(tw, dtype=jnp.uint32), indexing="ij")
    rng_state = nrng.init_rng(xs.reshape(-1), ys.reshape(-1), tw, frame ^ jnp.uint32(0x9E3779B9))
    rng_state, jx = nrng.next_float(rng_state)
    rng_state, jy = nrng.next_float(rng_state)
    o, d = camera_rays_jax(cam, tw, th, jitter=jnp.stack([jx, jy], -1))
    gbuf = render_gbuffer(scene, closest_fn, o, d)

    k_verts = cfg.nrc_max_path_vertices
    throughput = jnp.ones((n_pix, 3), jnp.float32)
    alive = gbuf["hit"]
    surf = {k: gbuf[k] for k in ("position", "normal_g", "normal_s", "albedo", "roughness", "metalness", "emissive")}
    view = gbuf["view"]

    verts = []  # per-vertex records
    weights_after = []  # segment throughput multiplier applied after vertex k

    for bounce in range(k_verts):
        direct, rng_state = _nee(scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays and bounce > 0)
        verts.append(
            {
                "position": surf["position"],
                "normal": surf["normal_s"],
                "view": view,
                "roughness": surf["roughness"],
                "albedo": surf["albedo"],
                "metalness": surf["metalness"],
                "local": direct,  # emitted + direct-reflected at this vertex
                "alive": alive,
            }
        )
        if bounce == k_verts - 1:
            weights_after.append(jnp.zeros((n_pix, 3), jnp.float32))
            break
        rng_state, u1 = nrng.next_float(rng_state)
        rng_state, u2 = nrng.next_float(rng_state)
        new_d = brdf.cosine_hemisphere_sample(u1, u2, surf["normal_s"], jnp)
        weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], jnp)
        origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
        hit = _trace_bounce(scene, closest_fn, origin, new_d, alive, cfg, cfg.sort_rays)
        found = hit["tri"] >= 0
        # Sky closes the path: fold into the segment target via a virtual
        # "local" at the next vertex; simplest is to add sky to this vertex's
        # outgoing estimate through the weight chain below.
        sky_term = jnp.where((alive & ~found)[..., None], weight * sun.sky_color[None, :], 0.0)
        verts[-1]["local"] = verts[-1]["local"] + sky_term
        weights_after.append(jnp.where((alive & found)[..., None], weight, 0.0))
        alive = alive & found
        surf = reconstruct_surface(scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=jnp)
        view = -new_d

    # Self-training tail: cache query at the last vertex (Nrc.hlsli:529-551).
    if cfg.nrc_self_training:
        tail_pred = query_cache(
            jax.lax.stop_gradient(cache_state["ema_params"]),
            surf,
            view,
            scene["aabb_min"],
            scene["aabb_max"],
        )
        tail = jnp.where(alive[..., None], tail_pred, 0.0)
    else:
        tail = jnp.zeros((n_pix, 3), jnp.float32)

    # Backward-accumulate per-vertex targets: L_k = local_k + w_k * L_{k+1}.
    target = tail
    targets = [None] * len(verts)
    for k in reversed(range(len(verts))):
        target = verts[k]["local"] + weights_after[k] * target
        targets[k] = target

    records = {
        "position": jnp.concatenate([v["position"] for v in verts]),
        "normal": jnp.concatenate([v["normal"] for v in verts]),
        "view": jnp.concatenate([v["view"] for v in verts]),
        "roughness": jnp.concatenate([v["roughness"] for v in verts]),
        "albedo": jnp.concatenate([v["albedo"] for v in verts]),
        "metalness": jnp.concatenate([v["metalness"] for v in verts]),
        "target": jnp.concatenate(targets),
        "weight": jnp.concatenate([v["alive"].astype(jnp.float32) for v in verts]),
    }
    return train_cache_step(cache_state, optimizer, records, scene["aabb_min"], scene["aabb_max"])
