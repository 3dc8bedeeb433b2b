"""Wavefront path tracing pass (differentiable, XLA level).

The TPU-native counterpart of the reference's DXR raygen megakernel
(assets/shaders/pathtracer.hlsl:397-625): primary hit comes from the
G-buffer (no primary rays re-traced), then a fixed-trip-count bounce loop
with masked lanes -- sun-disk NEE at every vertex, cosine-hemisphere
Lambertian indirect bounces, constant-sky miss radiance.  Data-dependent
termination (path death) becomes masking; the loop is unrolled at trace time
(max_bounces is static), so XLA fuses each bounce's shading into large fused
elementwise blocks between the traversal calls.

RNG contract (identical to ref.tracer.path_trace_np): per bounce 2 draws NEE
then, if not the last bounce, 2 draws indirect direction.

Returns per-pixel HDR radiance including direct lighting at every vertex; an
optional `nrc` hook terminates paths into the neural radiance cache instead
of tracing the full tail (passes.nrc_integration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nebulae_tpu.core import brdf
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core import rng as nrng
from nebulae_tpu.core.surface import reconstruct_surface
from nebulae_tpu.passes.gbuffer import detach
from nebulae_tpu.tracer.sorting import DEAD_ORIGIN, ray_sort_key, sorted_any, sorted_closest


def path_trace(scene, gbuf, sun, closest_fn, any_fn, rng_state, cfg, collect_vertices=False):
    """Trace indirect GI starting from the G-buffer surfaces.

    Returns (radiance [N, 3], rng_state) -- or with collect_vertices=True a
    third element: per-bounce path-vertex records for NRC training.
    """
    n_pix = gbuf["ray_d"].shape[0]
    sun_dir = sun.direction
    sun_rad = sun.radiance
    sky = sun.sky_color

    acc = jnp.zeros((n_pix, 3), jnp.float32)
    throughput = jnp.ones((n_pix, 3), jnp.float32)
    alive = gbuf["hit"]
    surf = {k: gbuf[k] for k in ("position", "normal_g", "normal_s", "albedo", "roughness", "metalness", "emissive")}
    view = gbuf["view"]
    acc = acc + jnp.where(alive[..., None], surf["emissive"], 0.0) * throughput
    vertices = []

    for bounce in range(cfg.max_bounces):
        # --- NEE: sun disk (2 draws) ---
        rng_state, u1 = nrng.next_float(rng_state)
        rng_state, u2 = nrng.next_float(rng_state)
        l = brdf.sun_disk_sample(u1, u2, sun_dir[None, :], sun.tan_half_angle, jnp)
        n_dot_l = jnp.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
        f = brdf.eval_brdf(
            surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], jnp
        )
        origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
        # Dead/unlit lanes get ejected far outside the scene so their packet
        # tiles retire on the root AABB test.
        shoot = alive & (n_dot_l > 0.0)
        origin_sh = jax.lax.stop_gradient(
            jnp.where(shoot[..., None], origin, DEAD_ORIGIN)
        )
        l_sh = jax.lax.stop_gradient(l)
        if cfg.sort_rays and bounce > 0:
            key = ray_sort_key(origin_sh, l_sh, scene["aabb_min"], scene["aabb_max"], shoot)
            occ = sorted_any(any_fn, origin_sh, l_sh, key)
        else:
            occ = any_fn(origin_sh, l_sh)
        vis = jnp.where(shoot & ~occ, 1.0, 0.0)
        direct = f * (n_dot_l * vis)[..., None] * sun_rad[None, :]
        acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)

        if collect_vertices:
            vertices.append(
                {
                    "position": surf["position"],
                    "normal": surf["normal_s"],
                    "view": view,
                    "albedo": surf["albedo"],
                    "roughness": surf["roughness"],
                    "metalness": surf["metalness"],
                    "radiance": direct + surf["emissive"],  # local emitted+reflected direct
                    "throughput": throughput,
                    "alive": alive,
                }
            )

        if bounce == cfg.max_bounces - 1:
            break

        # --- indirect: cosine hemisphere (2 draws) ---
        rng_state, u1 = nrng.next_float(rng_state)
        rng_state, u2 = nrng.next_float(rng_state)
        new_d = brdf.cosine_hemisphere_sample(u1, u2, surf["normal_s"], jnp)
        weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], jnp)
        throughput = throughput * weight
        if cfg.throughput_threshold > 0.0:
            alive = alive & (throughput.max(axis=-1) > cfg.throughput_threshold)

        origin_b = jax.lax.stop_gradient(
            jnp.where(alive[..., None], origin, DEAD_ORIGIN)
        )
        d_b = jax.lax.stop_gradient(new_d)
        if cfg.sort_rays:
            key = ray_sort_key(origin_b, d_b, scene["aabb_min"], scene["aabb_max"], alive)
            hit = detach(sorted_closest(closest_fn, origin_b, d_b, key))
        else:
            hit = detach(closest_fn(origin_b, d_b))
        found = hit["tri"] >= 0
        acc = acc + jnp.where((alive & ~found)[..., None], throughput * sky[None, :], 0.0)
        alive = alive & found
        surf = reconstruct_surface(scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=jnp)
        acc = acc + jnp.where(alive[..., None], throughput * surf["emissive"], 0.0)
        view = -new_d

    if collect_vertices:
        return acc, rng_state, vertices
    return acc, rng_state
