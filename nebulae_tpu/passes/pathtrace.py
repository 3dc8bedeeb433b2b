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


SURF_KEYS = ("position", "normal_g", "normal_s", "albedo", "roughness", "metalness", "emissive")


def _nee_direct(scene, surf, view, sun, alive, any_fn, rng_state, cfg, sort):
    """Sun-disk NEE at a vertex (2 draws). Returns (direct, rng_state)."""
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    l = brdf.sun_disk_sample(u1, u2, sun.direction[None, :], sun.tan_half_angle, jnp)
    n_dot_l = jnp.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(
        surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], jnp
    )
    origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
    # Dead/unlit lanes get ejected far outside the scene so their packet
    # tiles retire on the root AABB test.
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
    return direct, rng_state


def path_trace(scene, gbuf, sun, closest_fn, any_fn, rng_state, cfg):
    """Trace indirect GI starting from the G-buffer surfaces.

    The bounce loop is a `lax.scan` with a uniform body (NEE + indirect
    trace), followed by one final NEE -- identical RNG draw order to the CPU
    oracle's loop, but the XLA graph stays one-bounce-sized regardless of
    max_bounces (unrolling made backward compiles take minutes).

    Returns (radiance [N, 3], rng_state).
    """
    n_pix = gbuf["ray_d"].shape[0]
    surf0 = {k: gbuf[k] for k in SURF_KEYS}
    acc0 = jnp.where(gbuf["hit"][..., None], surf0["emissive"], 0.0)

    def bounce_body(carry, _):
        rng_state, throughput, alive, acc, surf, view = carry
        direct, rng_state = _nee_direct(
            scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays
        )
        acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)

        # --- indirect: cosine hemisphere (2 draws) ---
        rng_state, u1 = nrng.next_float(rng_state)
        rng_state, u2 = nrng.next_float(rng_state)
        new_d = brdf.cosine_hemisphere_sample(u1, u2, surf["normal_s"], jnp)
        weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], jnp)
        throughput = throughput * weight
        if cfg.throughput_threshold > 0.0:
            alive = alive & (throughput.max(axis=-1) > cfg.throughput_threshold)

        origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
        origin_b = jax.lax.stop_gradient(jnp.where(alive[..., None], origin, DEAD_ORIGIN))
        d_b = jax.lax.stop_gradient(new_d)
        if cfg.sort_rays:
            key = ray_sort_key(origin_b, d_b, scene["aabb_min"], scene["aabb_max"], alive)
            hit = detach(sorted_closest(closest_fn, origin_b, d_b, key))
        else:
            hit = detach(closest_fn(origin_b, d_b))
        found = hit["tri"] >= 0
        sky = brdf.sky_eval(new_d, sun, scene, cfg, jnp)
        acc = acc + jnp.where((alive & ~found)[..., None], throughput * sky, 0.0)
        alive = alive & found
        if cfg.fast_bounce_shading:
            from nebulae_tpu.core.surface import reconstruct_surface_fast

            surf_full = reconstruct_surface_fast(
                scene, hit["tri"], hit["u"], hit["v"], origin, new_d, hit["t"], jnp
            )
        else:
            surf_full = reconstruct_surface(
                scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=jnp
            )
        surf = {k: surf_full[k] for k in SURF_KEYS}
        acc = acc + jnp.where(alive[..., None], throughput * surf["emissive"], 0.0)
        return (rng_state, throughput, alive, acc, surf, -new_d), None

    carry = (rng_state, jnp.ones((n_pix, 3), jnp.float32), gbuf["hit"], acc0, surf0, gbuf["view"])
    if cfg.max_bounces > 1:
        carry, _ = jax.lax.scan(bounce_body, carry, None, length=cfg.max_bounces - 1)
    rng_state, throughput, alive, acc, surf, view = carry
    # Final vertex: NEE only (matches the oracle's "break before indirect").
    direct, rng_state = _nee_direct(scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays)
    acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)
    return acc, rng_state
