"""Direct PBR lighting pass: sun-disk NEE with one jittered shadow ray.

TPU-native equivalent of the reference's deferred PBR compute pass
(assets/shaders/deferred_pbr.hlsl:80-113 dispatched at
DeferredRenderer.cpp:382): Cook-Torrance + Lambert under a single directional
sun with an inline any-hit shadow ray.  Visibility is detached; BRDF, sun
radiance and albedo all carry gradients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nebulae_tpu.core import brdf
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core import rng as nrng


def shade_direct(scene: dict, gbuf: dict, sun, any_fn, rng_state):
    """Returns (radiance [N, 3], new rng_state). RNG contract: 2 draws."""
    n = gbuf["normal_s"]
    v = gbuf["view"]
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    l = brdf.sun_disk_sample(u1, u2, sun.direction[None, :], sun.tan_half_angle, jnp)
    n_dot_l = jnp.clip(nmath.dot(n, l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(n, v, l, gbuf["albedo"], gbuf["roughness"], gbuf["metalness"], jnp)
    origin = brdf.offset_ray_origin(gbuf["position"], gbuf["normal_g"])
    shoot = gbuf["hit"] & (n_dot_l > 0.0)
    # Eject unlit/missed lanes outside the scene: their packet tiles retire
    # on the root AABB test instead of traversing with garbage origins.
    from nebulae_tpu.tracer.sorting import DEAD_ORIGIN

    origin_sh = jnp.where(shoot[..., None], origin, DEAD_ORIGIN)
    occluded = any_fn(jax.lax.stop_gradient(origin_sh), jax.lax.stop_gradient(l))
    vis = jnp.where(shoot & ~occluded, 1.0, 0.0)
    radiance = f * (n_dot_l * vis)[..., None] * sun.radiance[None, :]
    return jnp.where(gbuf["hit"][..., None], radiance + gbuf["emissive"], 0.0), rng_state
