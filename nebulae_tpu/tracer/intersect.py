"""Ray-primitive intersection primitives (jax.numpy, jit/vmap-friendly).

Two-sided Moller-Trumbore ray-triangle test and slab ray-AABB test.  These are
the building blocks of both the XLA-level traversal (tracer.trace) and the
Pallas wavefront kernels (kernels.*) -- the D3D12 equivalent is the hardware
`TraceRay`/`RayQuery` (pathtracer.hlsl:497, deferred_pbr.hlsl:100-110).
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-7


def ray_triangle(o, d, v0, e1, e2, t_min=EPS, t_max=jnp.inf):
    """Batched two-sided Moller-Trumbore.

    o, d: [..., 3]; v0, e1, e2: [..., 3] (broadcast-compatible).
    Returns (hit [...], t, u, v) with t = +inf on miss.
    """
    pvec = jnp.cross(d, e2)
    det = (e1 * pvec).sum(-1)
    inv_det = jnp.where(jnp.abs(det) < EPS, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    tvec = o - v0
    u = (tvec * pvec).sum(-1) * inv_det
    qvec = jnp.cross(tvec, e1)
    v = (d * qvec).sum(-1) * inv_det
    t = (e2 * qvec).sum(-1) * inv_det
    hit = (
        (jnp.abs(det) >= EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > t_min)
        & (t < t_max)
    )
    return hit, jnp.where(hit, t, jnp.inf), u, v


def ray_aabb(o, inv_d, lo, hi, t_max):
    """Slab test. o, inv_d: [..., 3]; lo, hi: [..., 3]. Returns hit [...] bool.

    inv_d must be precomputed as 1/d with +/-inf for zero components (IEEE
    inf*0 = nan handled via min/max ordering below).
    """
    t0 = (lo - o) * inv_d
    t1 = (hi - o) * inv_d
    tsmall = jnp.minimum(t0, t1)
    tbig = jnp.maximum(t0, t1)
    tenter = jnp.max(tsmall, axis=-1)
    texit = jnp.min(tbig, axis=-1)
    return (tenter <= texit) & (texit > EPS) & (tenter < t_max)


def safe_inv_dir(d):
    """1/d with signed-inf for zero components (slab-test safe)."""
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    mag = jnp.maximum(jnp.abs(d), 1e-12)
    return sign / mag
