"""Surface reconstruction at a hit point from the flat scene tables.

Equivalent of the reference's `ReconstructSurfaceData` (bindless fetch of
indices -> positions -> normals -> uvs -> material textures with barycentric
interpolation and normal-map TBN, pathtracer.hlsl:299-395) -- but against the
pre-flattened world-space SoA triangle tables, so it is two gathers + lerps.

xp-generic: `scene` is a dict of numpy or jax.numpy arrays
(FlatScene.device_arrays()).
"""

from __future__ import annotations

import numpy as np

from nebulae_tpu.core import math as nmath
from nebulae_tpu.core.scene import (
    MAT_HAS_BASECOLOR_TEX,
    MAT_HAS_METALROUGH_TEX,
    MAT_HAS_NORMAL_TEX,
)
from nebulae_tpu.core.texture import sample_bilinear, srgb_to_linear


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def interpolate(attr, tri_id, u, v, xp):
    """Barycentric interpolation of a per-corner attribute [T, 3, C]."""
    a = attr[tri_id]  # [..., 3, C]
    w = (1.0 - u - v)[..., None]
    return a[..., 0, :] * w + a[..., 1, :] * u[..., None] + a[..., 2, :] * v[..., None]


def reconstruct_surface(scene: dict, tri_id, u, v, view_dir=None, xp=None):
    """Shade-ready surface attributes at barycentric (u, v) on triangle tri_id.

    Returns a dict with: position, normal_g (geometric), normal_s (shaded,
    normal-mapped), uv, albedo (linear), roughness, metalness, emissive.
    ``tri_id`` entries may be invalid for missed rays; callers mask.
    """
    xp = xp or _xp(u)
    t = xp.clip(tri_id, 0, scene["tri_pos"].shape[0] - 1)
    pos = interpolate(scene["tri_pos"], t, u, v, xp)
    nrm = nmath.normalize(interpolate(scene["tri_nrm"], t, u, v, xp))
    uv = interpolate(scene["tri_uv"], t, u, v, xp)
    tan4 = interpolate(scene["tri_tan"], t, u, v, xp)

    # Geometric normal from the triangle plane
    v0 = scene["tri_pos"][t, 0]
    e1 = scene["tri_pos"][t, 1] - v0
    e2 = scene["tri_pos"][t, 2] - v0
    ng = nmath.normalize(nmath.cross(e1, e2))
    # Orient geometric normal along the shading normal hemisphere
    ng = ng * xp.where(nmath.dot(ng, nrm) < 0.0, -1.0, 1.0)

    mat = scene["tri_mat"][t]
    flags = scene["mat_flags"][mat]
    base = scene["mat_base_color"][mat]
    rough = scene["mat_roughness"][mat]
    metal = scene["mat_metallic"][mat]
    emissive = scene["mat_emissive"][mat]

    albedo = base[..., :3]
    if scene["textures"].shape[0] > 0:
        tex_ids = scene["mat_tex_ids"][mat]
        bc = sample_bilinear(scene["textures"], scene["tex_hw"], tex_ids[..., 0], uv, xp)
        has_bc = (flags & MAT_HAS_BASECOLOR_TEX) != 0
        albedo = xp.where(has_bc[..., None], albedo * srgb_to_linear(bc[..., :3]), albedo)

        mr = sample_bilinear(scene["textures"], scene["tex_hw"], tex_ids[..., 1], uv, xp)
        has_mr = (flags & MAT_HAS_METALROUGH_TEX) != 0
        rough = xp.where(has_mr, rough * mr[..., 1], rough)  # G channel
        metal = xp.where(has_mr, metal * mr[..., 2], metal)  # B channel

        nm = sample_bilinear(scene["textures"], scene["tex_hw"], tex_ids[..., 2], uv, xp)
        has_nm = (flags & MAT_HAS_NORMAL_TEX) != 0
        tn = nm[..., :3] * 2.0 - 1.0
        tangent = nmath.normalize(
            tan4[..., :3] - nrm * nmath.dot(tan4[..., :3], nrm)
        )
        bitangent = nmath.cross(nrm, tangent) * tan4[..., 3:4]
        mapped = nmath.normalize(
            tn[..., 0:1] * tangent + tn[..., 1:2] * bitangent + tn[..., 2:3] * nrm
        )
        ns = xp.where(has_nm[..., None], mapped, nrm)
    else:
        ns = nrm

    if view_dir is not None:
        # Flip shading normal toward the viewer for double-sided hits
        flip = xp.where(nmath.dot(ns, view_dir) < 0.0, -1.0, 1.0)
        ns = ns * flip
        ng = ng * flip

    return {
        "position": pos,
        "normal_g": ng,
        "normal_s": ns,
        "uv": uv,
        "albedo": albedo,
        "roughness": xp.clip(rough, 0.02, 1.0),
        "metalness": xp.clip(metal, 0.0, 1.0),
        "emissive": emissive,
    }
