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
    MAT_HAS_EMISSIVE_TEX,
    MAT_HAS_METALROUGH_TEX,
    MAT_HAS_NORMAL_TEX,
)
from nebulae_tpu.core.texture import sample_bilinear, srgb_to_linear


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def _stopgrad(x, xp):
    if xp is np:
        return x
    import jax

    return jax.lax.stop_gradient(x)


def fetch_rows(table, idx, xp):
    """Differentiable small-table fetch: table [M, C] f32, idx [...] int.

    On TPU a plain gather transposes into a serialized scatter-add in the
    backward pass (~1000x slower than the forward); a one-hot matmul at
    precision=HIGHEST (f32-exact multi-pass) makes both directions MXU
    matmuls.  Used for the material factor tables, whose gradients are
    first-class training targets.  numpy path stays a plain gather."""
    if xp is np:
        return table[idx]
    import jax

    m = table.shape[0]
    oh = jax.nn.one_hot(idx, m, dtype=table.dtype)
    return jax.lax.dot_general(
        oh, table, (((oh.ndim - 1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )


def _take_rows(table, idx, xp):
    """Non-differentiable wide-row gather (geometry tables)."""
    t = _stopgrad(table, xp)
    if xp is np:
        return t[idx]
    import jax.numpy as jnp

    return jnp.take(t, idx, axis=0)


def _bary_packed(rows, u, v, c, xp):
    """Barycentric lerp of a packed corner slice [..., 3*c] -> [..., c].

    Slices, not a reshape to [..., 3, c]: the reshape forces a {0,1}
    (channel-planar) layout on the gathered rows, which makes XLA lower the
    wide-row gather ~3x slower AND insert a [N, 3c] transpose copy behind it
    (round-4 xprof finding: the NRC frame's 36 ms-per-bounce tri_fast fetch
    vs 11.4 ms for the same gather consumed layout-neutrally)."""
    w = (1.0 - u - v)[..., None]
    a0 = rows[..., 0 * c : 1 * c]
    a1 = rows[..., 1 * c : 2 * c]
    a2 = rows[..., 2 * c : 3 * c]
    return a0 * w + a1 * u[..., None] + a2 * v[..., None]


def _f32_int(col, xp):
    """Exact small integer carried in an f32 channel -> int32."""
    if xp is np:
        return np.rint(col).astype(np.int32)
    return xp.round(col).astype(xp.int32)


def interpolate(attr, tri_id, u, v, xp):
    """Barycentric interpolation of a per-corner attribute [T, 3, C].

    Geometry attribute tables are not gradient targets: the gather input is
    stop-gradiented (jax) so no scatter appears in the backward pass."""
    a = _stopgrad(attr, xp)[tri_id]  # [..., 3, C]
    w = (1.0 - u - v)[..., None]
    return a[..., 0, :] * w + a[..., 1, :] * u[..., None] + a[..., 2, :] * v[..., None]


def _shift_img(img, dy: int, dx: int, xp):
    """Clamp-to-edge shift of an image-shaped array (xp-generic)."""
    h, w = img.shape[0], img.shape[1]
    pad = [(max(dy, 0), max(-dy, 0)), (max(dx, 0), max(-dx, 0))] + [(0, 0)] * (img.ndim - 2)
    padded = xp.pad(img, pad, mode="edge")
    return padded[max(-dy, 0) : max(-dy, 0) + h, max(-dx, 0) : max(-dx, 0) + w]


def mip_level_from_uv(scene: dict, tri_id, u, v, height: int, width: int, xp=None):
    """Per-pixel mip level for the primary pass from screen-space UV
    derivatives -- the software analogue of the hardware ddx/ddy mip
    selection the reference's raster G-buffer gets for free
    (deferred_gbuffers.hlsl:72-90).  Forward differences on the row-major
    pixel grid; a tap crossing a triangle boundary falls back to the other
    direction (backward), else level 0.  Returns [H*W] int32 in
    [0, n_levels).  Requires scene['mat_tex_mip_ids'] (core.scene mips)."""
    xp = xp or _xp(u)
    n_levels = int(scene["mat_tex_mip_ids"].shape[1])
    t = xp.clip(tri_id, 0, scene["tri_pos"].shape[0] - 1)
    if "tri_geom" in scene and scene["tri_geom"].shape[0] > 0:
        # Same wide-row gather reconstruct_surface issues -- XLA CSEs the
        # two into one fetch, so level selection costs no extra gather.
        row = _take_rows(scene["tri_geom"], t, xp)
        uv = _bary_packed(row[..., 18:24], u, v, 2, xp).reshape(height, width, 2)
        aid = _f32_int(row[..., 38], xp)
    else:
        uv = interpolate(scene["tri_uv"], t, u, v, xp).reshape(height, width, 2)
        aid = scene["mat_atlas_id"][scene["tri_mat"][t]]
    tri_img = xp.asarray(tri_id).reshape(height, width)
    hw = _stopgrad(scene["mat_tex_mip_hw"], xp)[aid].reshape(height, width, 2)
    texel = xp.stack(
        [hw[..., 1].astype(uv.dtype), hw[..., 0].astype(uv.dtype)], axis=-1
    )  # (w, h) to scale (u, v)

    def deriv(dy, dx):
        d = _shift_img(uv, dy, dx, xp) - uv
        same = _shift_img(tri_img, dy, dx, xp) == tri_img
        fp = xp.abs(d * texel).max(axis=-1)
        return xp.where(same, fp, -1.0)  # -1 = invalid tap

    fx = deriv(0, -1)  # uv[x+1] - uv[x]
    fx = xp.where(fx >= 0.0, fx, deriv(0, 1))
    fy = deriv(-1, 0)
    fy = xp.where(fy >= 0.0, fy, deriv(1, 0))
    fp = xp.maximum(xp.maximum(fx, fy), 1.0)  # invalid (<0) -> level 0
    level = xp.clip(xp.floor(xp.log2(fp)).astype(xp.int32), 0, n_levels - 1)
    # No same-triangle tap in EITHER direction while every neighbor still
    # hits geometry: the mesh is tessellated below a pixel, i.e. maximal
    # minification (hardware ddx across such quads is equally huge) -- take
    # the coarsest level.  Pixels bordering a miss (silhouettes) keep their
    # derivative/0 level so magnified edges stay crisp.
    interior = (
        (_shift_img(tri_img, 0, -1, xp) >= 0)
        & (_shift_img(tri_img, 0, 1, xp) >= 0)
        & (_shift_img(tri_img, -1, 0, xp) >= 0)
        & (_shift_img(tri_img, 1, 0, xp) >= 0)
    )
    no_tap = (fx < 0.0) & (fy < 0.0)
    level = xp.where(no_tap & interior, n_levels - 1, level)
    return level.reshape(-1)


def reconstruct_surface(scene: dict, tri_id, u, v, view_dir=None, xp=None, mip_level=None):
    """Shade-ready surface attributes at barycentric (u, v) on triangle tri_id.

    Returns a dict with: position, normal_g (geometric), normal_s (shaded,
    normal-mapped), uv, albedo (linear), roughness, metalness, emissive.
    ``tri_id`` entries may be invalid for missed rays; callers mask.
    ``mip_level`` [N] int32 (mip_level_from_uv) selects atlas mip slots for
    the texture fetch; None samples level 0.
    """
    xp = xp or _xp(u)
    t = xp.clip(tri_id, 0, scene["tri_pos"].shape[0] - 1)
    packed = "tri_geom" in scene and scene["tri_geom"].shape[0] > 0
    if packed:
        # One wide-row gather for every geometry attribute + material ids
        # (scene.pack_geometry_rows); gather cost is per row, so this is ~2x
        # faster than the per-attribute fetches below.
        row = _take_rows(scene["tri_geom"], t, xp)
        v0, e1, e2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        pos = v0 + u[..., None] * e1 + v[..., None] * e2
        nrm = nmath.normalize(_bary_packed(row[..., 9:18], u, v, 3, xp))
        uv = _bary_packed(row[..., 18:24], u, v, 2, xp)
        tan4 = _bary_packed(row[..., 24:36], u, v, 4, xp)
        mat = _f32_int(row[..., 36], xp)
        flags = _f32_int(row[..., 37], xp)
        atlas_id = _f32_int(row[..., 38], xp)
    else:
        pos = interpolate(scene["tri_pos"], t, u, v, xp)
        nrm = nmath.normalize(interpolate(scene["tri_nrm"], t, u, v, xp))
        uv = interpolate(scene["tri_uv"], t, u, v, xp)
        tan4 = interpolate(scene["tri_tan"], t, u, v, xp)
        tp = _stopgrad(scene["tri_pos"], xp)
        v0 = tp[t, 0]
        e1 = tp[t, 1] - v0
        e2 = tp[t, 2] - v0
        mat = scene["tri_mat"][t]
        flags = scene["mat_flags"][mat]
        atlas_id = None

    # Geometric normal from the triangle plane, oriented along the shading
    # normal hemisphere
    ng = nmath.normalize(nmath.cross(e1, e2))
    ng = ng * xp.where(nmath.dot(ng, nrm) < 0.0, -1.0, 1.0)
    # Material factors: differentiable fetches (one-hot matmul on TPU).
    base = fetch_rows(scene["mat_base_color"], mat, xp)
    rough = fetch_rows(scene["mat_roughness"][:, None], mat, xp)[..., 0]
    metal = fetch_rows(scene["mat_metallic"][:, None], mat, xp)[..., 0]
    emissive = fetch_rows(scene["mat_emissive"], mat, xp)

    albedo = base[..., :3]
    use_atlas = "mat_tex" in scene and scene["mat_tex"].shape[0] > 0 and (
        scene["textures"].shape[0] > 0
    )
    if use_atlas:
        # Packed-atlas fetch: ONE 4-tap bilinear sample yields all material
        # maps (scene._pack_material_atlas).  Absent maps hold neutral texels
        # so the factor-multiply below reproduces the per-flag select of the
        # legacy path exactly.
        aid = atlas_id if atlas_id is not None else scene["mat_atlas_id"][mat]
        if "mat_tex_quad" in scene:
            from nebulae_tpu.core.texture import sample_bilinear_quad

            hw_tbl = scene["mat_tex_hw"]
            if "mat_tex_mip_ids" in scene:
                # Mip-extended atlas: per-pixel level -> slot indirection
                # (level 0 when the caller gave no levels); the hw table
                # covers the mip slots too.
                mip_ids = scene["mat_tex_mip_ids"]
                if mip_level is not None:
                    lv = xp.clip(mip_level, 0, mip_ids.shape[1] - 1)
                    aid = mip_ids.reshape(-1)[aid * mip_ids.shape[1] + lv]
                hw_tbl = scene["mat_tex_mip_hw"]
            px = sample_bilinear_quad(
                _stopgrad(scene["mat_tex_quad"], xp), hw_tbl, aid, uv, xp,
                row_off=scene.get("mat_tex_row_off"),
            )
        else:
            px = sample_bilinear(
                _stopgrad(scene["mat_tex"], xp), scene["mat_tex_hw"], aid, uv, xp
            )
        albedo = albedo * srgb_to_linear(px[..., 0:3])
        rough = rough * px[..., 3]
        metal = metal * px[..., 4]
        emissive = emissive * srgb_to_linear(px[..., 8:11])
        has_nm = (flags & MAT_HAS_NORMAL_TEX) != 0
        tn = px[..., 5:8] * 2.0 - 1.0
        tangent = nmath.normalize(
            tan4[..., :3] - nrm * nmath.dot(tan4[..., :3], nrm)
        )
        bitangent = nmath.cross(nrm, tangent) * tan4[..., 3:4]
        mapped = nmath.normalize(
            tn[..., 0:1] * tangent + tn[..., 1:2] * bitangent + tn[..., 2:3] * nrm
        )
        ns = xp.where(has_nm[..., None], mapped, nrm)
    elif scene["textures"].shape[0] > 0:
        textures = _stopgrad(scene["textures"], xp)
        tex_ids = scene["mat_tex_ids"][mat]
        bc = sample_bilinear(textures, scene["tex_hw"], tex_ids[..., 0], uv, xp)
        has_bc = (flags & MAT_HAS_BASECOLOR_TEX) != 0
        albedo = xp.where(has_bc[..., None], albedo * srgb_to_linear(bc[..., :3]), albedo)

        mr = sample_bilinear(textures, scene["tex_hw"], tex_ids[..., 1], uv, xp)
        has_mr = (flags & MAT_HAS_METALROUGH_TEX) != 0
        rough = xp.where(has_mr, rough * mr[..., 1], rough)  # G channel
        metal = xp.where(has_mr, metal * mr[..., 2], metal)  # B channel

        em = sample_bilinear(textures, scene["tex_hw"], tex_ids[..., 3], uv, xp)
        has_em = (flags & MAT_HAS_EMISSIVE_TEX) != 0
        emissive = xp.where(has_em[..., None], emissive * srgb_to_linear(em[..., :3]), emissive)

        nm = sample_bilinear(textures, scene["tex_hw"], tex_ids[..., 2], uv, xp)
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


def reconstruct_surface_fast(scene: dict, tri_id, u, v, ray_o, ray_d, t, xp=None):
    """Cheap surface reconstruction for secondary bounces
    (cfg.fast_bounce_shading): position from the ray equation (no gather),
    geometric normal from the precomputed per-face table, shading normal
    interpolated, and material values from the texture-averaged "1x1 mip"
    tables -- zero texture fetches, ~5x less gathered data per bounce.

    Returns the same keys as reconstruct_surface (uv omitted)."""
    xp = xp or _xp(u)
    tid = xp.clip(tri_id, 0, scene["tri_pos"].shape[0] - 1)
    tcl = xp.clip(xp.asarray(t, xp.float32), 0.0, 1e30)
    pos = ray_o + tcl[..., None] * ray_d
    if "tri_fast" in scene and scene["tri_fast"].shape[0] > 0:
        # One 13-channel row gather: normal corners + face normal + mat id.
        row = _take_rows(scene["tri_fast"], tid, xp)
        nrm = nmath.normalize(_bary_packed(row[..., 0:9], u, v, 3, xp))
        ng = row[..., 9:12]
        mat = _f32_int(row[..., 12], xp)
    else:
        nrm = nmath.normalize(interpolate(scene["tri_nrm"], tid, u, v, xp))
        ng = _stopgrad(scene["tri_face_nrm"], xp)[tid]
        mat = scene["tri_mat"][tid]
    albedo = fetch_rows(scene["mat_avg_albedo"], mat, xp)
    rough = fetch_rows(scene["mat_avg_rough"][:, None], mat, xp)[..., 0]
    metal = fetch_rows(scene["mat_avg_metal"][:, None], mat, xp)[..., 0]
    emissive = fetch_rows(scene["mat_avg_emissive"], mat, xp)

    view_dir = -ray_d
    flip = xp.where(nmath.dot(nrm, view_dir) < 0.0, -1.0, 1.0)
    ns = nrm * flip
    ng = ng * xp.where(nmath.dot(ng, ns) < 0.0, -1.0, 1.0)
    return {
        "position": pos,
        "normal_g": ng,
        "normal_s": ns,
        "albedo": albedo,
        "roughness": xp.clip(rough, 0.02, 1.0),
        "metalness": xp.clip(metal, 0.0, 1.0),
        "emissive": emissive,
    }
