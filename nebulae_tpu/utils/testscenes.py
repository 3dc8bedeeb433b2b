"""Benchmark / test scene construction.

The reference's canonical workload is Sponza.glb at 1080p (Nebulae.cpp:36),
but the asset snapshot mounted at /root/reference ships only Sponza's
*textures* -- the geometry binary (Sponza.bin / Sponza.glb) is absent.  The
Sponza-class benchmark scene here therefore instances the DamagedHelmet mesh
(15.4k textured PBR triangles) into a grid over a ground plane to reach the
same geometric complexity (~260k triangles) and shading cost (full texture
set, normal maps) as Sponza.  If real Sponza geometry is provided, pass its
path to `load_scene` instead -- the pipeline is scene-agnostic.
"""

from __future__ import annotations

import numpy as np

from nebulae_tpu.core.gltf import load_gltf
from nebulae_tpu.core.scene import FlatScene, flatten_asset

HELMET_PATH = "/root/reference/assets/DamagedHelmet/DamagedHelmet.gltf"


def _concat_scene(parts: list[FlatScene]) -> FlatScene:
    """Concatenate triangle tables; materials/textures come from parts[0]
    (instancing shares tables).  Records instance_of_tri so runtime
    per-instance transforms work (Renderer.update_instances)."""
    base = parts[0]
    instance_of_tri = np.repeat(
        np.arange(len(parts), dtype=np.int32),
        [p.num_triangles for p in parts],
    )
    return FlatScene(
        instance_of_tri=instance_of_tri,
        tri_pos=np.concatenate([p.tri_pos for p in parts]),
        tri_nrm=np.concatenate([p.tri_nrm for p in parts]),
        tri_uv=np.concatenate([p.tri_uv for p in parts]),
        tri_tan=np.concatenate([p.tri_tan for p in parts]),
        tri_mat=np.concatenate([p.tri_mat for p in parts]),
        tri_face_nrm=np.concatenate([p.tri_face_nrm for p in parts]),
        mat_avg_albedo=base.mat_avg_albedo,
        mat_avg_rough=base.mat_avg_rough,
        mat_avg_metal=base.mat_avg_metal,
        mat_avg_emissive=base.mat_avg_emissive,
        mat_base_color=base.mat_base_color,
        mat_metallic=base.mat_metallic,
        mat_roughness=base.mat_roughness,
        mat_emissive=base.mat_emissive,
        mat_tex_ids=base.mat_tex_ids,
        mat_flags=base.mat_flags,
        textures=base.textures,
        tex_hw=base.tex_hw,
        mat_tex=base.mat_tex,
        mat_tex_hw=base.mat_tex_hw,
        mat_atlas_id=base.mat_atlas_id,
        aabb_min=np.min([p.aabb_min for p in parts], axis=0),
        aabb_max=np.max([p.aabb_max for p in parts], axis=0),
    )


def _translate(fs: FlatScene, offset: np.ndarray) -> FlatScene:
    # dataclass fields only -- __dict__ may also hold memoized caches
    # (e.g. _quad_cache from device_arrays()).
    out = FlatScene(**{k: v for k, v in fs.__dict__.items() if not k.startswith("_")})
    out.tri_pos = fs.tri_pos + np.asarray(offset, np.float32)
    out.aabb_min = fs.aabb_min + offset
    out.aabb_max = fs.aabb_max + offset
    return out


def _ground_plane(lo, hi, mat_id: int, y: float, cells: int = 8) -> np.ndarray:
    """Ground quad subdivided into cells x cells tiles.

    Two scene-spanning triangles would have near-scene-sized AABBs: every
    ray overlaps them, so every traversal descends into their subtree (and
    under chunked tables, into their whole chunk) -- measured as most of the
    chunked frame's overhead.  Subdivision keeps leaf AABBs local."""
    cx, cz = (lo[0] + hi[0]) / 2, (lo[2] + hi[2]) / 2
    ext = max(hi[0] - lo[0], hi[2] - lo[2]) * 1.5
    xs = np.linspace(cx - ext, cx + ext, cells + 1, dtype=np.float32)
    zs = np.linspace(cz - ext, cz + ext, cells + 1, dtype=np.float32)
    tris = []
    for i in range(cells):
        for j in range(cells):
            x0, x1, z0, z1 = xs[i], xs[i + 1], zs[j], zs[j + 1]
            tris.append([[x0, y, z0], [x1, y, z0], [x1, y, z1]])
            tris.append([[x0, y, z0], [x1, y, z1], [x0, y, z1]])
    return np.asarray(tris, np.float32)


def _append_flat_tris(
    fs: FlatScene, tris: np.ndarray, normal, albedo, rough: float = 0.9,
    metal: float = 0.0, emissive=(0.0, 0.0, 0.0)
) -> None:
    """Append untextured triangles [T, 3, 3] with one new lambertian-ish
    material (normal may be [3] shared or [T, 3] per-face)."""
    t = tris.shape[0]
    nrm = np.asarray(normal, np.float32)
    if nrm.ndim == 1:
        nrm = np.tile(nrm, (t, 1))
    mat_id = fs.num_materials
    a = np.asarray(albedo, np.float32)
    fs.tri_pos = np.concatenate([fs.tri_pos, tris.astype(np.float32)])
    fs.tri_nrm = np.concatenate([fs.tri_nrm, np.repeat(nrm[:, None, :], 3, axis=1)])
    fs.tri_uv = np.concatenate([fs.tri_uv, np.zeros((t, 3, 2), np.float32)])
    fs.tri_tan = np.concatenate(
        [fs.tri_tan, np.tile(np.array([1, 0, 0, 1], np.float32), (t, 3, 1))]
    )
    fs.tri_mat = np.concatenate([fs.tri_mat, np.full(t, mat_id, np.int32)])
    fs.tri_face_nrm = np.concatenate([fs.tri_face_nrm, nrm])
    fs.mat_base_color = np.concatenate([fs.mat_base_color, [[*a, 1.0]]]).astype(np.float32)
    fs.mat_metallic = np.concatenate([fs.mat_metallic, [metal]]).astype(np.float32)
    fs.mat_roughness = np.concatenate([fs.mat_roughness, [rough]]).astype(np.float32)
    fs.mat_emissive = np.concatenate([fs.mat_emissive, [list(emissive)]]).astype(np.float32)
    fs.mat_tex_ids = np.concatenate([fs.mat_tex_ids, [[-1, -1, -1, -1]]]).astype(np.int32)
    fs.mat_flags = np.concatenate([fs.mat_flags, [0]]).astype(np.int32)
    # Untextured material -> a neutral atlas slot (factors pass through).
    a_idx = fs.mat_tex.shape[0]
    neutral = np.zeros((1,) + fs.mat_tex.shape[1:], np.uint8)
    neutral[0, 0, 0] = [255, 255, 255, 255, 255, 128, 128, 255, 255, 255, 255, 0]
    fs.mat_tex = np.concatenate([fs.mat_tex, neutral])
    fs.mat_tex_hw = np.concatenate([fs.mat_tex_hw, [[1, 1]]]).astype(np.int32)
    fs.mat_atlas_id = np.concatenate([fs.mat_atlas_id, [a_idx]]).astype(np.int32)
    fs.mat_avg_albedo = np.concatenate([fs.mat_avg_albedo, [a]]).astype(np.float32)
    fs.mat_avg_rough = np.concatenate([fs.mat_avg_rough, [rough]]).astype(np.float32)
    fs.mat_avg_metal = np.concatenate([fs.mat_avg_metal, [metal]]).astype(np.float32)
    fs.mat_avg_emissive = np.concatenate([fs.mat_avg_emissive, [list(emissive)]]).astype(np.float32)
    fs.aabb_min = np.minimum(fs.aabb_min, tris.reshape(-1, 3).min(0).astype(np.float32))
    fs.aabb_max = np.maximum(fs.aabb_max, tris.reshape(-1, 3).max(0).astype(np.float32))
    if fs.instance_of_tri is not None:
        # Appended static geometry becomes its own instance.
        fs.instance_of_tri = np.concatenate(
            [fs.instance_of_tri, np.full(t, fs.instance_of_tri.max() + 1, np.int32)]
        )


def helmet_field(nx: int = 4, nz: int = 4, spacing: float = 3.0, max_texture_dim: int | None = 1024) -> FlatScene:
    """Sponza-class benchmark scene: nx*nz DamagedHelmet instances + ground.

    4x4 + ground -> ~247k textured triangles (Sponza: ~262k).
    """
    asset = load_gltf(HELMET_PATH)
    base = flatten_asset(asset, max_texture_dim)
    parts = []
    for ix in range(nx):
        for iz in range(nz):
            off = np.array(
                [(ix - (nx - 1) / 2) * spacing, 0.0, (iz - (nz - 1) / 2) * spacing], np.float32
            )
            parts.append(_translate(base, off))
    fs = _concat_scene(parts)

    # Ground plane with an extra lambertian material.
    plane = _ground_plane(fs.aabb_min, fs.aabb_max, fs.num_materials, float(fs.aabb_min[1]) - 0.2)
    _append_flat_tris(fs, plane, [0, 1, 0], [0.6, 0.6, 0.6])
    return fs


def helmet_atrium(nx: int = 3, nz: int = 3, spacing: float = 3.0, max_texture_dim: int | None = 1024) -> FlatScene:
    """Interior (Sponza-atrium-like) variant: the helmet field enclosed by
    four walls, open to the sky above.  Bounce rays mostly hit geometry, so
    this is the workload where NRC cache termination pays off (qfrac high)
    and multi-bounce GI is visible (colored wall bleed)."""
    fs = helmet_field(nx, nz, spacing, max_texture_dim)
    lo, hi = fs.aabb_min.copy(), fs.aabb_max.copy()
    y0, y1 = float(lo[1]), float(hi[1]) + 0.6 * float(hi[1] - lo[1])
    m = 0.04 * float(max(hi[0] - lo[0], hi[2] - lo[2]))
    x0, x1, z0, z1 = float(lo[0]) - m, float(hi[0]) + m, float(lo[2]) - m, float(hi[2]) + m

    def wall(a, b, c, d):
        return np.array([[a, b, c], [a, c, d]], np.float32)

    walls = [
        (wall([x0, y0, z0], [x1, y0, z0], [x1, y1, z0], [x0, y1, z0]), [0, 0, 1], [0.7, 0.7, 0.65]),
        (wall([x1, y0, z1], [x0, y0, z1], [x0, y1, z1], [x1, y1, z1]), [0, 0, -1], [0.7, 0.7, 0.65]),
        (wall([x0, y0, z1], [x0, y0, z0], [x0, y1, z0], [x0, y1, z1]), [1, 0, 0], [0.65, 0.2, 0.15]),
        (wall([x1, y0, z0], [x1, y0, z1], [x1, y1, z1], [x1, y1, z0]), [-1, 0, 0], [0.15, 0.55, 0.2]),
    ]
    for tris, n, albedo in walls:
        _append_flat_tris(fs, tris, n, albedo)
    return fs


def atrium_camera(fs: FlatScene, fov_y_deg: float = 60.0):
    """Camera INSIDE the atrium walls, near a top corner looking across."""
    from nebulae_tpu.core.camera import Camera

    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = hi - lo
    eye = np.array(
        [center[0] + 0.38 * ext[0], lo[1] + 0.82 * ext[1], center[2] + 0.40 * ext[2]],
        np.float32,
    )
    target = np.array([center[0] - 0.2 * ext[0], lo[1] + 0.25 * ext[1], center[2] - 0.25 * ext[2]], np.float32)
    return Camera(eye=eye, target=target, fov_y_deg=fov_y_deg)


def bench_camera(fs: FlatScene, fov_y_deg: float = 60.0):
    """Camera overlooking the field (most rays hit geometry)."""
    from nebulae_tpu.core.camera import Camera

    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    eye = center + np.array([0.55 * ext, 0.45 * ext, 0.85 * ext], np.float32)
    return Camera(eye=eye, target=center, fov_y_deg=fov_y_deg)
