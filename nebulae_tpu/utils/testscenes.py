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
    (instancing shares tables)."""
    base = parts[0]
    return FlatScene(
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
        aabb_min=np.min([p.aabb_min for p in parts], axis=0),
        aabb_max=np.max([p.aabb_max for p in parts], axis=0),
    )


def _translate(fs: FlatScene, offset: np.ndarray) -> FlatScene:
    out = FlatScene(**{k: v for k, v in fs.__dict__.items()})
    out.tri_pos = fs.tri_pos + np.asarray(offset, np.float32)
    out.aabb_min = fs.aabb_min + offset
    out.aabb_max = fs.aabb_max + offset
    return out


def _ground_plane(lo, hi, mat_id: int, y: float) -> np.ndarray:
    cx, cz = (lo[0] + hi[0]) / 2, (lo[2] + hi[2]) / 2
    ext = max(hi[0] - lo[0], hi[2] - lo[2]) * 1.5
    x0, x1 = cx - ext, cx + ext
    z0, z1 = cz - ext, cz + ext
    quad = np.array(
        [
            [[x0, y, z0], [x1, y, z0], [x1, y, z1]],
            [[x0, y, z0], [x1, y, z1], [x0, y, z1]],
        ],
        np.float32,
    )
    return quad


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
    n_up = np.tile(np.array([0, 1, 0], np.float32), (2, 3, 1))
    tan = np.tile(np.array([1, 0, 0, 1], np.float32), (2, 3, 1))
    uv = np.zeros((2, 3, 2), np.float32)
    fs.tri_pos = np.concatenate([fs.tri_pos, plane])
    fs.tri_nrm = np.concatenate([fs.tri_nrm, n_up])
    fs.tri_uv = np.concatenate([fs.tri_uv, uv])
    fs.tri_tan = np.concatenate([fs.tri_tan, tan])
    fs.tri_mat = np.concatenate([fs.tri_mat, np.full(2, fs.num_materials, np.int32)])
    fs.tri_face_nrm = np.concatenate(
        [fs.tri_face_nrm, np.tile(np.array([0, 1, 0], np.float32), (2, 1))]
    )
    fs.mat_base_color = np.concatenate([fs.mat_base_color, [[0.6, 0.6, 0.6, 1.0]]]).astype(np.float32)
    fs.mat_metallic = np.concatenate([fs.mat_metallic, [0.0]]).astype(np.float32)
    fs.mat_roughness = np.concatenate([fs.mat_roughness, [0.9]]).astype(np.float32)
    fs.mat_emissive = np.concatenate([fs.mat_emissive, [[0, 0, 0]]]).astype(np.float32)
    fs.mat_tex_ids = np.concatenate([fs.mat_tex_ids, [[-1, -1, -1, -1]]]).astype(np.int32)
    fs.mat_flags = np.concatenate([fs.mat_flags, [0]]).astype(np.int32)
    fs.mat_avg_albedo = np.concatenate([fs.mat_avg_albedo, [[0.6, 0.6, 0.6]]]).astype(np.float32)
    fs.mat_avg_rough = np.concatenate([fs.mat_avg_rough, [0.9]]).astype(np.float32)
    fs.mat_avg_metal = np.concatenate([fs.mat_avg_metal, [0.0]]).astype(np.float32)
    fs.mat_avg_emissive = np.concatenate([fs.mat_avg_emissive, [[0, 0, 0]]]).astype(np.float32)
    fs.aabb_min = np.minimum(fs.aabb_min, plane.reshape(-1, 3).min(0))
    fs.aabb_max = np.maximum(fs.aabb_max, plane.reshape(-1, 3).max(0))
    return fs


def bench_camera(fs: FlatScene, fov_y_deg: float = 60.0):
    """Camera overlooking the field (most rays hit geometry)."""
    from nebulae_tpu.core.camera import Camera

    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = float(np.max(hi - lo))
    eye = center + np.array([0.55 * ext, 0.45 * ext, 0.85 * ext], np.float32)
    return Camera(eye=eye, target=center, fov_y_deg=fov_y_deg)
