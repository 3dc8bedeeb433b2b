"""Scene representation: glTF instances flattened to device-ready SoA tables.

TPU-native equivalent of the reference's ``GIProcessedScene`` bindless scene
flattening (/root/reference/src/nri/GIProcessedScene.h:17-118): instead of
bindless descriptor tables pointing at per-submesh buffers, every triangle of
every instance is baked into one set of flat, static-shape arrays that live in
HBM and are gathered by index inside kernels.

Layout (T = total triangles, M = materials, K = textures):
  tri_pos      [T, 3, 3] f32   world-space vertex positions (v0, v1, v2)
  tri_nrm      [T, 3, 3] f32   world-space shading normals per corner
  tri_uv       [T, 3, 2] f32   texture coordinates per corner
  tri_tan      [T, 3, 4] f32   world-space tangents (xyz) + handedness (w)
  tri_mat      [T]       i32   material index
  mat_*        [M, ...]        material factor tables
  textures     [K, TH, TW, 4] u8  padded texture stack + per-texture (h, w)

Triangles are pre-transformed to world space (static scene; the reference
likewise builds one static BLAS from all submeshes,
DeferredRenderer.cpp:978-1030).  Dynamic transforms are handled by the BVH
refit path on top of these arrays.
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np

from nebulae_tpu.core import math as nmath
from nebulae_tpu.core.gltf import GLTFAsset, MaterialDesc, load_gltf

# Material flag bits (mirrors the role of the reference's material flags,
# /root/reference/src/nri/Material.h:10-49)
MAT_HAS_BASECOLOR_TEX = 1 << 0
MAT_HAS_METALROUGH_TEX = 1 << 1
MAT_HAS_NORMAL_TEX = 1 << 2
MAT_HAS_EMISSIVE_TEX = 1 << 3
MAT_DOUBLE_SIDED = 1 << 4


@dataclass
class FlatScene:
    """Static-shape SoA scene tables (host numpy; move with jax.device_put)."""

    tri_pos: np.ndarray
    tri_nrm: np.ndarray
    tri_uv: np.ndarray
    tri_tan: np.ndarray
    tri_mat: np.ndarray
    tri_face_nrm: np.ndarray  # [T, 3] geometric (face) normals
    # material tables
    mat_base_color: np.ndarray  # [M, 4]
    mat_metallic: np.ndarray  # [M]
    mat_roughness: np.ndarray  # [M]
    mat_emissive: np.ndarray  # [M, 3]
    mat_tex_ids: np.ndarray  # [M, 4] i32: base/mr/normal/emissive (-1 = none)
    mat_flags: np.ndarray  # [M] i32
    # Texture-averaged material values ("1x1 mip"): bounce shading uses these
    # instead of per-hit texture fetches (cfg.fast_bounce_shading)
    mat_avg_albedo: np.ndarray  # [M, 3] linear
    mat_avg_rough: np.ndarray  # [M]
    mat_avg_metal: np.ndarray  # [M]
    mat_avg_emissive: np.ndarray  # [M, 3]
    # texture stack
    textures: np.ndarray  # [K, TH, TW, 4] u8 (K may be 0)
    tex_hw: np.ndarray  # [K, 2] i32 actual (h, w)
    # packed per-material atlas (albedo | rough | metal | normal | emissive):
    # one 12-byte row per texel so the material fetch is 4 gathers, not 16
    mat_tex: np.ndarray  # [A, AH, AW, 12] u8
    mat_tex_hw: np.ndarray  # [A, 2] i32
    mat_atlas_id: np.ndarray  # [M] i32
    # bounds
    aabb_min: np.ndarray  # [3]
    aabb_max: np.ndarray  # [3]
    # Optional instance table (RTScene analogue): instance id per triangle,
    # set by instanced assemblers (utils.testscenes._concat_scene) so
    # runtime per-instance transforms can drive Renderer.update_instances.
    instance_of_tri: np.ndarray | None = None  # [T] i32

    @property
    def num_triangles(self) -> int:
        return int(self.tri_pos.shape[0])

    @property
    def num_materials(self) -> int:
        return int(self.mat_base_color.shape[0])

    def device_arrays(self) -> dict:
        """The pytree of arrays kernels consume (excludes host-only metadata).

        Packed per-triangle shading rows (tri_geom/tri_fast) are derived here
        so scenes assembled or mutated by hand (utils.testscenes) stay
        consistent with the attribute tables."""
        tri_geom, tri_fast = pack_geometry_rows(
            self.tri_pos, self.tri_nrm, self.tri_uv, self.tri_tan, self.tri_mat,
            self.tri_face_nrm, self.mat_flags, self.mat_atlas_id,
        )
        # Mip-extended + quad-packed atlas, memoized: the atlas never mutates
        # after flatten (unlike the triangle tables, which utils.testscenes
        # edits in place; appending slots there invalidates the memo).
        # Mip slots store only their VALID texel rows (flat row-offset
        # addressing) so the mip chain costs +33% atlas bytes, not the +300%
        # of padded slots -- keeping the table small enough for XLA's VMEM
        # pin on the primary material fetch (a padded-slot chain measured a
        # 70 ms/frame regression on v5e when the pin was lost).
        cache = getattr(self, "_quad_cache", None)
        if cache is None or cache[0] is not self.mat_tex:
            mtex, mhw, mip_ids = extend_atlas_mips(self.mat_tex, self.mat_tex_hw)
            quad = quad_pack_atlas(mtex, mhw)
            flat_rows = []
            off = np.zeros(mtex.shape[0] + 1, np.int64)
            for i in range(mtex.shape[0]):
                h, w = int(mhw[i, 0]), int(mhw[i, 1])
                flat_rows.append(quad[i, :h, :w].reshape(h * w, quad.shape[-1]))
                off[i + 1] = off[i] + h * w
            assert off[-1] < (1 << 31), "atlas rows exceed int32 indexing"
            cache = (
                self.mat_tex,
                np.concatenate(flat_rows, axis=0),
                mhw,
                mip_ids,
                off[:-1].astype(np.int32),
            )
            self._quad_cache = cache
        return {
            "tri_geom": tri_geom,
            "tri_fast": tri_fast,
            "mat_tex_quad": cache[1],
            "mat_tex_mip_hw": cache[2],
            "mat_tex_mip_ids": cache[3],
            "mat_tex_row_off": cache[4],
            "tri_pos": self.tri_pos,
            "tri_nrm": self.tri_nrm,
            "tri_uv": self.tri_uv,
            "tri_tan": self.tri_tan,
            "tri_mat": self.tri_mat,
            "tri_face_nrm": self.tri_face_nrm,
            "mat_base_color": self.mat_base_color,
            "mat_metallic": self.mat_metallic,
            "mat_roughness": self.mat_roughness,
            "mat_emissive": self.mat_emissive,
            "mat_tex_ids": self.mat_tex_ids,
            "mat_flags": self.mat_flags,
            "mat_avg_albedo": self.mat_avg_albedo,
            "mat_avg_rough": self.mat_avg_rough,
            "mat_avg_metal": self.mat_avg_metal,
            "mat_avg_emissive": self.mat_avg_emissive,
            "textures": self.textures,
            "tex_hw": self.tex_hw,
            "mat_tex": self.mat_tex,
            "mat_tex_hw": self.mat_tex_hw,
            "mat_atlas_id": self.mat_atlas_id,
            "aabb_min": self.aabb_min,
            "aabb_max": self.aabb_max,
        }


@dataclass
class Scene:
    """High-level scene: asset + flattened tables (the `core::Scene` analogue,
    /root/reference/src/core/Scene.h:13-32)."""

    asset: GLTFAsset
    flat: FlatScene


def _pack_materials(mats: list[MaterialDesc]):
    m = len(mats)
    base = np.zeros((m, 4), np.float32)
    metal = np.zeros(m, np.float32)
    rough = np.zeros(m, np.float32)
    emis = np.zeros((m, 3), np.float32)
    tex = np.full((m, 4), -1, np.int32)
    flags = np.zeros(m, np.int32)
    for i, md in enumerate(mats):
        base[i] = md.base_color_factor
        metal[i] = md.metallic_factor
        rough[i] = md.roughness_factor
        emis[i] = md.emissive_factor
        tex[i] = [md.base_color_tex, md.metallic_roughness_tex, md.normal_tex, md.emissive_tex]
        f = 0
        f |= MAT_HAS_BASECOLOR_TEX if md.base_color_tex >= 0 else 0
        f |= MAT_HAS_METALROUGH_TEX if md.metallic_roughness_tex >= 0 else 0
        f |= MAT_HAS_NORMAL_TEX if md.normal_tex >= 0 else 0
        f |= MAT_HAS_EMISSIVE_TEX if md.emissive_tex >= 0 else 0
        f |= MAT_DOUBLE_SIDED if md.double_sided else 0
        flags[i] = f
    return base, metal, rough, emis, tex, flags


def _pack_textures(images: list[np.ndarray], max_dim: int | None = None):
    """Stack variable-size images into one padded [K, TH, TW, 4] u8 array.

    Static shapes are mandatory under jit; padding wastes some HBM but keeps
    texture sampling a single gather. ``max_dim`` optionally downsamples large
    textures (area mean) to bound memory.
    """
    if not images:
        return np.zeros((0, 1, 1, 4), np.uint8), np.zeros((0, 2), np.int32)
    proc = []
    for img in images:
        if max_dim is not None and max(img.shape[:2]) > max_dim:
            import cv2

            h, w = img.shape[:2]
            s = max_dim / max(h, w)
            img = cv2.resize(img, (max(1, int(w * s)), max(1, int(h * s))), interpolation=cv2.INTER_AREA)
        proc.append(img)
    th = max(i.shape[0] for i in proc)
    tw = max(i.shape[1] for i in proc)
    stack = np.zeros((len(proc), th, tw, 4), np.uint8)
    hw = np.zeros((len(proc), 2), np.int32)
    for k, img in enumerate(proc):
        stack[k, : img.shape[0], : img.shape[1]] = img
        hw[k] = img.shape[:2]
    return stack, hw


def _resize_map(img: np.ndarray, h: int, w: int) -> np.ndarray:
    if img.shape[0] == h and img.shape[1] == w:
        return img
    import cv2

    interp = cv2.INTER_AREA if (img.shape[0] > h or img.shape[1] > w) else cv2.INTER_LINEAR
    out = cv2.resize(img, (w, h), interpolation=interp)
    if out.ndim == 2:
        out = out[..., None]
    return out


def _pack_material_atlas(mats, images, max_dim: int | None):
    """Combine each material's maps into ONE 12-channel texel array.

    All of a material's maps are sampled at the same UV, so pre-packing them
    (albedo.rgb | roughness | metallic | normal.xyz | emissive.rgb | pad)
    turns the 16-gather bilinear material fetch (4 maps x 4 taps) into 4
    gathers of 12-byte rows: TPU gather cost is per-row, not per-byte
    (measured 252 ms for the 16-gather form vs ~75 ms packed at 1080p).
    Maps smaller than the material's atlas resolution are upsampled once at
    load; absent maps fill with neutral values so the material factors pass
    through unchanged (white albedo/roughness/metallic/emissive, flat
    normal).  Materials sharing the same map set share one atlas slot.

    Returns (atlas [A, AH, AW, 12] u8, atlas_hw [A, 2] i32,
    mat_atlas_id [M] i32)."""
    m = len(mats)
    if m == 0:
        return (
            np.zeros((1, 1, 1, 12), np.uint8),
            np.ones((1, 2), np.int32),
            np.zeros((0,), np.int32),
        )

    def capped(shape):
        h, w = int(shape[0]), int(shape[1])
        if max_dim is not None and max(h, w) > max_dim:
            s = max_dim / max(h, w)
            h, w = max(1, int(h * s)), max(1, int(w * s))
        return h, w

    slot_of: dict[tuple, int] = {}
    slots = []
    mat_aid = np.zeros(m, np.int32)
    for i, md in enumerate(mats):
        ids = (md.base_color_tex, md.metallic_roughness_tex, md.normal_tex, md.emissive_tex)
        key = tuple(t if 0 <= t < len(images) else -1 for t in ids)
        if key not in slot_of:
            slot_of[key] = len(slots)
            slots.append(key)
        mat_aid[i] = slot_of[key]

    packed = []
    for key in slots:
        bc, mr, nm, em = key
        h = w = 1
        for t in key:
            if t >= 0:
                th, tw = capped(images[t].shape[:2])
                h, w = max(h, th), max(w, tw)
        px = np.empty((h, w, 12), np.uint8)
        px[..., 0:3] = _resize_map(images[bc], h, w)[..., :3] if bc >= 0 else 255
        if mr >= 0:
            mrm = _resize_map(images[mr], h, w)
            px[..., 3] = mrm[..., 1]  # roughness = G
            px[..., 4] = mrm[..., 2]  # metallic = B
        else:
            px[..., 3:5] = 255
        px[..., 5:8] = _resize_map(images[nm], h, w)[..., :3] if nm >= 0 else (128, 128, 255)
        px[..., 8:11] = _resize_map(images[em], h, w)[..., :3] if em >= 0 else 255
        px[..., 11] = 0
        packed.append(px)

    ah = max(p.shape[0] for p in packed)
    aw = max(p.shape[1] for p in packed)
    atlas = np.zeros((len(packed), ah, aw, 12), np.uint8)
    hw = np.zeros((len(packed), 2), np.int32)
    for a, p in enumerate(packed):
        atlas[a, : p.shape[0], : p.shape[1]] = p
        hw[a] = p.shape[:2]
    return atlas, hw, mat_aid


def _average_material_tables(mats, images, base, metal, rough, emis):
    """Texture-averaged ("1x1 mip") material values for fast bounce shading."""
    from nebulae_tpu.core.texture import srgb_to_linear

    m = len(mats)
    avg_albedo = base[:, :3].copy()
    avg_rough = rough.copy()
    avg_metal = metal.copy()
    avg_emissive = emis.copy()

    def tex_mean(idx, stride=4):
        img = images[idx][::stride, ::stride, :3].astype(np.float32) / 255.0
        return img

    for i, md in enumerate(mats):
        if 0 <= md.base_color_tex < len(images):
            avg_albedo[i] *= srgb_to_linear(tex_mean(md.base_color_tex)).mean(axis=(0, 1))
        if 0 <= md.metallic_roughness_tex < len(images):
            mr = tex_mean(md.metallic_roughness_tex).mean(axis=(0, 1))
            avg_rough[i] *= mr[1]
            avg_metal[i] *= mr[2]
        if 0 <= md.emissive_tex < len(images):
            avg_emissive[i] *= srgb_to_linear(tex_mean(md.emissive_tex)).mean(axis=(0, 1))
    return (
        avg_albedo.astype(np.float32),
        np.clip(avg_rough, 0.02, 1.0).astype(np.float32),
        np.clip(avg_metal, 0.0, 1.0).astype(np.float32),
        avg_emissive.astype(np.float32),
    )


MIP_LEVELS = 4  # level 0 + 3 downsampled (512 -> 64 at the bench's atlas cap)


def extend_atlas_mips(atlas: np.ndarray, hw: np.ndarray, levels: int = MIP_LEVELS):
    """Append area-averaged mip slots to the material atlas.

    The reference's raster G-buffer samples hardware mip chains
    (deferred_gbuffers.hlsl:72-90, D3D12 GenerateMips-style storage-space
    averaging); here each mip level is an extra atlas slot (same padded
    extent, its own actual (h, w)) so per-pixel level selection is one small
    id indirection before the usual quad-row gather.  Returns
    (atlas' [A', AH, AW, C], hw' [A', 2], mip_ids [A, levels] i32); levels
    past a slot's smallest representable size repeat the last one."""
    a = atlas.shape[0]
    mip_ids = np.zeros((a, levels), np.int32)
    mip_ids[:, 0] = np.arange(a)
    extra, extra_hw = [], []
    for i in range(a):
        h, w = int(hw[i, 0]), int(hw[i, 1])
        img = atlas[i, :h, :w]
        prev = i
        for level in range(1, levels):
            if min(h, w) >= 2:
                h, w = max(h // 2, 1), max(w // 2, 1)
                img = _resize_map(img, h, w)
                slot = np.zeros(atlas.shape[1:], atlas.dtype)
                slot[:h, :w] = img
                extra.append(slot)
                extra_hw.append((h, w))
                prev = a + len(extra) - 1
            mip_ids[i, level] = prev
    if not extra:
        return atlas, hw, mip_ids
    atlas2 = np.concatenate([atlas, np.stack(extra)], axis=0)
    hw2 = np.concatenate([hw, np.asarray(extra_hw, np.int32)], axis=0)
    return atlas2, hw2, mip_ids


def quad_pack_atlas(mat_tex: np.ndarray, mat_tex_hw: np.ndarray) -> np.ndarray:
    """Pre-pack each atlas texel's 2x2 REPEAT-wrap neighborhood into one row:
    [A, AH, AW, 48] u8 with channels (p | p->right | p->down | p->diag).

    The bilinear material fetch becomes ONE row gather (gather cost is per
    row, nearly width-independent) instead of 4.  Wrap happens at each
    material's *actual* (h, w), not the padded atlas extent."""
    a, ah, aw, c = mat_tex.shape
    quad = np.zeros((a, ah, aw, 4 * c), mat_tex.dtype)
    for i in range(a):
        h, w = int(mat_tex_hw[i, 0]), int(mat_tex_hw[i, 1])
        sub = mat_tex[i, :h, :w]
        right = np.roll(sub, -1, axis=1)
        down = np.roll(sub, -1, axis=0)
        diag = np.roll(right, -1, axis=0)
        quad[i, :h, :w] = np.concatenate([sub, right, down, diag], axis=-1)
    return quad


def pack_geometry_rows(
    tri_pos, tri_nrm, tri_uv, tri_tan, tri_mat, tri_face_nrm, mat_flags, mat_atlas_id
):
    """Per-triangle packed shading rows: ONE wide-row gather per ray replaces
    the ~6 separate per-ray gathers of surface reconstruction (gather cost on
    TPU is per fetched row, nearly independent of row width up to ~40 f32 --
    measured 179 ms -> 85 ms per 2M-ray full reconstruct, 86 -> 61 ms fast).

    tri_geom [T, 39] f32: v0(0:3) e1(3:6) e2(6:9) nrm corners(9:18)
        uv corners(18:24) tan corners(24:36) mat(36) flags(37) atlas_id(38).
        Small ints ride exactly in f32 (< 2^24).
    tri_fast [T, 13] f32: nrm corners(0:9) face normal(9:12) mat(12).
    """
    t = tri_pos.shape[0]
    if t == 0:
        return np.zeros((0, 39), np.float32), np.zeros((0, 13), np.float32)
    v0 = tri_pos[:, 0]
    matf = tri_mat.astype(np.float32)
    flagsf = mat_flags[tri_mat].astype(np.float32) if mat_flags.shape[0] else np.zeros(t, np.float32)
    aidf = (
        mat_atlas_id[tri_mat].astype(np.float32) if mat_atlas_id.shape[0] else np.zeros(t, np.float32)
    )
    tri_geom = np.concatenate(
        [
            v0,
            tri_pos[:, 1] - v0,
            tri_pos[:, 2] - v0,
            tri_nrm.reshape(t, 9),
            tri_uv.reshape(t, 6),
            tri_tan.reshape(t, 12),
            matf[:, None],
            flagsf[:, None],
            aidf[:, None],
        ],
        axis=1,
    ).astype(np.float32)
    tri_fast = np.concatenate(
        [tri_nrm.reshape(t, 9), tri_face_nrm, matf[:, None]], axis=1
    ).astype(np.float32)
    return tri_geom, tri_fast


def transform_instances(base_tri_pos, base_tri_nrm, instance_of_tri, transforms):
    """Apply per-instance rigid 3x4 transforms to instanced triangles.

    The runtime analogue of the reference's TLAS instance transforms
    (RTTopLevelInstance::GetD3D12InstanceDesc 3x4 matrix,
    /root/reference/src/nri/raytracing/RTCommon.h:85-107): the flattened
    scene keeps one world-space triangle table, so moving an instance maps
    its triangles through its matrix (rotation part also rotates vertex
    normals -- rigid/uniform-scale transforms only; use a full rebuild for
    shear).  Pair with Renderer.update_geometry for the BVH refit.

    base_tri_pos/base_tri_nrm [T, 3, 3]; instance_of_tri [T] int;
    transforms [I, 3, 4] (rows = world rows, last column = translation).
    Returns (tri_pos, tri_nrm) as jnp arrays."""
    import jax.numpy as jnp

    m = jnp.asarray(transforms, jnp.float32)[jnp.asarray(instance_of_tri)]  # [T, 3, 4]
    r, t = m[..., :3], m[..., 3]
    pos = jnp.einsum("tij,tvj->tvi", r, jnp.asarray(base_tri_pos)) + t[:, None, :]
    nrm = jnp.einsum("tij,tvj->tvi", r, jnp.asarray(base_tri_nrm))
    nrm = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12)
    return pos, nrm


def face_normals(tri_pos: np.ndarray, tri_nrm: np.ndarray) -> np.ndarray:
    """Geometric normals oriented along the average shading normal."""
    if tri_pos.shape[0] == 0:
        return np.zeros((0, 3), np.float32)
    e1 = tri_pos[:, 1] - tri_pos[:, 0]
    e2 = tri_pos[:, 2] - tri_pos[:, 0]
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-12)
    flip = (fn * tri_nrm.mean(axis=1)).sum(-1) < 0.0
    return np.where(flip[:, None], -fn, fn).astype(np.float32)


def flatten_asset(asset: GLTFAsset, max_texture_dim: int | None = None) -> FlatScene:
    """Bake all instances into world-space triangle SoA tables."""
    pos_l, nrm_l, uv_l, tan_l, mat_l = [], [], [], [], []
    for inst in asset.instances:
        p = inst.primitive
        world = inst.world.astype(np.float64)
        nmat = nmath.normal_matrix(world)
        wpos = (p.positions @ world[:3, :3].T + world[:3, 3]).astype(np.float32)
        wnrm = p.normals @ nmat.T
        wnrm = (wnrm / np.maximum(np.linalg.norm(wnrm, axis=-1, keepdims=True), 1e-12)).astype(
            np.float32
        )
        wtan_xyz = p.tangents[:, :3] @ world[:3, :3].T
        wtan_xyz = wtan_xyz / np.maximum(np.linalg.norm(wtan_xyz, axis=-1, keepdims=True), 1e-12)
        wtan = np.concatenate([wtan_xyz, p.tangents[:, 3:4]], axis=-1).astype(np.float32)
        f = p.indices.reshape(-1, 3).astype(np.int64)
        pos_l.append(wpos[f])  # [t, 3, 3]
        nrm_l.append(wnrm[f])
        uv_l.append(p.uvs[f])
        tan_l.append(wtan[f])
        mat_l.append(np.full(f.shape[0], p.material, np.int32))

    tri_pos = np.concatenate(pos_l) if pos_l else np.zeros((0, 3, 3), np.float32)
    tri_nrm = np.concatenate(nrm_l) if nrm_l else np.zeros((0, 3, 3), np.float32)
    tri_uv = np.concatenate(uv_l) if uv_l else np.zeros((0, 3, 2), np.float32)
    tri_tan = np.concatenate(tan_l) if tan_l else np.zeros((0, 3, 4), np.float32)
    tri_mat = np.concatenate(mat_l) if mat_l else np.zeros(0, np.int32)

    base, metal, rough, emis, tex, flags = _pack_materials(asset.materials)
    textures, tex_hw = _pack_textures(asset.images, max_texture_dim)
    mat_tex, mat_tex_hw, mat_atlas_id = _pack_material_atlas(
        asset.materials, asset.images, max_texture_dim
    )
    avg_albedo, avg_rough, avg_metal, avg_emissive = _average_material_tables(
        asset.materials, asset.images, base, metal, rough, emis
    )

    return FlatScene(
        tri_pos=tri_pos,
        tri_nrm=tri_nrm,
        tri_uv=tri_uv,
        tri_tan=tri_tan,
        tri_mat=tri_mat,
        tri_face_nrm=face_normals(tri_pos, tri_nrm),
        mat_base_color=base,
        mat_metallic=metal,
        mat_roughness=rough,
        mat_emissive=emis,
        mat_tex_ids=tex,
        mat_flags=flags,
        mat_avg_albedo=avg_albedo,
        mat_avg_rough=avg_rough,
        mat_avg_metal=avg_metal,
        mat_avg_emissive=avg_emissive,
        textures=textures,
        tex_hw=tex_hw,
        mat_tex=mat_tex,
        mat_tex_hw=mat_tex_hw,
        mat_atlas_id=mat_atlas_id,
        aabb_min=asset.aabb_min.astype(np.float32),
        aabb_max=asset.aabb_max.astype(np.float32),
    )


def load_scene(
    path: str | Path, load_images: bool = True, max_texture_dim: int | None = None
) -> Scene:
    asset = load_gltf(path, load_images=load_images)
    return Scene(asset=asset, flat=flatten_asset(asset, max_texture_dim))
