"""Texture mip pyramid: atlas chain construction + primary-pass level
selection + minification anti-aliasing (the raster G-buffer's hardware mips,
deferred_gbuffers.hlsl:72-90)."""

import numpy as np
import pytest

from nebulae_tpu.config import RenderConfig


def test_extend_atlas_mips_chain():
    from nebulae_tpu.core.scene import extend_atlas_mips

    rng = np.random.default_rng(0)
    atlas = (rng.uniform(0, 255, (2, 16, 16, 12))).astype(np.uint8)
    hw = np.asarray([[16, 16], [4, 8]], np.int32)
    atlas2, hw2, mip_ids = extend_atlas_mips(atlas, hw, levels=4)
    assert mip_ids.shape == (2, 4)
    assert (mip_ids[:, 0] == [0, 1]).all()
    # slot 0: 16 -> 8 -> 4 -> 2
    for lvl in range(1, 4):
        s = mip_ids[0, lvl]
        assert tuple(hw2[s]) == (16 >> lvl, 16 >> lvl)
    # slot 1: (4,8) -> (2,4) -> (1,2) -> repeats (min dim hits 1)
    assert tuple(hw2[mip_ids[1, 1]]) == (2, 4)
    assert tuple(hw2[mip_ids[1, 2]]) == (1, 2)
    assert mip_ids[1, 3] == mip_ids[1, 2]
    # level-1 content is the area average of the base
    s = mip_ids[0, 1]
    got = atlas2[s, :8, :8].astype(np.float32)
    want = atlas[0].astype(np.float32).reshape(8, 2, 8, 2, 12).mean((1, 3))
    np.testing.assert_allclose(got, want, atol=1.0)


def test_mip_level_selection_scales_with_distance(helmet_scene):
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.core.surface import mip_level_from_uv
    from nebulae_tpu.ref.tracer import camera_rays, intersect_closest_np

    fs = helmet_scene.flat
    scene = fs.device_arrays()
    scene = {k: np.asarray(v) for k, v in scene.items()}
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = float((hi - lo).max())

    def levels_at(dist_scale, res):
        cam = Camera(eye=center + np.array([0, 0, dist_scale * ext], np.float32), target=center)
        o, d = camera_rays(cam, res, res, np)
        hit = intersect_closest_np(o, d, scene["tri_pos"])
        lv = mip_level_from_uv(scene, hit["tri"], hit["u"], hit["v"], res, res, xp=np)
        m = hit["tri"] >= 0
        return lv[m]

    # near = magnified (high res, close), far = heavily minified (low res,
    # distant -- sub-pixel triangles take the interior fallback)
    near = levels_at(1.0, 128)
    far = levels_at(3.0, 40)
    assert far.size > 20 and near.size > 200
    assert far.mean() > near.mean() + 0.5, (near.mean(), far.mean())
    n_levels = scene["mat_tex_mip_ids"].shape[1]
    assert (near >= 0).all() and (far < n_levels).all()


def test_mips_reduce_minification_shimmer(helmet_scene):
    """Sub-pixel camera motion on a heavily minified view: the mip-sampled
    G-buffer albedo must be far more stable frame-to-frame than level-0
    point/bilinear sampling (the aliasing the feature exists to kill)."""
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.ref.tracer import render_gbuffer_np

    fs = helmet_scene.flat
    scene = {k: np.asarray(v) for k, v in fs.device_arrays().items()}
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = float((hi - lo).max())

    def shimmer(mips: bool):
        diffs = []
        prev = None
        for i in range(3):
            eps = 1e-3 * ext * i
            cam = Camera(
                eye=center + np.array([eps, eps, 6.0 * ext], np.float32), target=center
            )
            g = render_gbuffer_np(scene, cam, 40, 40, texture_mips=mips)
            img = np.where(g["hit"][..., None], g["albedo"], 0.0)
            if prev is not None:
                diffs.append(np.abs(img - prev).mean())
            prev = img
        return np.mean(diffs)

    s_mips = shimmer(True)
    s_raw = shimmer(False)
    assert s_mips < 0.7 * s_raw, (s_mips, s_raw)


def test_jax_oracle_mip_parity(helmet_scene):
    """jax G-buffer with mips == CPU oracle with mips (identical levels +
    fetches through the xp-generic path)."""
    import jax.numpy as jnp

    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.passes.gbuffer import camera_rays_jax, make_camera_arrays, render_gbuffer
    from nebulae_tpu.ref.tracer import render_gbuffer_np
    from nebulae_tpu.tracer.trace import make_tracer

    fs = helmet_scene.flat
    scene_np = {k: np.asarray(v) for k, v in fs.device_arrays().items()}
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    ext = float((hi - lo).max())
    cam = Camera(eye=center + np.array([0, 0, 4.0 * ext], np.float32), target=center)

    ref = render_gbuffer_np(scene_np, cam, 32, 32, texture_mips=True)

    cfg = RenderConfig(width=32, height=32, tracer="bruteforce")
    scene_jx = {k: jnp.asarray(v) for k, v in scene_np.items()}
    closest, _ = make_tracer(scene_jx, None, cfg)
    cam_arrays = make_camera_arrays(cam, 32, 32)
    o, d = camera_rays_jax(cam_arrays, 32, 32)
    got = render_gbuffer(scene_jx, closest, o, d, image_hw=(32, 32))
    m = ref["hit"]
    # Pixels whose UV derivative lands exactly on a log2 level boundary may
    # round to different levels under XLA's vs numpy's log2 -- allow a small
    # mismatch fraction, require everything else exact-ish.
    for key, tol in (("albedo", 1e-5), ("roughness", 1e-5)):
        a = np.asarray(got[key])[m]
        b = ref[key][m]
        frac = (np.abs(a - b) > tol).mean()
        assert frac < 0.05, (key, frac)
        assert np.median(np.abs(a - b)) <= tol, key
