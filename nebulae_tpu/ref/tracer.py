"""CPU reference path tracer (numpy, brute force, trusted-by-inspection).

The allclose oracle for the whole TPU pipeline (SURVEY.md section 7 step 2):
straightforward Moller-Trumbore intersection against *every* triangle, a
Python loop over bounces, and the shared shading/sampling math from
nebulae_tpu.core.brdf (single source of truth).  Slow by design; used on
small configs (Cornell 256^2, DamagedHelmet crops) in tests.

The RNG sequence is bit-exact with the TPU tracer (core.rng XorShift32 +
Jenkins seeding and the draw-order contract in core.brdf), so images match to
float tolerance, not just statistically.
"""

from __future__ import annotations

import numpy as np

from nebulae_tpu.core import brdf, rng as nrng
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core.camera import Camera, camera_rays
from nebulae_tpu.core.surface import reconstruct_surface, reconstruct_surface_fast

_EPS = 1e-7


def intersect_closest_np(o, d, tri_pos, t_max=np.inf, chunk=4_000_000):
    """Brute-force closest hit. o, d: [N, 3]; tri_pos: [T, 3, 3].

    Returns dict(t [N], tri [N] (-1 = miss), u [N], v [N]).
    Watertight enough for reference use: two-sided Moller-Trumbore.
    """
    n = o.shape[0]
    t_count = tri_pos.shape[0]
    best_t = np.full(n, np.inf, np.float32)
    best_tri = np.full(n, -1, np.int32)
    best_u = np.zeros(n, np.float32)
    best_v = np.zeros(n, np.float32)
    if t_count == 0:
        return {"t": best_t, "tri": best_tri, "u": best_u, "v": best_v}
    # Chunk over triangles to bound the [N, Tc] temporaries.
    tc = max(1, min(t_count, chunk // max(n, 1)))
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    for s in range(0, t_count, tc):
        sl = slice(s, min(s + tc, t_count))
        _v0, _e1, _e2 = v0[sl], e1[sl], e2[sl]
        pvec = np.cross(d[:, None, :], _e2[None, :, :])  # [N, Tc, 3]
        det = np.einsum("tk,ntk->nt", _e1, pvec)
        inv_det = np.where(np.abs(det) < _EPS, 0.0, 1.0 / np.where(det == 0, 1.0, det))
        tvec = o[:, None, :] - _v0[None, :, :]
        u = np.einsum("ntk,ntk->nt", tvec, pvec) * inv_det
        qvec = np.cross(tvec, _e1[None, :, :])
        v = np.einsum("nk,ntk->nt", d, qvec) * inv_det
        t = np.einsum("tk,ntk->nt", _e2, qvec) * inv_det
        ok = (
            (np.abs(det) >= _EPS)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > _EPS)
            & (t < t_max)
        )
        t = np.where(ok, t, np.inf).astype(np.float32)
        arg = np.argmin(t, axis=1)
        rows = np.arange(n)
        tmin = t[rows, arg]
        better = tmin < best_t
        best_t = np.where(better, tmin, best_t)
        best_tri = np.where(better, (s + arg).astype(np.int32), best_tri)
        best_u = np.where(better, u[rows, arg].astype(np.float32), best_u)
        best_v = np.where(better, v[rows, arg].astype(np.float32), best_v)
    return {"t": best_t, "tri": best_tri, "u": best_u, "v": best_v}


def intersect_any_np(o, d, tri_pos, t_max=np.inf, chunk=4_000_000):
    """Brute-force any-hit (shadow rays). Returns occluded [N] bool."""
    n = o.shape[0]
    t_count = tri_pos.shape[0]
    occluded = np.zeros(n, bool)
    if t_count == 0:
        return occluded
    tc = max(1, min(t_count, chunk // max(n, 1)))
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    tmax_arr = np.broadcast_to(np.asarray(t_max, np.float32), (n,))
    for s in range(0, t_count, tc):
        sl = slice(s, min(s + tc, t_count))
        _v0, _e1, _e2 = v0[sl], e1[sl], e2[sl]
        pvec = np.cross(d[:, None, :], _e2[None, :, :])
        det = np.einsum("tk,ntk->nt", _e1, pvec)
        inv_det = np.where(np.abs(det) < _EPS, 0.0, 1.0 / np.where(det == 0, 1.0, det))
        tvec = o[:, None, :] - _v0[None, :, :]
        u = np.einsum("ntk,ntk->nt", tvec, pvec) * inv_det
        qvec = np.cross(tvec, _e1[None, :, :])
        v = np.einsum("nk,ntk->nt", d, qvec) * inv_det
        t = np.einsum("tk,ntk->nt", _e2, qvec) * inv_det
        ok = (
            (np.abs(det) >= _EPS)
            & (u >= 0.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > _EPS)
            & (t < tmax_arr[:, None])
        )
        occluded |= ok.any(axis=1)
    return occluded


# ---------------------------------------------------------------------------
# Passes
# ---------------------------------------------------------------------------


def render_gbuffer_np(scene: dict, camera: Camera, width: int, height: int, jitter=None,
                      texture_mips: bool = False):
    """Primary-visibility G-buffer: same four targets as the reference's
    raster pass (deferred_gbuffers.hlsl:94-103) plus depth + hit mask.
    `texture_mips` mirrors the jax pass's UV-derivative mip selection
    (core.surface.mip_level_from_uv, xp-generic -> identical levels)."""
    o, d = camera_rays(camera, width, height, np, jitter=jitter)
    hit = intersect_closest_np(o, d, scene["tri_pos"])
    valid = hit["tri"] >= 0
    mip = None
    if texture_mips and "mat_tex_mip_ids" in scene and scene["textures"].shape[0] > 0:
        from nebulae_tpu.core.surface import mip_level_from_uv

        mip = mip_level_from_uv(scene, hit["tri"], hit["u"], hit["v"], height, width, xp=np)
    surf = reconstruct_surface(
        scene, hit["tri"], hit["u"], hit["v"], view_dir=-d, xp=np, mip_level=mip
    )
    return {
        "hit": valid,
        "depth": np.where(valid, hit["t"], np.inf).astype(np.float32),
        "position": surf["position"].astype(np.float32),
        "normal_g": surf["normal_g"].astype(np.float32),
        "normal_s": surf["normal_s"].astype(np.float32),
        "albedo": surf["albedo"].astype(np.float32),
        "roughness": surf["roughness"].astype(np.float32),
        "metalness": surf["metalness"].astype(np.float32),
        "emissive": surf["emissive"].astype(np.float32),
        "view": (-d).astype(np.float32),
        "ray_o": o.astype(np.float32),
        "ray_d": d.astype(np.float32),
    }


def shade_direct_np(scene, gbuf, sun, rng_state):
    """Sun NEE with one jittered sun-disk shadow ray per pixel -- the
    deferred PBR pass (deferred_pbr.hlsl:80-113). Returns (radiance, rng)."""
    n = gbuf["normal_s"]
    v = gbuf["view"]
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    sun_dir = np.asarray(sun.direction, np.float32)
    l = brdf.sun_disk_sample(u1, u2, sun_dir[None, :], float(sun.tan_half_angle), np)
    n_dot_l = np.clip(nmath.dot(n, l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(n, v, l, gbuf["albedo"], gbuf["roughness"], gbuf["metalness"], np)
    origin = brdf.offset_ray_origin(gbuf["position"], gbuf["normal_g"])
    shoot = gbuf["hit"] & (n_dot_l > 0.0)
    occluded = np.zeros(shoot.shape, bool)
    if shoot.any():
        occluded[shoot] = intersect_any_np(origin[shoot], l[shoot], scene["tri_pos"])
    vis = np.where(shoot & ~occluded, 1.0, 0.0)
    radiance = f * (n_dot_l * vis)[..., None] * np.asarray(sun.radiance, np.float32)
    return np.where(gbuf["hit"][..., None], radiance + gbuf["emissive"], 0.0), rng_state


def render_direct_np(scene, camera, cfg, sun, frame=0):
    """Config 0 (Cornell direct + hard shadows): G-buffer + direct pass.

    Misses show the sky. Returns HDR image [H, W, 3]."""
    w, h = cfg.width, cfg.height
    gbuf = render_gbuffer_np(scene, camera, w, h, texture_mips=cfg.texture_mips)
    xs, ys = np.meshgrid(np.arange(w, dtype=np.uint32), np.arange(h, dtype=np.uint32))
    state = nrng.init_rng(xs.reshape(-1), ys.reshape(-1), w, frame)
    direct, state = shade_direct_np(scene, gbuf, sun, state)
    sky = brdf.sky_eval(gbuf["ray_d"], sun, scene, cfg, np)
    img = np.where(gbuf["hit"][..., None], direct, sky)
    return img.reshape(h, w, 3).astype(np.float32)


def path_trace_np(scene, camera, cfg, sun, frame=0):
    """Full path trace: G-buffer primary + NEE at every vertex + cosine
    indirect bounces (pathtracer.hlsl:397-625's algorithm, query mode without
    the cache).  Returns HDR radiance [H, W, 3] (direct + indirect)."""
    w, h = cfg.width, cfg.height
    gbuf = render_gbuffer_np(scene, camera, w, h, texture_mips=cfg.texture_mips)
    n_pix = w * h
    xs, ys = np.meshgrid(np.arange(w, dtype=np.uint32), np.arange(h, dtype=np.uint32))
    state = nrng.init_rng(xs.reshape(-1), ys.reshape(-1), w, frame)

    acc = np.zeros((n_pix, 3), np.float32)
    sun_dir = np.asarray(sun.direction, np.float32)
    sun_rad = np.asarray(sun.radiance, np.float32)

    for s in range(cfg.spp):
        sample_gbuf = gbuf
        if cfg.jitter_primary:
            # 2 jitter draws then the path draws (core.brdf draw-order
            # contract); each sample traces its own primary hit.
            state, jx = nrng.next_float(state)
            state, jy = nrng.next_float(state)
            sample_gbuf = render_gbuffer_np(
                scene, camera, w, h, jitter=np.stack([jx, jy], -1),
                texture_mips=cfg.texture_mips,
            )
            sky_s = brdf.sky_eval(sample_gbuf["ray_d"], sun, scene, cfg, np)
            acc += np.where(sample_gbuf["hit"][..., None], 0.0, sky_s)
        throughput = np.ones((n_pix, 3), np.float32)
        alive = sample_gbuf["hit"].copy()
        surf = {
            "position": sample_gbuf["position"],
            "normal_g": sample_gbuf["normal_g"],
            "normal_s": sample_gbuf["normal_s"],
            "albedo": sample_gbuf["albedo"],
            "roughness": sample_gbuf["roughness"],
            "metalness": sample_gbuf["metalness"],
            "emissive": sample_gbuf["emissive"],
        }
        view = sample_gbuf["view"]
        acc += np.where(alive[..., None], surf["emissive"], 0.0) * throughput

        for bounce in range(cfg.max_bounces):
            # --- NEE: sun disk (2 draws) ---
            state, u1 = nrng.next_float(state)
            state, u2 = nrng.next_float(state)
            l = brdf.sun_disk_sample(u1, u2, sun_dir[None, :], float(sun.tan_half_angle), np)
            n_dot_l = np.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
            f = brdf.eval_brdf(
                surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], np
            )
            origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
            shoot = alive & (n_dot_l > 0.0)
            occ = np.zeros(n_pix, bool)
            if shoot.any():
                occ[shoot] = intersect_any_np(origin[shoot], l[shoot], scene["tri_pos"])
            vis = np.where(shoot & ~occ, 1.0, 0.0)
            acc += np.where(
                alive[..., None], throughput * f * (n_dot_l * vis)[..., None] * sun_rad, 0.0
            )

            if bounce == cfg.max_bounces - 1:
                break

            # --- lobe-selection Russian roulette (1 draw): continue through
            # the diffuse lobe with probability p_d, boosting throughput by
            # 1/p_d, else absorb (pathtracer.hlsl:474-479, 596-620;
            # brdf.hlsli:130-146) ---
            state, u_rr = nrng.next_float(state)
            n_dot_v = np.clip(nmath.dot(surf["normal_s"], view)[..., 0], 0.0, 1.0)
            p_d = brdf.diffuse_probability(surf["albedo"], surf["metalness"], n_dot_v, np)
            # --- indirect: cosine hemisphere, Lambertian weight (2 draws) ---
            state, u1 = nrng.next_float(state)
            state, u2 = nrng.next_float(state)
            new_d = brdf.cosine_hemisphere_sample(u1, u2, surf["normal_s"], np)
            # f_d * cos / pdf with pdf = cos/pi: weight = diffuse reflectance
            weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], np) / p_d[..., None]
            throughput = throughput * weight
            alive = alive & (u_rr < p_d)
            if cfg.throughput_threshold > 0.0:
                alive = alive & (throughput.max(axis=-1) > cfg.throughput_threshold)

            hit = intersect_closest_np(origin, new_d, scene["tri_pos"])
            found = hit["tri"] >= 0
            # miss -> sky contribution, path dies
            sky_b = brdf.sky_eval(new_d, sun, scene, cfg, np)
            acc += np.where((alive & ~found)[..., None], throughput * sky_b, 0.0)
            # NOTE: no early-out on all-dead -- the per-pixel RNG stream must
            # consume exactly the same number of draws as the TPU tracer so
            # multi-sample sequences stay bit-identical.
            alive = alive & found
            if cfg.fast_bounce_shading:
                surf = reconstruct_surface_fast(
                    scene, hit["tri"], hit["u"], hit["v"], origin, new_d, hit["t"], np
                )
            else:
                surf = reconstruct_surface(scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=np)
            acc += np.where(alive[..., None], throughput * surf["emissive"], 0.0)
            view = -new_d

    img = acc / cfg.spp
    if not cfg.jitter_primary:
        # Misses on the primary ray show the sky directly (with jitter the
        # per-sample sky was already folded into acc).
        sky_p = brdf.sky_eval(gbuf["ray_d"], sun, scene, cfg, np)
        img = np.where(gbuf["hit"][..., None], img, sky_p)
    return img.reshape(h, w, 3).astype(np.float32)
