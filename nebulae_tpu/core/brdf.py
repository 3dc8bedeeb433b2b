"""Cook-Torrance + Lambert BRDF and sampling routines.

Behavioural port of the reference's BRDF library
(/root/reference/assets/shaders/brdf.hlsli: GGX Trowbridge-Reitz NDF,
Smith/Schlick-GGX geometry, Schlick Fresnel, F0 = lerp(0.04, albedo, metal),
cosine-hemisphere sampling) and sun-disk cone sampling
(assets/shaders/sun_disk_sampling.hlsli, used by pathtracer.hlsl:546-576).

Everything is xp-generic (numpy or jax.numpy) and float32 so that the CPU
reference tracer and the jitted TPU pipeline execute *the same arithmetic* --
this module is the single source of truth for shading math, which is what
makes the allclose oracle meaningful.

RNG draw-order contract (both tracers must follow it exactly):
  per sample:  [optional 2 draws pixel jitter]
  per path vertex (incl. primary): 2 draws sun-disk NEE, then -- unless it
  is the final vertex -- 1 draw lobe-selection Russian roulette followed by
  2 draws cosine-hemisphere indirect direction.
"""

from __future__ import annotations

import numpy as np

from nebulae_tpu.core import math as nmath

F0_DIELECTRIC = 0.04
PI = 3.14159265358979


def _xp(a):
    if isinstance(a, np.ndarray):
        return np
    import jax.numpy as jnp

    return jnp


def fresnel_schlick(cos_theta, f0, xp):
    c = xp.clip(cos_theta, 0.0, 1.0)
    return f0 + (1.0 - f0) * (1.0 - c) ** 5


def ggx_ndf(n_dot_h, alpha, xp):
    a2 = alpha * alpha
    d = n_dot_h * n_dot_h * (a2 - 1.0) + 1.0
    return a2 / xp.maximum(PI * d * d, 1e-8)


def smith_g1(n_dot_x, alpha, xp):
    # Schlick-GGX: k = alpha/2 (direct lighting form used by the reference)
    k = alpha * 0.5
    return n_dot_x / xp.maximum(n_dot_x * (1.0 - k) + k, 1e-8)


def base_f0(albedo, metalness, xp):
    return (
        F0_DIELECTRIC * (1.0 - metalness[..., None]) + albedo * metalness[..., None]
    )


def eval_brdf(n, v, l, albedo, roughness, metalness, xp=None):
    """Cook-Torrance specular + Lambert diffuse; returns f(v,l) (no cosine).

    n, v, l: [..., 3] unit vectors (v, l point away from the surface).
    albedo: [..., 3]; roughness/metalness: [...].
    """
    xp = xp or _xp(n)
    h = nmath.normalize(v + l)
    n_dot_l = xp.clip(nmath.dot(n, l)[..., 0], 0.0, 1.0)
    n_dot_v = xp.clip(nmath.dot(n, v)[..., 0], 0.0, 1.0)
    n_dot_h = xp.clip(nmath.dot(n, h)[..., 0], 0.0, 1.0)
    v_dot_h = xp.clip(nmath.dot(v, h)[..., 0], 0.0, 1.0)
    alpha = xp.maximum(roughness * roughness, 1e-3)
    f0 = base_f0(albedo, metalness, xp)
    fres = fresnel_schlick(v_dot_h[..., None], f0, xp)
    d = ggx_ndf(n_dot_h, alpha, xp)
    g = smith_g1(n_dot_l, alpha, xp) * smith_g1(n_dot_v, alpha, xp)
    spec = fres * (d * g / xp.maximum(4.0 * n_dot_l * n_dot_v, 1e-8))[..., None]
    kd = (1.0 - fres) * (1.0 - metalness[..., None])
    diffuse = kd * albedo / PI
    return diffuse + spec


def diffuse_reflectance(albedo, metalness, xp=None):
    """Energy reaching the diffuse lobe (reference multiplies throughput by
    this at the primary vertex, pathtracer.hlsl:474-479)."""
    xp = xp or _xp(albedo)
    return albedo * (1.0 - metalness[..., None])


def specular_probability(albedo, metalness, n_dot_v, xp=None):
    """Lobe-selection heuristic: fresnel-weighted specular luminance vs diffuse,
    clamped to [0.1, 0.9] (brdf.hlsli:130-146 behaviour)."""
    xp = xp or _xp(albedo)
    f0 = base_f0(albedo, metalness, xp)
    fres = fresnel_schlick(n_dot_v[..., None], f0, xp)
    s = nmath.luminance(fres, xp)
    d = nmath.luminance(diffuse_reflectance(albedo, metalness, xp), xp)
    p = s / xp.maximum(s + d, 1e-8)
    return xp.clip(p, 0.1, 0.9)


def diffuse_probability(albedo, metalness, n_dot_v, xp=None):
    """Probability of continuing a path through the diffuse lobe: the
    complement of the specular-probability heuristic, in [0.1, 0.9].

    Used by the bounce loop's lobe-selection Russian roulette
    (pathtracer.hlsl:474-479, 596-620): draw u ~ U[0,1); continue the diffuse
    bounce iff u < p_d, dividing throughput by p_d, else the path is absorbed
    (the reference's EvaluateIndirectBRDF "BRDFAbsorption" break -- there the
    specular lobe is never implemented, so losing the lobe draw ends the
    path).  The division keeps the diffuse-lobe estimator unbiased."""
    xp = xp or _xp(albedo)
    return 1.0 - specular_probability(albedo, metalness, n_dot_v, xp)


# ---------------------------------------------------------------------------
# Sampling
# ---------------------------------------------------------------------------


def cosine_hemisphere_sample(u1, u2, n, xp=None):
    """Cosine-weighted direction around unit normal n. pdf = cos/pi."""
    xp = xp or _xp(n)
    r = xp.sqrt(u1)
    phi = 2.0 * PI * u2
    t, b = nmath.build_orthonormal_basis(n, xp)
    x = r * xp.cos(phi)
    y = r * xp.sin(phi)
    z = xp.sqrt(xp.maximum(1.0 - u1, 0.0))
    return nmath.normalize(x[..., None] * t + y[..., None] * b + z[..., None] * n)


def sun_disk_sample(u1, u2, sun_dir, tan_half_angle, xp=None):
    """Uniform direction in the sun's cone (tangent-frame disk offset), the
    NEE light sampling of pathtracer.hlsl:546-576.  sun_dir points *toward*
    the sun (away from surfaces)."""
    xp = xp or _xp(sun_dir)
    t, b = nmath.build_orthonormal_basis(sun_dir, xp)
    r = xp.sqrt(u1) * tan_half_angle
    phi = 2.0 * PI * u2
    d = sun_dir + r[..., None] * (xp.cos(phi)[..., None] * t + xp.sin(phi)[..., None] * b)
    return nmath.normalize(d)


def sample_vndf_ggx(u1, u2, n, v, roughness, xp=None):
    """Sample a GGX half-vector from the visible-normal distribution (VNDF,
    Heitz 2018 spherical-caps form) -- the specular importance sampler the
    reference ships but leaves unused in its live path
    (brdf.hlsli:149-184, call site commented at pathtracer.hlsl:194); kept
    available here for the same parity.  Reflecting `v` about the returned
    half-vector gives the specular bounce direction.

    n [.,3] unit shading normal; v [.,3] unit direction TOWARD the viewer.
    Returns h [.,3] (unit).  pdf = G1(v) D(h) (v.h) / (v.n) / (4 (v.h)) =
    G1(v) D(h) / (4 (v.n)) -- see vndf_pdf."""
    xp = xp or _xp(n)
    alpha = roughness * roughness
    t, b = nmath.build_orthonormal_basis(n, xp)
    # view into tangent space (z = n)
    vx = nmath.dot(v, t)[..., 0]
    vy = nmath.dot(v, b)[..., 0]
    vz = xp.clip(nmath.dot(v, n)[..., 0], 1e-6, 1.0)
    # stretch by the roughness (the GGX ellipsoid -> hemisphere warp)
    vh = nmath.normalize(xp.stack([alpha * vx, alpha * vy, vz], axis=-1))
    # orthonormal frame around vh (tangent-space z up)
    lensq = vh[..., 0] ** 2 + vh[..., 1] ** 2
    inv = 1.0 / xp.sqrt(xp.maximum(lensq, 1e-20))
    t1 = xp.where(
        (lensq > 1e-12)[..., None],
        xp.stack([-vh[..., 1] * inv, vh[..., 0] * inv, xp.zeros_like(inv)], axis=-1),
        xp.broadcast_to(xp.asarray([1.0, 0.0, 0.0], vh.dtype), vh.shape),
    )
    t2 = nmath.cross(vh, t1)
    # sample the visible hemisphere (projected disk with z-tilt)
    r = xp.sqrt(u1)
    phi = 2.0 * PI * u2
    p1 = r * xp.cos(phi)
    p2 = r * xp.sin(phi)
    s = 0.5 * (1.0 + vh[..., 2])
    p2 = (1.0 - s) * xp.sqrt(xp.maximum(1.0 - p1 * p1, 0.0)) + s * p2
    p3 = xp.sqrt(xp.maximum(1.0 - p1 * p1 - p2 * p2, 0.0))
    nh = p1[..., None] * t1 + p2[..., None] * t2 + p3[..., None] * vh
    # unstretch back to the GGX ellipsoid
    h_ts = nmath.normalize(
        xp.stack(
            [alpha * nh[..., 0], alpha * nh[..., 1], xp.maximum(nh[..., 2], 1e-6)], axis=-1
        )
    )
    return nmath.normalize(
        h_ts[..., 0:1] * t + h_ts[..., 1:2] * b + h_ts[..., 2:3] * n
    )


def smith_g1_exact(n_dot_x, alpha, xp):
    """Exact Smith height-correlated G1 for GGX (not the Schlick-GGX
    approximation the shading path uses) -- the VNDF pdf must use this form
    to integrate exactly against sample_vndf_ggx."""
    a2 = alpha * alpha
    c = xp.clip(n_dot_x, 1e-6, 1.0)
    return 2.0 * c / (c + xp.sqrt(a2 + (1.0 - a2) * c * c))


def vndf_pdf(n, v, h, roughness, xp=None):
    """Solid-angle pdf of the reflected direction l = reflect(-v, h) under
    sample_vndf_ggx: G1_exact(v) D(h) / (4 (n.v))."""
    xp = xp or _xp(n)
    alpha = roughness * roughness
    n_dot_v = xp.clip(nmath.dot(n, v)[..., 0], 1e-6, 1.0)
    n_dot_h = xp.clip(nmath.dot(n, h)[..., 0], 0.0, 1.0)
    return (
        smith_g1_exact(n_dot_v, alpha, xp)
        * ggx_ndf(n_dot_h, alpha, xp)
        / (4.0 * n_dot_v)
    )


def offset_ray_origin(p, n, scale: float = 1e-4):
    """Self-intersection avoidance: offset along the geometric normal.

    (The reference uses the RT-Gems integer-ulp OffsetRay; a scaled normal
    offset is sufficient at our scene scales and is differentiable.)
    """
    return p + n * scale


# ---------------------------------------------------------------------------
# Sky / sun lighting model (single directional sun-disk + constant sky,
# DeferredRenderer's scene lighting model)
# ---------------------------------------------------------------------------


def sky_radiance(d, sky_color, xp=None):
    """Constant sky color (reference: UI-set constant sky)."""
    xp = xp or _xp(d)
    return xp.broadcast_to(xp.asarray(sky_color, xp.float32), d.shape[:-1] + (3,))


def sky_envmap(d, env_map, xp=None):
    """Lat-long environment map lookup (IBL sky): d [..., 3] unit ->
    bilinear sample of env_map [H, W, 3] (phi -> u, theta -> v).

    Beyond the reference's constant sky -- gives the DamagedHelmet config its
    image-based lighting. Differentiable w.r.t. the map (it is a gather, so
    keep maps small or stop-grad them when not training the environment)."""
    xp = xp or _xp(d)
    h, w = env_map.shape[0], env_map.shape[1]
    phi = xp.arctan2(d[..., 2], d[..., 0])  # [-pi, pi]
    theta = xp.arccos(xp.clip(d[..., 1], -1.0, 1.0))  # [0, pi], 0 = up
    u = (phi / (2.0 * PI) + 0.5) * w - 0.5
    v = theta / PI * h - 0.5
    x0 = xp.floor(u)
    y0 = xp.floor(v)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    x0i = xp.asarray(x0, xp.int32) % w
    x1i = (x0i + 1) % w
    y0i = xp.clip(xp.asarray(y0, xp.int32), 0, h - 1)
    y1i = xp.clip(y0i + 1, 0, h - 1)
    c00 = env_map[y0i, x0i]
    c01 = env_map[y0i, x1i]
    c10 = env_map[y1i, x0i]
    c11 = env_map[y1i, x1i]
    top = c00 * (1.0 - fx) + c01 * fx
    bot = c10 * (1.0 - fx) + c11 * fx
    return top * (1.0 - fy) + bot * fy


def sky_eval(d, sun, scene, cfg, xp=None):
    """Sky radiance along miss direction d: env map when enabled, else the
    constant sky color."""
    xp = xp or _xp(d)
    if getattr(cfg, "enable_envmap", False) and "env_map" in scene:
        return sky_envmap(d, scene["env_map"], xp)
    return sky_radiance(d, sun.sky_color, xp)
