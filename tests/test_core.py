"""Core layer tests: math codecs, RNG parity, glTF import, scene flatten."""

import numpy as np
import pytest


def test_oct_roundtrip():
    from nebulae_tpu.core import math as nmath

    rng = np.random.default_rng(0)
    v = rng.normal(size=(1000, 3)).astype(np.float32)
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dec = nmath.oct_decode(nmath.oct_encode(v, np), np)
    assert np.abs((dec * v).sum(-1) - 1.0).max() < 1e-5


def test_onb_orthonormal():
    from nebulae_tpu.core import math as nmath

    rng = np.random.default_rng(1)
    n = rng.normal(size=(500, 3))
    n /= np.linalg.norm(n, axis=-1, keepdims=True)
    t, b = nmath.build_orthonormal_basis(n, np)
    assert np.abs((t * n).sum(-1)).max() < 1e-6
    assert np.abs((b * n).sum(-1)).max() < 1e-6
    assert np.abs((t * b).sum(-1)).max() < 1e-6
    assert np.abs(np.linalg.norm(t, axis=-1) - 1).max() < 1e-6


def test_rng_numpy_jax_bitexact():
    """XorShift32 streams must be identical between numpy and jax uint32."""
    import jax.numpy as jnp

    from nebulae_tpu.core import rng as nrng

    x = np.arange(4096, dtype=np.uint32)
    y = np.arange(4096, dtype=np.uint32) // 7
    s_np = nrng.init_rng(x, y, 64, 3)
    s_jx = nrng.init_rng(jnp.asarray(x), jnp.asarray(y), 64, 3)
    np.testing.assert_array_equal(s_np, np.asarray(s_jx))
    for _ in range(5):
        s_np, f_np = nrng.next_float(s_np)
        s_jx, f_jx = nrng.next_float(s_jx)
        np.testing.assert_array_equal(s_np, np.asarray(s_jx))
        np.testing.assert_array_equal(f_np, np.asarray(f_jx))
    assert f_np.min() >= 0.0 and f_np.max() < 1.0
    # Uniformity sanity
    assert abs(f_np.mean() - 0.5) < 0.02


def test_cornell_import(cornell_scene):
    fs = cornell_scene.flat
    assert fs.num_triangles > 10
    assert fs.num_materials == 3
    # Cornell has no textures
    assert fs.textures.shape[0] == 0
    # Normals unit length
    n = fs.tri_nrm.reshape(-1, 3)
    assert np.abs(np.linalg.norm(n, axis=-1) - 1.0).max() < 1e-3
    # AABB sane and contains all triangles
    p = fs.tri_pos.reshape(-1, 3)
    assert (p.min(0) >= fs.aabb_min - 1e-4).all()
    assert (p.max(0) <= fs.aabb_max + 1e-4).all()


def test_helmet_import(helmet_scene):
    fs = helmet_scene.flat
    assert fs.num_triangles > 10000
    assert fs.textures.shape[0] >= 3  # albedo, MR, normal, emissive, AO
    assert fs.tex_hw.max() <= 512
    # Tangents should be unit-ish and orthogonal to normals where defined
    t = fs.tri_tan[..., :3].reshape(-1, 3)
    n = fs.tri_nrm.reshape(-1, 3)
    dots = np.abs((t * n).sum(-1))
    assert np.median(dots) < 0.1


def test_camera_rays():
    from nebulae_tpu.core.camera import Camera, camera_rays

    cam = Camera(eye=np.array([0.0, 0.0, 5.0]), target=np.zeros(3))
    o, d = camera_rays(cam, 64, 32, np)
    assert o.shape == (64 * 32, 3) and d.shape == (64 * 32, 3)
    assert np.abs(np.linalg.norm(d, axis=-1) - 1.0).max() < 1e-5
    # Central ray points at the target
    center = d.reshape(32, 64, 3)[16, 32]
    assert center[2] < -0.99


def test_srgb_roundtrip():
    from nebulae_tpu.core.texture import linear_to_srgb, srgb_to_linear

    x = np.linspace(0, 1, 256, dtype=np.float32)
    np.testing.assert_allclose(linear_to_srgb(srgb_to_linear(x)), x, atol=1e-5)


def test_bilinear_sampling():
    from nebulae_tpu.core.texture import sample_bilinear

    tex = np.zeros((1, 4, 4, 4), np.uint8)
    tex[0, :, :, 0] = np.arange(16).reshape(4, 4) * 16
    hw = np.array([[4, 4]], np.int32)
    tid = np.zeros(3, np.int32)
    # Texel centers: uv=(0.125,0.125) -> texel (0,0)
    uv = np.array([[0.125, 0.125], [0.375, 0.125], [0.625, 0.625]], np.float32)
    out = sample_bilinear(tex, hw, tid, uv, np)
    np.testing.assert_allclose(out[:, 0] * 255, [0, 16, 160], atol=0.51)


def test_vndf_ggx_sampler_matches_uniform_estimate():
    """VNDF GGX specular sampler (brdf.hlsli:149-184 parity -- shipped but
    unused in the reference's live path too): sampled half-vectors lie in
    the upper hemisphere, and the Monte-Carlo estimate of a specular
    integral under VNDF importance sampling matches the uniform-hemisphere
    estimate of the same integral (validates sampler + pdf jointly)."""
    import numpy as np

    from nebulae_tpu.core import brdf
    from nebulae_tpu.core import math as nmath

    rng = np.random.default_rng(7)
    n_s = 200_000
    n = np.tile(np.array([[0.0, 0.0, 1.0]], np.float32), (n_s, 1))
    v_dir = nmath.normalize(np.array([[0.4, -0.2, 0.9]], np.float32))
    v = np.tile(v_dir, (n_s, 1)).astype(np.float32)
    rough = np.float32(0.45)
    alpha = rough * rough

    u1 = rng.random(n_s).astype(np.float32)
    u2 = rng.random(n_s).astype(np.float32)
    h = brdf.sample_vndf_ggx(u1, u2, n, v, rough, np)
    assert np.all(h[:, 2] > 0.0)  # upper hemisphere
    l = nmath.normalize(2.0 * nmath.dot(v, h) * h - v)

    def spec(lv):
        hh = nmath.normalize(v + lv)
        n_dot_l = np.clip(lv[:, 2], 0.0, 1.0)
        n_dot_v = np.clip(v[:, 2], 1e-6, 1.0)
        n_dot_h = np.clip(hh[:, 2], 0.0, 1.0)
        d = brdf.ggx_ndf(n_dot_h, alpha, np)
        g = brdf.smith_g1_exact(n_dot_l, alpha, np) * brdf.smith_g1_exact(
            n_dot_v, alpha, np
        )
        return np.where(n_dot_l > 0, d * g / (4.0 * n_dot_v * np.maximum(n_dot_l, 1e-6)), 0.0) * n_dot_l

    pdf = brdf.vndf_pdf(n, v, h, rough, np)
    est_vndf = np.mean(spec(l) / np.maximum(pdf, 1e-12))

    # uniform hemisphere reference
    z = rng.random(n_s).astype(np.float32)
    phi = (2.0 * np.pi * rng.random(n_s)).astype(np.float32)
    sq = np.sqrt(np.maximum(1.0 - z * z, 0.0))
    lu = np.stack([sq * np.cos(phi), sq * np.sin(phi), z], -1).astype(np.float32)
    est_uni = np.mean(spec(lu)) * 2.0 * np.pi

    assert np.isfinite([est_vndf, est_uni]).all()
    # MC error at 200k samples: a few percent
    assert abs(est_vndf - est_uni) / est_uni < 0.05, (est_vndf, est_uni)
    # VNDF weight fr*(n.l)/pdf = G1(l-side) factor <= 1: variance must be
    # far below the uniform estimator's (the point of importance sampling)
    w = spec(l) / np.maximum(pdf, 1e-12)
    assert np.std(w) < 0.2 * np.std(spec(lu) * 2.0 * np.pi), (np.std(w),)

    # near-mirror roughness: the NDF is a delta at the normal, so sampled
    # half vectors collapse to n (and reflect(v, h) -> mirror direction)
    h0 = brdf.sample_vndf_ggx(u1[:1000], u2[:1000], n[:1000], v[:1000], np.float32(0.02), np)
    assert float(np.mean(nmath.dot(h0, n[:1000]))) > 0.999
