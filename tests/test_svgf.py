"""SVGF specifics: reprojection geometry, history warping, motion stability."""

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.config import RenderConfig, SunLight


def test_reprojection_identity():
    """Static camera: reprojected coords == same pixel (subpixel exact)."""
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.passes.gbuffer import camera_rays_jax, make_camera_arrays
    from nebulae_tpu.passes.svgf import reproject_history

    w = h = 32
    cam_obj = Camera(eye=np.array([0.0, 0.0, 5.0]), target=np.zeros(3))
    cam = make_camera_arrays(cam_obj, w, h)
    o, d = camera_rays_jax(cam, w, h)
    # Fabricate hit positions 3 units along each ray.
    pos = (o + 3.0 * d).reshape(h, w, 3)
    # History = pixel-index ramps; identity reprojection must return them.
    ramp_x = jnp.tile(jnp.arange(w, dtype=jnp.float32)[None, :], (h, 1))
    ramp_y = jnp.tile(jnp.arange(h, dtype=jnp.float32)[:, None], (1, w))
    history = {
        "radiance": jnp.stack([ramp_x, ramp_y, ramp_x], -1),
        "depth": ramp_x,
        "normal": jnp.stack([ramp_y, ramp_y, ramp_y], -1),
        "moments": jnp.stack([ramp_x, ramp_x], -1),
        "histlen": ramp_y,
    }
    warped, valid = reproject_history(history, pos, cam["viewproj"], w, h)
    assert bool(valid.all())
    np.testing.assert_allclose(np.asarray(warped["depth"]), np.asarray(ramp_x), atol=5e-3)
    np.testing.assert_allclose(np.asarray(warped["histlen"]), np.asarray(ramp_y), atol=5e-3)


def test_reprojection_offscreen_invalid():
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.passes.gbuffer import make_camera_arrays
    from nebulae_tpu.passes.svgf import reproject_history

    w = h = 16
    cam = make_camera_arrays(Camera(eye=np.array([0.0, 0.0, 5.0]), target=np.zeros(3)), w, h)
    # Positions behind the camera are invalid.
    pos = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 50.0]), (h, w, 3))
    history = {
        "radiance": jnp.zeros((h, w, 3)),
        "depth": jnp.zeros((h, w)),
        "normal": jnp.zeros((h, w, 3)),
        "moments": jnp.zeros((h, w, 2)),
        "histlen": jnp.zeros((h, w)),
    }
    _, valid = reproject_history(history, pos, cam["viewproj"], w, h)
    assert not bool(np.asarray(valid).any())


def test_moving_camera_accumulates_with_reprojection(cornell_scene):
    """Orbiting camera: with reprojection the history survives (histlen grows
    beyond 1 on most hit pixels after a few frames)."""
    from nebulae_tpu.core.camera import OrbitCamera
    from nebulae_tpu.engine.renderer import Renderer

    cfg = RenderConfig(
        width=48, height=48, max_bounces=2, enable_svgf=True, enable_tonemap=False,
        svgf_reproject=True,
    )
    lo, hi = cornell_scene.flat.aabb_min, cornell_scene.flat.aabb_max
    center = (lo + hi) * 0.5
    cam = OrbitCamera(distance=2.4 * float(np.max(hi - lo)), pitch_deg=5.0, target=center)
    r = Renderer(cornell_scene.flat, cfg)
    for _ in range(5):
        cam.rotate(1.5, 0.0)
        out = r.render(cam.camera())
    histlen = np.asarray(r.state["svgf"]["histlen"])
    hit = np.asarray(out["hit"])
    assert np.isfinite(np.asarray(out["denoised"])).all()
    # Most surviving hit pixels should have accumulated more than 2 frames.
    assert (histlen[hit] > 2.0).mean() > 0.5
