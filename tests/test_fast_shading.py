"""Fast bounce shading: oracle parity + bounded bias vs full shading."""

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.config import RenderConfig, SunLight


def test_fast_bounce_allclose_vs_oracle(cornell_scene, cornell_camera):
    """With fast_bounce_shading on, the TPU pipeline still matches the CPU
    oracle exactly (both implement the same fast path)."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays
    from nebulae_tpu.ref.tracer import path_trace_np

    cfg = RenderConfig(
        width=64, height=64, max_bounces=3, enable_svgf=False, enable_tonemap=False,
        fast_bounce_shading=True,
    )
    scene_np = cornell_scene.flat.device_arrays()
    sun = SunLight.default(np)
    ref = path_trace_np(scene_np, cornell_camera, cfg, sun, frame=2)

    scene_jx = {k: jnp.asarray(v) for k, v in scene_np.items()}
    sun_jx = jax.tree.map(jnp.asarray, sun)
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)
    state["frame"] = jnp.uint32(2)
    out, _ = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg))(
        scene_jx, sun_jx, cam, state
    )
    np.testing.assert_allclose(np.asarray(out["hdr"]), ref, rtol=1e-3, atol=2e-4)


def test_fast_bounce_bias_is_small(cornell_scene, cornell_camera):
    """Cornell has no textures, so fast vs full bounce shading differ only by
    face-vs-interpolated geometric normals: images should be very close."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    sun = jax.tree.map(jnp.asarray, SunLight.default(np))
    cam = make_camera_arrays(cornell_camera, 64, 64)
    imgs = {}
    for fast in (False, True):
        cfg = RenderConfig(
            width=64, height=64, max_bounces=3, enable_svgf=False, enable_tonemap=False,
            fast_bounce_shading=fast,
        )
        out, _ = jax.jit(lambda s, su, c, st, cfg=cfg: render_frame(s, None, su, c, st, cfg))(
            scene, sun, cam, init_frame_state(cfg)
        )
        imgs[fast] = np.asarray(out["hdr"])
    diff = np.abs(imgs[True] - imgs[False]).mean()
    assert diff < 0.02, f"fast-shading bias too large: {diff}"
