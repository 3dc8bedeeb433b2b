"""Environment-map (IBL) sky: jax/numpy parity + pipeline integration."""

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.config import RenderConfig, SunLight


def _gradient_envmap(h=32, w=64):
    """Synthetic sky: blue up, warm horizon."""
    theta = np.linspace(0, np.pi, h, dtype=np.float32)[:, None]
    up = np.clip(np.cos(theta), 0, 1)
    env = np.zeros((h, w, 3), np.float32)
    env[..., 0] = 0.9 - 0.6 * up
    env[..., 1] = 0.6
    env[..., 2] = 0.3 + 0.6 * up
    return env


def test_envmap_lookup_parity():
    from nebulae_tpu.core.brdf import sky_envmap

    env = _gradient_envmap()
    rng = np.random.default_rng(0)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    a = sky_envmap(d, env, np)
    b = np.asarray(sky_envmap(jnp.asarray(d), jnp.asarray(env), jnp))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)
    # up-facing rays see blue-ish, down-facing warm-ish
    up = sky_envmap(np.array([[0.0, 1.0, 0.0]], np.float32), env, np)
    down = sky_envmap(np.array([[0.0, -1.0, 0.0]], np.float32), env, np)
    assert up[0, 2] > up[0, 0]
    assert down[0, 0] > down[0, 2]


def test_envmap_pipeline_allclose(cornell_scene, cornell_camera):
    """Cornell with an env-map sky: TPU pipeline == CPU oracle."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays
    from nebulae_tpu.ref.tracer import path_trace_np

    env = _gradient_envmap()
    cfg = RenderConfig(
        width=48, height=48, max_bounces=2, enable_svgf=False, enable_tonemap=False,
        enable_envmap=True,
    )
    scene_np = dict(cornell_scene.flat.device_arrays())
    scene_np["env_map"] = env
    sun = SunLight.default(np)
    ref = path_trace_np(scene_np, cornell_camera, cfg, sun, frame=0)

    scene_jx = {k: jnp.asarray(v) for k, v in scene_np.items()}
    sun_jx = jax.tree.map(jnp.asarray, sun)
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    out, _ = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg))(
        scene_jx, sun_jx, cam, init_frame_state(cfg)
    )
    np.testing.assert_allclose(np.asarray(out["hdr"]), ref, rtol=1e-3, atol=2e-4)


def test_envmap_gradients(cornell_scene, cornell_camera):
    """IBL is differentiable: gradients flow to the environment map."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    cfg = RenderConfig(
        width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False,
        enable_envmap=True,
    )
    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    scene["env_map"] = jnp.asarray(_gradient_envmap(16, 32))
    sun = jax.tree.map(jnp.asarray, SunLight.default(np))
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    def loss(env):
        s = dict(scene)
        s["env_map"] = env
        out, _ = render_frame(s, None, sun, cam, state, cfg)
        return out["hdr"].mean()

    g = np.asarray(jax.jit(jax.grad(loss))(scene["env_map"]))
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0.0


def test_helmet_ibl_material_gradients(helmet_scene):
    """BASELINE config ladder: DamagedHelmet primary + IBL with a
    material-gradient backward pass -- textured PBR mesh under an
    environment sky, gradients to base-color factors AND the env map."""
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.engine.renderer import Renderer, init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    fs = helmet_scene.flat
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    cam_obj = Camera(
        eye=center + np.array([0.6, 0.3, 2.0], np.float32) * float((hi - lo).max()),
        target=center,
    )
    cfg = RenderConfig(
        width=48, height=48, enable_gi=False, enable_svgf=False, enable_tonemap=False,
        enable_envmap=True,
    )
    r = Renderer(fs, cfg)
    r.scene["env_map"] = jnp.asarray(_gradient_envmap(16, 32))
    out = r.render(cam_obj)
    hdr = np.asarray(out["hdr"])
    assert np.isfinite(hdr).all() and np.asarray(out["hit"]).mean() > 0.1

    cam = make_camera_arrays(cam_obj, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    def loss(bc, env):
        s = dict(r.scene)
        s["mat_base_color"] = bc
        s["env_map"] = env
        o, _ = render_frame(s, r.bvh, r.sun, cam, state, cfg)
        return o["hdr"].mean()

    g_bc, g_env = jax.jit(jax.grad(loss, argnums=(0, 1)))(
        r.scene["mat_base_color"], r.scene["env_map"]
    )
    g_bc, g_env = np.asarray(g_bc), np.asarray(g_env)
    assert np.isfinite(g_bc).all() and np.abs(g_bc).max() > 1e-6
    assert np.isfinite(g_env).all() and np.abs(g_env).max() > 1e-6
