"""End-to-end pipeline vs CPU oracle: pixels and gradients allclose.

This is BASELINE.json config[0] (Cornell 256^2 direct + shadows) plus the
path-traced variant -- the correctness gate for the whole TPU pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nebulae_tpu.config import RenderConfig, SunLight


@pytest.fixture(scope="module")
def setup(cornell_scene, cornell_camera):
    scene_np = cornell_scene.flat.device_arrays()
    scene_jx = {k: jnp.asarray(v) for k, v in scene_np.items()}
    sun = SunLight.default(np)
    sun_jx = jax.tree.map(jnp.asarray, sun)
    return scene_np, scene_jx, sun, sun_jx, cornell_camera


def _render_jax(scene_jx, sun_jx, camera, cfg, frame=0):
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)
    state["frame"] = jnp.uint32(frame)
    out, _ = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg))(
        scene_jx, sun_jx, cam, state
    )
    return out


def test_direct_allclose(setup):
    """Cornell direct lighting: pipeline == CPU oracle to float tolerance."""
    from nebulae_tpu.ref.tracer import render_direct_np

    scene_np, scene_jx, sun, sun_jx, camera = setup
    cfg = RenderConfig(width=128, height=128, enable_gi=False, enable_svgf=False, enable_tonemap=False)
    ref = render_direct_np(scene_np, camera, cfg, sun, frame=0)
    out = _render_jax(scene_jx, sun_jx, camera, cfg)
    got = np.asarray(out["hdr"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


def test_pathtrace_allclose(setup):
    """Cornell 3-bounce path trace, bit-matched RNG: pixels allclose."""
    from nebulae_tpu.ref.tracer import path_trace_np

    scene_np, scene_jx, sun, sun_jx, camera = setup
    cfg = RenderConfig(
        width=96, height=96, spp=2, max_bounces=3, enable_svgf=False, enable_tonemap=False
    )
    ref = path_trace_np(scene_np, camera, cfg, sun, frame=1)
    out = _render_jax(scene_jx, sun_jx, camera, cfg, frame=1)
    got = np.asarray(out["hdr"])
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-4)


def test_albedo_gradients_match_finite_difference(setup):
    """d loss / d base_color: jax.grad == central finite difference of the
    CPU oracle (possible because sampling is independent of albedo)."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays
    from nebulae_tpu.ref.tracer import path_trace_np

    scene_np, scene_jx, sun, sun_jx, camera = setup
    cfg = RenderConfig(
        width=48, height=48, spp=1, max_bounces=2, enable_svgf=False, enable_tonemap=False
    )
    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    def loss_fn(base_color):
        s = dict(scene_jx)
        s["mat_base_color"] = base_color
        out, _ = render_frame(s, None, sun_jx, cam, state, cfg)
        return out["hdr"].mean()

    g = np.asarray(jax.jit(jax.grad(loss_fn))(scene_jx["mat_base_color"]))

    eps = 1e-3
    for mat, ch in [(0, 0), (1, 0), (2, 1)]:
        for sign in (1,):
            bc_p = scene_np["mat_base_color"].copy()
            bc_m = scene_np["mat_base_color"].copy()
            bc_p[mat, ch] += eps
            bc_m[mat, ch] -= eps
            sp = dict(scene_np)
            sp["mat_base_color"] = bc_p
            sm = dict(scene_np)
            sm["mat_base_color"] = bc_m
            lp = path_trace_np(sp, camera, cfg, sun, frame=0).mean()
            lm = path_trace_np(sm, camera, cfg, sun, frame=0).mean()
            fd = (lp - lm) / (2 * eps)
            assert abs(g[mat, ch] - fd) < 2e-3 * max(1.0, abs(fd)), (
                f"grad mismatch mat={mat} ch={ch}: jax={g[mat, ch]} fd={fd}"
            )
    # Gradient must be nonzero somewhere (the scene is visible)
    assert np.abs(g).max() > 1e-4


def test_sun_gradients_exist(setup):
    """Gradients w.r.t. sun radiance and sky color flow and are sane."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene_np, scene_jx, sun, sun_jx, camera = setup
    cfg = RenderConfig(width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False)
    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    def loss_fn(sun_p):
        out, _ = render_frame(scene_jx, None, sun_p, cam, state, cfg)
        return out["hdr"].mean()

    g = jax.jit(jax.grad(loss_fn))(sun_jx)
    g_rad = np.asarray(g.radiance)
    g_sky = np.asarray(g.sky_color)
    assert np.isfinite(g_rad).all() and (g_rad > 0).all()  # more sun -> brighter
    assert np.isfinite(g_sky).all() and (g_sky > 0).all()


def test_svgf_differentiable_and_denoises(setup):
    """SVGF smooths noise and is differentiable end-to-end."""
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene_np, scene_jx, sun, sun_jx, camera = setup
    # 5-level a-trous: the BASELINE.json config ladder asks for one more
    # dilation level than the reference's 4 (SVGFDenoiser.h:199).
    cfg = RenderConfig(
        width=64, height=64, spp=1, max_bounces=3, enable_svgf=True,
        enable_tonemap=False, svgf_atrous_passes=5,
    )
    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)
    frame_fn = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg))

    out, state = frame_fn(scene_jx, sun_jx, cam, state)
    hit = np.asarray(out["hit"])
    noisy = np.asarray(out["hdr"])[hit]
    den = np.asarray(out["denoised"])[hit]
    assert den.std() < noisy.std()  # spatially smoother

    # Temporal accumulation across frames reduces variance further
    for _ in range(3):
        out2, state = frame_fn(scene_jx, sun_jx, cam, state)
    assert np.isfinite(np.asarray(out2["denoised"])).all()

    def loss_fn(base_color):
        s = dict(scene_jx)
        s["mat_base_color"] = base_color
        o, _ = render_frame(s, None, sun_jx, cam, init_frame_state(cfg), cfg)
        return o["denoised"].mean()

    g = np.asarray(jax.jit(jax.grad(loss_fn))(scene_jx["mat_base_color"]))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-5


def test_tonemap_matches_numpy():
    from nebulae_tpu.passes.tonemap import aces_tonemap, aces_tonemap_np

    rng = np.random.default_rng(0)
    hdr = (rng.uniform(size=(17, 9, 3)) * 4.0).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(aces_tonemap(jnp.asarray(hdr))), aces_tonemap_np(hdr), rtol=1e-5, atol=1e-6
    )
    # Monotone-ish and bounded
    out = aces_tonemap_np(hdr)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_bvh_pipeline_matches_bruteforce(setup):
    """Same frame through tracer='bvh' and 'bruteforce' must agree."""
    scene_np, scene_jx, sun, sun_jx, camera = setup
    from nebulae_tpu.bvh import build_bvh
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    bvh = {k: jnp.asarray(v) for k, v in build_bvh(scene_np["tri_pos"]).device_arrays().items()}
    cfg_bf = RenderConfig(width=64, height=64, max_bounces=2, enable_svgf=False, enable_tonemap=False, tracer="bruteforce")
    cfg_bvh = RenderConfig(width=64, height=64, max_bounces=2, enable_svgf=False, enable_tonemap=False, tracer="bvh")
    cam = make_camera_arrays(camera, 64, 64)
    out_bf, _ = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg_bf))(
        scene_jx, sun_jx, cam, init_frame_state(cfg_bf)
    )
    out_bvh, _ = jax.jit(lambda s, su, c, st: render_frame(s, bvh, su, c, st, cfg_bvh))(
        scene_jx, sun_jx, cam, init_frame_state(cfg_bvh)
    )
    np.testing.assert_allclose(
        np.asarray(out_bvh["hdr"]), np.asarray(out_bf["hdr"]), rtol=1e-4, atol=1e-5
    )

def test_lean_outputs(setup):
    """lean_outputs drops the debug targets but matches the full frame's ldr."""
    scene_np, scene_jx, sun, sun_jx, camera = setup
    mk = lambda lean: RenderConfig(
        width=32, height=32, max_bounces=2, enable_svgf=True, enable_tonemap=True,
        lean_outputs=lean,
    )
    full = _render_jax(scene_jx, sun_jx, camera, mk(False))
    lean = _render_jax(scene_jx, sun_jx, camera, mk(True))
    assert set(lean.keys()) == {"ldr", "nrc_loss", "nrc_query_frac"}
    np.testing.assert_allclose(np.asarray(lean["ldr"]), np.asarray(full["ldr"]), atol=1e-6)
