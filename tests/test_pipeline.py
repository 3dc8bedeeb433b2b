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

    def hf_noise(img):
        # High-frequency residual (pixel minus 3x3 box blur): isolates the
        # Monte-Carlo noise from the signal variance across walls/edges.
        import scipy.ndimage as ndi

        blur = ndi.uniform_filter(img, size=(3, 3, 1))
        return (img - blur)[hit].std()

    # Edges legitimately survive the edge-stopping filter, so the HF energy
    # does not drop to zero; a no-op filter (the reference's 8-bit phi_color
    # against HDR luminance, see config.svgf_phi_color) sits at ~0.9998x.
    assert hf_noise(np.asarray(out["denoised"])) < 0.8 * hf_noise(np.asarray(out["hdr"]))

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

def test_jittered_spp_allclose(setup):
    """spp decorrelation: with jitter_primary each sample traces its own
    sub-pixel primary ray (2 extra draws/sample, pathtracer.hlsl:414-420's
    jitter made per-sample); pixels still match the CPU oracle exactly, and
    jittered samples actually differ from the unjittered frame."""
    from nebulae_tpu.ref.tracer import path_trace_np

    scene_np, scene_jx, sun, sun_jx, camera = setup
    cfg = RenderConfig(
        width=64, height=64, spp=2, max_bounces=2, enable_svgf=False,
        enable_tonemap=False, jitter_primary=True,
    )
    ref = path_trace_np(scene_np, camera, cfg, sun, frame=5)
    out = _render_jax(scene_jx, sun_jx, camera, cfg, frame=5)
    np.testing.assert_allclose(np.asarray(out["hdr"]), ref, rtol=1e-3, atol=2e-4)

    from dataclasses import replace

    ref_nj = path_trace_np(scene_np, camera, replace(cfg, jitter_primary=False), sun, frame=5)
    assert np.abs(ref - ref_nj).max() > 1e-3  # jitter actually changes samples


def test_metallic_rr_allclose(setup):
    """Lobe-selection Russian roulette on a metallic scene: pixels AND
    gradients allclose vs the CPU oracle (pathtracer.hlsl:474-479, 596-620).

    Metallic materials drive the diffuse probability toward its 0.1 clamp
    (brdf.hlsli:130-146), so the RR draw/division/absorption dominate the
    indirect energy here -- this test fails if any of the three is missing
    or the RNG draw order diverges between the tracers."""
    from nebulae_tpu.ref.tracer import path_trace_np
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene_np, scene_jx, sun, sun_jx, camera = setup
    metal = np.full_like(scene_np["mat_metallic"], 0.85)
    rough = np.full_like(scene_np["mat_roughness"], 0.35)
    s_np = dict(scene_np, mat_metallic=metal, mat_roughness=rough)
    s_jx = dict(scene_jx, mat_metallic=jnp.asarray(metal), mat_roughness=jnp.asarray(rough))

    cfg = RenderConfig(
        width=64, height=64, spp=2, max_bounces=4, enable_svgf=False, enable_tonemap=False
    )
    ref = path_trace_np(s_np, camera, cfg, sun, frame=3)
    out = _render_jax(s_jx, sun_jx, camera, cfg, frame=3)
    np.testing.assert_allclose(np.asarray(out["hdr"]), ref, rtol=1e-3, atol=2e-4)

    # Gradient parity: d mean(hdr) / d base_color against a central finite
    # difference of the oracle.  p_d depends on albedo, so FD can cross an RR
    # threshold for isolated lanes; eps is small enough that frame 3 has no
    # flips (deterministic), and the tolerance covers the smooth part.
    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    def loss_fn(base_color):
        s = dict(s_jx)
        s["mat_base_color"] = base_color
        o, _ = render_frame(s, None, sun_jx, cam, state, cfg)
        return o["hdr"].mean()

    g = np.asarray(jax.jit(jax.grad(loss_fn))(s_jx["mat_base_color"]))
    eps = 5e-4
    for mat, ch in [(0, 0), (1, 1)]:
        bc_p = s_np["mat_base_color"].copy()
        bc_m = s_np["mat_base_color"].copy()
        bc_p[mat, ch] += eps
        bc_m[mat, ch] -= eps
        lp = path_trace_np(dict(s_np, mat_base_color=bc_p), camera, cfg, sun, frame=3).mean()
        lm = path_trace_np(dict(s_np, mat_base_color=bc_m), camera, cfg, sun, frame=3).mean()
        fd = (lp - lm) / (2 * eps)
        assert abs(g[mat, ch] - fd) < 5e-3 * max(1.0, abs(fd)), (
            f"grad mismatch mat={mat} ch={ch}: jax={g[mat, ch]} fd={fd}"
        )
    assert np.abs(g).max() > 1e-4


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
