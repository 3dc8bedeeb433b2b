"""Distribution: sharded rendering + training over a virtual 8-device mesh.

Mirrors the production sharding design (pixels/rays over the "rays" axis,
scene + params replicated, gradient psum inserted by the SPMD partitioner)
on the forced-8-device CPU backend (conftest).
"""

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.config import RenderConfig, SunLight


def test_mesh_and_shardings():
    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_pixels

    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    s = shard_pixels(mesh, 3, axis=0)
    x = jax.device_put(jnp.zeros((64, 32, 3)), s)
    assert len(x.addressable_shards) == 8
    r = replicated(mesh)
    y = jax.device_put(jnp.zeros((4,)), r)
    assert len(y.addressable_shards) == 8


def test_sharded_render_matches_single_device(cornell_scene, cornell_camera):
    """The same frame rendered replicated vs row-sharded must be identical."""
    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
    from nebulae_tpu.engine.renderer import init_frame_state, render_frame
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    cfg = RenderConfig(width=64, height=64, max_bounces=2, enable_svgf=False, enable_tonemap=False)
    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    sun = jax.tree.map(jnp.asarray, SunLight.default(np))
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    f = jax.jit(lambda s, su, c, st: render_frame(s, None, su, c, st, cfg)[0]["hdr"])
    ref = np.asarray(f(scene, sun, cam, state))

    mesh = make_mesh(8)
    rep = replicated(mesh)
    fs = jax.jit(
        lambda s, su, c, st: render_frame(s, None, su, c, st, cfg)[0]["hdr"],
        in_shardings=(
            jax.tree.map(lambda _: rep, scene),
            jax.tree.map(lambda _: rep, sun),
            jax.tree.map(lambda _: rep, cam),
            shard_frame_state(mesh, state),
        ),
        out_shardings=shard_pixels(mesh, 3, axis=0),
    )
    state_sharded = jax.device_put(state, shard_frame_state(mesh, state))
    got = np.asarray(fs(scene, sun, cam, state_sharded))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-6)


def test_sharded_train_step_grads_match(cornell_scene, cornell_camera):
    """Parameter gradients from the sharded train step == single-device
    (the psum the partitioner inserts must be exact)."""
    import optax

    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
    from nebulae_tpu.engine.renderer import init_frame_state
    from nebulae_tpu.engine.train import make_train_step, split_scene_params
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    cfg = RenderConfig(width=32, height=32, max_bounces=2, enable_svgf=False, enable_tonemap=False)
    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    params, frozen = split_scene_params(scene)
    params["sun"] = jax.tree.map(jnp.asarray, SunLight.default(np))
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    from functools import partial

    from nebulae_tpu.engine.train import render_loss

    def grads_fn(params, state, target):
        return jax.value_and_grad(
            partial(render_loss, cfg=cfg, train_sun=True), has_aux=True
        )(params, frozen, None, cam, state, target)

    (loss1, _), g1 = jax.jit(grads_fn)(params, state, target)

    mesh = make_mesh(8)
    rep = replicated(mesh)
    in_sh = (
        jax.tree.map(lambda _: rep, params),
        shard_frame_state(mesh, state),
        shard_pixels(mesh, 3, axis=0),
    )
    jg = jax.jit(grads_fn, in_shardings=in_sh)
    (loss2, _), g2 = jg(
        params, jax.device_put(state, in_sh[1]), jax.device_put(target, in_sh[2])
    )
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-4)
    # Gradients agree up to float accumulation order across the psum.
    for k in ("mat_base_color", "mat_roughness", "mat_metallic"):
        a, b = np.asarray(g1[k]), np.asarray(g2[k])
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6)


def test_collective_volume_and_shard_balance(cornell_scene, cornell_camera):
    """Scaling falsifiability (BASELINE.md >=80% linear gate): account the
    bytes each compiled sharded step moves through collectives and assert
    shard balance.  Pins two measured facts (v5e-independent, CPU mesh):

      * sort_rays=False -- collective volume is bounded per-pixel (gradient
        all-reduces + a few per-image reductions), the precondition for
        linear scaling;
      * sort_rays=True -- the global bounce sorts ALL-GATHER the wavefront
        (lax.sort over the sharded rays axis), i.e. collective bytes scale
        with rays.  The accounting must DETECT this: it is the known
        scaling hazard of the single-chip compaction design, and the reason
        a pod run would shard-local-sort instead (docs/ARCHITECTURE.md).
    """
    from functools import partial

    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
    from nebulae_tpu.dist.stats import collective_stats, shard_balance
    from nebulae_tpu.engine.renderer import init_frame_state
    from nebulae_tpu.engine.train import render_loss, split_scene_params
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    mesh = make_mesh(8)
    rep = replicated(mesh)

    def compile_step(sort: bool, segments: int = 1):
        cfg = RenderConfig(
            width=32, height=32, max_bounces=2, enable_svgf=False,
            enable_tonemap=False, sort_rays=sort, sort_segments=segments,
        )
        params, frozen = split_scene_params(dict(scene))
        params["sun"] = jax.tree.map(jnp.asarray, SunLight.default(np))
        cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
        state = init_frame_state(cfg)
        target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

        def grads_fn(params, state, target):
            return jax.value_and_grad(
                partial(render_loss, cfg=cfg, train_sun=True), has_aux=True
            )(params, frozen, None, cam, state, target)

        in_sh = (
            jax.tree.map(lambda _: rep, params),
            shard_frame_state(mesh, state),
            shard_pixels(mesh, 3, axis=0),
        )
        args = (
            params,
            jax.device_put(state, in_sh[1]),
            jax.device_put(target, in_sh[2]),
        )
        compiled = jax.jit(grads_fn, in_shardings=in_sh).lower(*args).compile()
        return compiled, args[2]

    compiled, tgt = compile_step(sort=False)
    stats = collective_stats(compiled)
    assert stats.get("all-reduce", {"count": 0})["count"] > 0, (
        f"sharded grads must all-reduce: {stats}"
    )
    # Bounded volume: measured 74 KB at 32x32 (gradient all-reduces + a few
    # per-image reductions) = ~72 B/pixel; the per-bounce wavefront state is
    # >= 400 B/pixel, so anything >128 B/pixel means ray data started riding
    # collectives in the sortless step.
    n_pix = 32 * 32
    assert stats["total_bytes"] <= 128 * n_pix, stats

    # The detector must catch the global sort's wavefront all-gather...
    compiled_s, _ = compile_step(sort=True)
    stats_s = collective_stats(compiled_s)
    ag = stats_s.get("all-gather", {"bytes": 0})["bytes"]
    assert ag >= 10 * n_pix * 4, (
        f"global-sort wavefront all-gather not detected: {stats_s}"
    )

    # ...and SHARD-LOCAL sorting (sort_segments == mesh size, what
    # dist.runner configures) must eliminate it: segment-aligned sorts,
    # compaction gathers, and unsorts partition locally, so the sorted
    # step's collective volume returns to the sortless step's scale.
    compiled_seg, _ = compile_step(sort=True, segments=8)
    stats_seg = collective_stats(compiled_seg)
    assert stats_seg["total_bytes"] <= 128 * n_pix, (
        f"segment-local sort still rides collectives: {stats_seg}"
    )

    # Shard balance: equal rows per device == equal per-device ray counts.
    bal = shard_balance(tgt)
    assert bal["balanced"] and bal["shards"] == 8, bal


def test_nrc_train_step_collectives_bounded(cornell_scene, cornell_camera):
    """The NRC-ON sharded train step's collective profile (VERDICT r4 #5).

    The >=80% scaling gate depends on the NRC step, which adds the in-frame
    cache training (reduced-res pass + adam loop) and the full-res query
    pass.  Design contract pinned here:

      * the cache-training subgraph REPLICATES (camera/scene/frame inputs
        are replicated, so every device computes identical records and
        identical cache updates -- zero ICI traffic, redundant compute at
        the reference's bounded 16K-records/iteration scale);
      * material/sun gradient all-reduce is present (the psum over rays);
      * NO f32 all-gather exists: neither training records nor wavefront
        payload may ride collectives (the only expected all-gathers are
        small s32 gather-index replications, bounded by the compacted
        live-lane count);
      * total collective volume stays bounded per pixel.
    """
    from functools import partial

    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
    from nebulae_tpu.dist.stats import collective_stats
    from nebulae_tpu.engine.renderer import init_frame_state
    from nebulae_tpu.engine.train import render_loss, split_scene_params
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    scene = {k: jnp.asarray(v) for k, v in cornell_scene.flat.device_arrays().items()}
    mesh = make_mesh(8)
    rep = replicated(mesh)
    cfg = RenderConfig(
        width=32, height=32, max_bounces=2, enable_svgf=False,
        enable_tonemap=False, sort_rays=True, sort_segments=8,
        enable_nrc=True, nrc_max_path_vertices=3,
    )
    params, frozen = split_scene_params(dict(scene))
    params["sun"] = jax.tree.map(jnp.asarray, SunLight.default(np))
    cam = make_camera_arrays(cornell_camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)
    target = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)

    def grads_fn(params, state, target):
        return jax.value_and_grad(
            partial(render_loss, cfg=cfg, train_sun=True), has_aux=True
        )(params, frozen, None, cam, state, target)

    in_sh = (
        jax.tree.map(lambda _: rep, params),
        shard_frame_state(mesh, state),
        shard_pixels(mesh, 3, axis=0),
    )
    args = (
        params,
        jax.device_put(state, in_sh[1]),
        jax.device_put(target, in_sh[2]),
    )
    compiled = jax.jit(grads_fn, in_shardings=in_sh).lower(*args).compile()
    stats = collective_stats(compiled)
    n_pix = 32 * 32

    # (a) bounded volume: measured 74 KB (= 72 B/pixel) -- index metadata +
    # gradient all-reduces.  Anything >128 B/pixel means records or
    # wavefront payload started riding collectives.
    assert stats["total_bytes"] <= 128 * n_pix, stats

    # (b) the material/sun gradient psum must exist.
    assert stats.get("all-reduce", {"count": 0})["count"] > 0, stats

    # (c) NO f32 all-gather: training records and ray payload are f32; the
    # only tolerated all-gathers are small s32 index replications.
    import re

    for line in compiled.as_text().splitlines():
        s = line.lstrip()
        m = re.match(r"%?[\w.\-]+ = (\([^)]*\)|[^ ]+) all-gather\(", s)
        if m and re.search(r"\bf(?:32|16)\[", m.group(1)):
            raise AssertionError(f"f32 payload all-gather in NRC step: {s[:160]}")
