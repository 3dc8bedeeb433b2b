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
