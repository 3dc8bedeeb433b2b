"""Worker process for the multi-process (multi-host simulation) test.

Each process owns 4 virtual CPU devices (SURVEY.md section 4: JAX CPU backend
+ --xla_force_host_platform_device_count + jax.distributed, simulating a
2-host x 4-chip slice).  The worker joins the cluster, builds the global
8-device "rays" mesh, and runs one NRC-enabled train step with pixels
sharded across BOTH processes -- the cache-MLP / material / sun gradient
all-reduce crosses the process boundary (the DCN/ICI path of a real pod).

Usage: python tests/_mp_worker.py <process_id> <num_processes> <coord_port>
"""

from __future__ import annotations

import os
import sys


def main() -> int:
    pid, nprocs, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
    )
    # Cross-process CPU collectives (jax>=0.5 ships gloo).
    os.environ.setdefault("JAX_CPU_COLLECTIVES_IMPLEMENTATION", "gloo")

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}", num_processes=nprocs, process_id=pid
    )
    assert len(jax.devices()) == 4 * nprocs, jax.devices()
    assert len(jax.local_devices()) == 4

    import numpy as np
    import jax.numpy as jnp

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from nebulae_tpu.config import RenderConfig, SunLight
    from nebulae_tpu.core.camera import Camera
    from nebulae_tpu.core.scene import load_scene
    from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
    from nebulae_tpu.engine.renderer import init_frame_state
    from nebulae_tpu.engine.train import make_train_step, split_scene_params
    from nebulae_tpu.passes.gbuffer import make_camera_arrays

    n_dev = 4 * nprocs
    cfg = RenderConfig(
        width=32, height=4 * n_dev, spp=1, max_bounces=2,
        enable_svgf=True, enable_nrc=True, enable_tonemap=True,
        nrc_max_path_vertices=4,
    )
    scene_h = load_scene("/root/reference/assets/cornell_box/cornell_box.gltf")
    fs = scene_h.flat
    lo, hi = fs.aabb_min, fs.aabb_max
    center = (lo + hi) * 0.5
    camera = Camera(
        eye=center + np.array([0, 0, 2.6 * float((hi - lo).max())], np.float32), target=center
    )
    cam = make_camera_arrays(camera, cfg.width, cfg.height)
    state = init_frame_state(cfg)

    mesh = make_mesh(n_dev)
    rep = replicated(mesh)

    def put(tree, shardings):
        return jax.tree.map(lambda x, s: jax.device_put(np.asarray(x), s), tree, shardings)

    scene = {k: v for k, v in fs.device_arrays().items()}
    params, frozen = split_scene_params(scene)
    params["sun"] = jax.tree.map(np.asarray, SunLight.default(np))
    # Frozen scene tables replicate across processes (device_put with a
    # global replicated sharding).
    frozen_dev = put(frozen, jax.tree.map(lambda _: rep, frozen))
    step, optimizer = make_train_step(cfg, frozen_dev, None)
    opt_state = optimizer.init(jax.tree.map(jnp.asarray, params))

    state_sh = shard_frame_state(mesh, state)
    tgt_sh = shard_pixels(mesh, 3, axis=0)
    params_sh = jax.tree.map(lambda _: rep, params)
    opt_sh = jax.tree.map(lambda _: rep, opt_state)
    cam_sh = jax.tree.map(lambda _: rep, cam)

    params_g = put(params, params_sh)
    opt_g = put(opt_state, opt_sh)
    cam_g = put(cam, cam_sh)
    state_g = put(state, state_sh)
    target_g = jax.device_put(np.zeros((cfg.height, cfg.width, 3), np.float32), tgt_sh)

    jstep = jax.jit(
        step,
        in_shardings=(params_sh, opt_sh, cam_sh, state_sh, tgt_sh),
        out_shardings=(params_sh, opt_sh, state_sh, rep, tgt_sh),
    )
    params2, opt2, state2, loss, img = jstep(params_g, opt_g, cam_g, state_g, target_g)
    jax.block_until_ready((params2, loss))
    # Outputs are replicated global arrays: every process reads its local
    # shard.  The SPMD program all-reduced the gradients across BOTH
    # processes, so identical replicas are only possible if the collective
    # actually crossed the process boundary.
    loss_v = float(np.asarray(loss.addressable_data(0)))
    assert np.isfinite(loss_v), loss_v
    bc = np.asarray(params2["mat_base_color"].addressable_data(0))
    assert np.isfinite(bc).all()
    nrc_w = state2["nrc"]["params"]
    leaf = np.asarray(jax.tree.leaves(nrc_w)[0].addressable_data(0))
    assert np.isfinite(leaf).all()
    # Cross-process agreement on the scalar loss via the distributed KV store
    # (no array collectives involved in the check itself).
    from jax._src.distributed import global_state as _gs

    client = _gs.client
    client.key_value_set(f"loss_{pid}", f"{loss_v:.9e}")
    client.wait_at_barrier("after_step", timeout_in_ms=60_000)
    other = float(client.key_value_try_get(f"loss_{1 - pid}"))
    assert abs(other - loss_v) <= 1e-6 * max(1.0, abs(loss_v)), (other, loss_v)
    print(f"MP_OK pid={pid} loss={loss_v:.6f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
