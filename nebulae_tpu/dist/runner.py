"""Distributed render/train loop: the multi-host production entry.

The reference is one process / one GPU (SURVEY.md section 2.8); the pod-scale
design comes from the north star: rays/image rows shard over a 1-D "rays"
mesh spanning every chip of every host, the scene/BVH/sun replicate, the
SVGF history shards with the image rows it mirrors, and NRC/material/sun
gradients all-reduce over ICI (the SPMD partitioner inserts the psums).
Hosts coordinate over DCN only for bring-up (jax.distributed), the host-0
image gather at present time, and checkpoints.

`DistRenderer` is the engine.Renderer with explicit shardings on the jitted
frame; `present_gather` pulls the row-sharded LDR image to every host (DCN
all-gather) so process 0 can write it.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.dist.mesh import make_mesh, replicated, shard_frame_state, shard_pixels
from nebulae_tpu.engine.renderer import Renderer, render_frame


class DistRenderer(Renderer):
    """Renderer whose jitted frame runs SPMD over a device mesh.

    Scene/BVH/sun/camera replicate; the frame state (SVGF history, NRC cache)
    shards per dist.mesh.shard_frame_state; outputs inherit partitioner
    placements (the LDR image comes out row-sharded).  Works single-process
    (8 local devices) and multi-process (jax.distributed) identically -- the
    mesh just spans more hosts.
    """

    def __init__(self, flat_scene, cfg, sun=None, bvh=None, mesh=None):
        self.mesh = mesh if mesh is not None else make_mesh()
        n = int(self.mesh.devices.size)
        if cfg.height % n:
            raise ValueError(
                f"height {cfg.height} must divide the {n}-device mesh "
                "(row-sharded image)"
            )
        if cfg.sort_rays and cfg.sort_segments == 1:
            # Shard-local sorting/compaction: align ray-sort segments with
            # the mesh so the per-bounce sorts, compaction gathers, and
            # unsorts partition locally instead of all-gathering the
            # wavefront (tracer.sorting._sorted_shadow_closest_seg).
            from dataclasses import replace

            cfg = replace(cfg, sort_segments=n)
        super().__init__(flat_scene, cfg, sun=sun, bvh=bvh)
        # Commit the big replicated operands once (scene tables + BVH); the
        # per-frame jit then reuses the placement instead of re-transferring.
        rep = replicated(self.mesh)
        self.scene = {k: jax.device_put(v, rep) for k, v in self.scene.items()}
        if self.bvh is not None:
            self.bvh = jax.tree.map(lambda x: jax.device_put(x, rep), self.bvh)
        self.sun = jax.tree.map(lambda x: jax.device_put(jnp.asarray(x), rep), self.sun)
        self.state = jax.tree.map(
            lambda x, s: jax.device_put(x, s),
            self.state,
            shard_frame_state(self.mesh, self.state),
        )

    def _make_jit(self, cfg):
        mesh = getattr(self, "mesh", None)
        if mesh is None:  # super().__init__ runs before mesh exists on resize paths
            return jax.jit(partial(render_frame, cfg=cfg))
        rep = replicated(mesh)

        def rep_tree(tree):
            return jax.tree.map(lambda _: rep, tree)

        from nebulae_tpu.engine.renderer import init_frame_state

        state_proto = init_frame_state(cfg)
        state_sh = shard_frame_state(mesh, state_proto)
        return jax.jit(
            partial(render_frame, cfg=cfg),
            in_shardings=(
                rep_tree(self.scene),
                rep_tree(self.bvh),
                rep_tree(self.sun),
                None,  # camera dict: replicated small arrays, let jit place
                state_sh,
            ),
        )

    def render(self, camera, sun=None):
        # Camera arrays must be *global* (replicated) in multi-process runs;
        # device_put with a replicated NamedSharding builds the global array
        # from identical host-local values (every process computes the same
        # camera).
        from nebulae_tpu.passes.gbuffer import make_camera_arrays

        fingerprint = (
            tuple(np.asarray(camera.eye, np.float32).tolist())
            + tuple(np.asarray(camera.target, np.float32).tolist())
            + (float(camera.fov_y_deg),)
        )
        moved = getattr(self, "_last_cam", None) is not None and fingerprint != self._last_cam
        if moved and not self.cfg.svgf_reproject:
            self.reset_history()
        self._last_cam = fingerprint
        rep = replicated(self.mesh)
        cam = jax.tree.map(
            lambda x: jax.device_put(jnp.asarray(x), rep),
            make_camera_arrays(camera, self.cfg.width, self.cfg.height),
        )
        outputs, self.state = self._frame_jit()(
            self.scene, self.bvh, sun if sun is not None else self.sun, cam, self.state
        )
        self._frames_rendered = getattr(self, "_frames_rendered", 0) + 1
        return outputs


def present_gather(image) -> np.ndarray:
    """Host-0 image gather over DCN: a row-sharded global [H, W, 3] array ->
    full numpy image on every host (process 0 writes it).  Single-process
    arrays pass straight through."""
    if jax.process_count() == 1:
        return np.asarray(image)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(image, tiled=True))


def gather_state(state) -> dict:
    """Pull a (possibly sharded) frame-state pytree to host memory on every
    process -- the checkpoint-coordination path: process 0 then serializes
    one consistent global snapshot (utils.checkpoint), instead of per-host
    shard files that would tie the checkpoint to the mesh shape."""

    def to_host(x):
        if not hasattr(x, "is_fully_addressable") or x.is_fully_addressable:
            return np.asarray(x)
        if x.is_fully_replicated:
            return np.asarray(x.addressable_data(0))
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))

    return jax.tree.map(to_host, state)
