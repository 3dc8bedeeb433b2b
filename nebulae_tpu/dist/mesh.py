"""Device mesh + sharding helpers.

The reference is one process / one GPU (SURVEY.md section 2.8); distribution
is a new obligation.  Design (per the north star): rays/image tiles shard
across chips, the scene/BVH and lighting parameters are replicated, and
parameter gradients are all-reduced over ICI -- expressed declaratively with
`jax.sharding` so the XLA SPMD partitioner inserts the collectives (psum for
grads, halo exchanges for SVGF's dilated stencils) instead of hand-written
NCCL-style calls.

Mesh axes:
  "rays"  -- data parallelism over pixels/rays (the H dimension of images and
             the flat N dimension of ray buffers).  Multi-host pods extend
             this axis across hosts; ICI carries the collectives.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis_name: str = "rays") -> Mesh:
    """1-D mesh over the first n (default: all) devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis_name,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_pixels(mesh: Mesh, ndim: int, axis: int = 0, axis_name: str = "rays") -> NamedSharding:
    """Shard dimension `axis` of an ndim-array over the ray axis."""
    spec = [None] * ndim
    spec[axis] = axis_name
    return NamedSharding(mesh, P(*spec))


def shard_frame_state(mesh: Mesh, state: dict) -> dict:
    """Sharding pytree for the frame state: image-space history (rows
    divisible by the mesh) shards over rows; small matrices (camera
    view-proj), vectors, scalars, and NRC parameters replicate."""
    n = mesh.devices.size

    def spec_for(leaf):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and leaf.shape[0] % n == 0 and leaf.shape[0] >= n:
            return shard_pixels(mesh, leaf.ndim, axis=0)
        return replicated(mesh)

    out = {}
    for k, v in state.items():
        if k == "nrc":
            # Cache MLP params/opt state replicate (their gradients all-reduce
            # over ICI); an MLP weight matrix row count happening to divide
            # the mesh must not row-shard it.
            out[k] = jax.tree.map(lambda _: replicated(mesh), v)
        else:
            out[k] = jax.tree.map(spec_for, v)
    return out


def initialize_distributed(coordinator: str | None = None, num_processes: int | None = None, process_id: int | None = None):
    """Multi-host init (jax.distributed) -- call once per host before device
    use on a pod slice.  No-op when single-process."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator, num_processes=num_processes, process_id=process_id
    )
