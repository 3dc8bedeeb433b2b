"""BVH refit: update node AABBs bottom-up for moved geometry.

TPU-native analogue of the reference's TLAS update path
(/root/reference/src/nri/raytracing/RTAccelerationStructureBuilder.cpp:99-131:
ALLOW_UPDATE + PERFORM_UPDATE refit, static topology).  Topology (tree
structure, skip links, triangle permutation) is immutable; only bounds move.

Device-side and jittable: leaves recompute from the (possibly animated)
world triangles, then inner nodes update level-by-level from the deepest
level up -- `levels` is a static host-side grouping of node indices by depth
(compute_levels), so the whole refit is ~tree-depth vectorized gather/scatter
rounds instead of a sequential walk.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from nebulae_tpu.bvh.builder import FlatBVH
from nebulae_tpu.kernels.pallas_trace import TRI_STRIDE


def compute_levels(bvh: FlatBVH) -> list[np.ndarray]:
    """Host-side: node indices grouped by depth (root = level 0)."""
    n = bvh.num_nodes
    depth = np.zeros(n, np.int32)
    # Pre-order guarantees parents precede children.
    for i in range(n):
        if bvh.node_count[i] == 0:  # inner
            left, right = bvh.node_first[i], bvh.node_right[i]
            depth[left] = depth[i] + 1
            depth[right] = depth[i] + 1
    levels = []
    for d in range(int(depth.max(initial=0)) + 1):
        levels.append(np.nonzero(depth == d)[0].astype(np.int32))
    return levels


def refit_bvh(bvh_dev: dict, tri_pos, levels: list[np.ndarray], max_leaf: int = 4):
    """Recompute node_lo/node_hi for new world triangles [T, 3, 3].

    bvh_dev: FlatBVH.device_arrays() (jnp). Returns (node_lo, node_hi)."""
    node_first = bvh_dev["node_first"]
    node_count = bvh_dev["node_count"]
    node_right = bvh_dev["node_right"]
    tri_index = bvh_dev["tri_index"]
    n = node_first.shape[0]
    t = tri_pos.shape[0]

    tlo = tri_pos.min(axis=1)
    thi = tri_pos.max(axis=1)

    # Leaf bounds: up to max_leaf triangles per leaf, masked union.
    is_leaf = node_count > 0
    lo = jnp.full((n, 3), jnp.inf, jnp.float32)
    hi = jnp.full((n, 3), -jnp.inf, jnp.float32)
    for k in range(max_leaf):
        valid = is_leaf & (k < node_count)
        tid = tri_index[jnp.clip(node_first + k, 0, max(t - 1, 0))]
        lo = jnp.where(valid[:, None], jnp.minimum(lo, tlo[tid]), lo)
        hi = jnp.where(valid[:, None], jnp.maximum(hi, thi[tid]), hi)

    # Inner bounds, deepest level first (children are already final).
    for level in reversed(levels):
        idx = jnp.asarray(level)
        inner = node_count[idx] == 0
        left = jnp.clip(node_first[idx], 0, n - 1)
        right = jnp.clip(node_right[idx], 0, n - 1)
        new_lo = jnp.minimum(lo[left], lo[right])
        new_hi = jnp.maximum(hi[left], hi[right])
        lo = lo.at[idx].set(jnp.where(inner[:, None], new_lo, lo[idx]))
        hi = hi.at[idx].set(jnp.where(inner[:, None], new_hi, hi[idx]))
    return lo, hi


def repack_pallas_fat_bounds(fatnodes, node_lo, node_hi, inner_idx, node_right):
    """Write refitted bounds into a fat-node table [Nb, 16, 128]
    (kernels.pallas_trace.pack_bvh_fat layout): each inner node's row holds
    BOTH children's AABBs.  `inner_idx` / `node_right` are the host-static
    FlatBVH arrays (fat lane i = i-th inner node in pre-order)."""
    inner_idx = np.asarray(inner_idx)
    node_right = np.asarray(node_right)
    nb, rows, lanes = fatnodes.shape
    ni = inner_idx.shape[0]
    left = inner_idx + 1
    right = node_right[inner_idx]
    flat = jnp.transpose(fatnodes, (0, 2, 1)).reshape(nb * lanes, rows)
    bounds = jnp.concatenate(
        [node_lo[left], node_hi[left], node_lo[right], node_hi[right]], axis=1
    )
    pad = nb * lanes - ni
    if pad:
        bounds = jnp.concatenate([bounds, jnp.zeros((pad, 12), jnp.float32)])
    flat = flat.at[:, 0:12].set(bounds)
    return jnp.transpose(flat.reshape(nb, lanes, rows), (0, 2, 1))


def repack_pallas_fat4_bounds(fat4nodes, node_lo, node_hi, fat4_slots):
    """Write refitted bounds into a fat4 table [Nb, 32, 128]
    (kernels.pallas_trace.pack_bvh_fat4 layout): each row holds four
    grandchild slots' AABBs at rows [6k, 6k+6).  `fat4_slots` is the
    host-static [Nb*128, 4] slot->node-id map returned by the packer
    (-1 = empty slot, kept as a +/-0 never-hit box)."""
    slots = np.asarray(fat4_slots)
    nb, rows, lanes = fat4nodes.shape
    flat = jnp.transpose(fat4nodes, (0, 2, 1)).reshape(nb * lanes, rows)
    n = node_lo.shape[0]
    parts = []
    for k in range(4):
        sid = slots[:, k]
        valid = (sid >= 0)[:, None]
        sid_c = np.clip(sid, 0, max(n - 1, 0))
        lo = jnp.where(valid, node_lo[sid_c], 0.0)
        hi = jnp.where(valid, node_hi[sid_c], 0.0)
        parts.append(lo)
        parts.append(hi)
    bounds = jnp.concatenate(parts, axis=1)  # [Nb*128, 24]
    flat = flat.at[:, 0:24].set(bounds)
    return jnp.transpose(flat.reshape(nb, lanes, rows), (0, 2, 1))


def repack_pallas_tris(tris, tri_pos, slot_tri: np.ndarray):
    """Rewrite the grouped triangle table's vertex data (v0/e1/e2 rows) for
    moved geometry; the tid row and slot layout are topology, unchanged.

    tris [tb, TRI_STRIDE*G, 128] (kernels.pallas_trace._grouped_tris layout);
    tri_pos [T, 3, 3] jnp; slot_tri [tb*128, G] host-static id map
    (kernels.pallas_trace.grouped_tri_ids)."""
    slot_tri = np.asarray(slot_tri)
    tb, rows_g, lanes = tris.shape
    g_count = rows_g // TRI_STRIDE
    t = tri_pos.shape[0]
    flat = jnp.transpose(tris, (0, 2, 1)).reshape(tb * lanes, rows_g)
    for g in range(g_count):
        sid = slot_tri[:, g]
        valid = (sid >= 0)[:, None]
        tp = tri_pos[np.clip(sid, 0, max(t - 1, 0))]
        r0 = TRI_STRIDE * g
        flat = flat.at[:, r0 + 0 : r0 + 3].set(jnp.where(valid, tp[:, 0], 0.0))
        flat = flat.at[:, r0 + 3 : r0 + 6].set(jnp.where(valid, tp[:, 1] - tp[:, 0], 0.0))
        flat = flat.at[:, r0 + 6 : r0 + 9].set(jnp.where(valid, tp[:, 2] - tp[:, 0], 0.0))
    return jnp.transpose(flat.reshape(tb, lanes, rows_g), (0, 2, 1))


def repack_pallas_bounds(packed_nodes, node_lo, node_hi):
    """Write refitted bounds into the lane-packed Pallas node table
    [Nb, 8, 128] (kernels.pallas_trace layout), keeping metadata rows."""
    nb = packed_nodes.shape[0]
    lanes = packed_nodes.shape[2]
    n = node_lo.shape[0]
    flat = jnp.transpose(packed_nodes, (0, 2, 1)).reshape(nb * lanes, 8)
    pad = nb * lanes - n
    bounds = jnp.concatenate([node_lo, node_hi], axis=1)
    if pad:
        bounds = jnp.concatenate([bounds, jnp.zeros((pad, 6), jnp.float32)])
    flat = flat.at[:, 0:6].set(bounds)
    return jnp.transpose(flat.reshape(nb, lanes, 8), (0, 2, 1))
