"""Ray tracing on XLA: brute-force and stackless BVH traversal.

The TPU-native replacement for DXR's `TraceRay`/`RayQuery`.  Two strategies:

  * **Brute force** -- every ray against every triangle as one big masked
    reduction.  For small scenes (Cornell box: 36 tris) this is *faster* than
    any tree because it is pure dense vector math with zero gathers, and it is
    trivially differentiable.
  * **Skip-link BVH traversal** -- each ray carries a single node index into
    the pre-order flattened tree (bvh.builder); per step it gathers one node,
    does a slab test, intersects up to MAX_LEAF triangles when at a leaf, and
    advances to `node + 1` or `skip[node]`.  All rays run in lockstep inside
    one `lax.while_loop`; the loop retires when every lane walked off the tree.
    No stack, no divergence beyond the shared trip count.

Both return the same hit record so the shading pipeline is tracer-agnostic.
A Pallas megakernel version of the BVH walk (kernels.pallas_trace) slots in
behind the same interface for peak throughput.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from nebulae_tpu.tracer.intersect import ray_aabb, ray_triangle, safe_inv_dir

MAX_LEAF = 4  # must match bvh.builder.MAX_LEAF


# ---------------------------------------------------------------------------
# Brute force
# ---------------------------------------------------------------------------


def _all_miss(n):
    return {
        "t": jnp.full(n, jnp.inf, jnp.float32),
        "tri": jnp.full(n, -1, jnp.int32),
        "u": jnp.zeros(n, jnp.float32),
        "v": jnp.zeros(n, jnp.float32),
    }


def bruteforce_closest_hit(o, d, tri_pos, t_max=jnp.inf):
    """o, d: [N, 3]; tri_pos: [T, 3, 3]. Returns dict(t, tri, u, v)."""
    if tri_pos.shape[0] == 0:
        return _all_miss(o.shape[0])
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    hit, t, u, v = ray_triangle(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None], t_max=t_max
    )  # [N, T]
    arg = jnp.argmin(t, axis=1)
    rows = jnp.arange(o.shape[0])
    tmin = t[rows, arg]
    found = jnp.isfinite(tmin)
    return {
        "t": tmin,
        "tri": jnp.where(found, arg.astype(jnp.int32), -1),
        "u": u[rows, arg],
        "v": v[rows, arg],
    }


def bruteforce_any_hit(o, d, tri_pos, t_max=jnp.inf):
    if tri_pos.shape[0] == 0:
        return jnp.zeros(o.shape[0], bool)
    v0 = tri_pos[:, 0]
    e1 = tri_pos[:, 1] - v0
    e2 = tri_pos[:, 2] - v0
    hit, _, _, _ = ray_triangle(
        o[:, None, :], d[:, None, :], v0[None], e1[None], e2[None], t_max=t_max
    )
    return hit.any(axis=1)


# ---------------------------------------------------------------------------
# Skip-link BVH traversal (lockstep while_loop)
# ---------------------------------------------------------------------------


def _gather_node(bvh, node):
    lo = bvh["node_lo"][node]
    hi = bvh["node_hi"][node]
    first = bvh["node_first"][node]
    count = bvh["node_count"][node]
    skip = bvh["node_skip"][node]
    return lo, hi, first, count, skip


def bvh_closest_hit(o, d, bvh, tri_pos, t_max=jnp.inf, max_leaf: int = MAX_LEAF):
    """Stackless closest-hit. o, d: [N, 3]. bvh: FlatBVH.device_arrays().

    Hit records are in the *original* triangle numbering (tri_index applied).
    """
    n = o.shape[0]
    if tri_pos.shape[0] == 0:
        return _all_miss(n)
    n_nodes = bvh["node_lo"].shape[0]
    inv_d = safe_inv_dir(d)
    v0_all = tri_pos[:, 0]
    e1_all = tri_pos[:, 1] - tri_pos[:, 0]
    e2_all = tri_pos[:, 2] - tri_pos[:, 0]
    tri_index = bvh["tri_index"]
    t_count = tri_index.shape[0]

    init = (
        jnp.zeros(n, jnp.int32),  # node cursor
        jnp.full(n, t_max, jnp.float32),  # best t
        jnp.full(n, -1, jnp.int32),  # best tri (original ids)
        jnp.zeros(n, jnp.float32),  # u
        jnp.zeros(n, jnp.float32),  # v
    )

    def cond(state):
        node = state[0]
        return jnp.any(node < n_nodes)

    def body(state):
        node, best_t, best_tri, best_u, best_v = state
        active = node < n_nodes
        nclamp = jnp.minimum(node, n_nodes - 1)
        lo, hi, first, count, skip = _gather_node(bvh, nclamp)
        box_hit = ray_aabb(o, inv_d, lo, hi, best_t) & active
        is_leaf = count > 0
        do_tris = box_hit & is_leaf

        # Masked leaf triangle tests (static unroll over max_leaf)
        for k in range(max_leaf):
            in_range = do_tris & (k < count)
            tid = tri_index[jnp.clip(first + k, 0, t_count - 1)]
            tid = jnp.where(in_range, tid, 0)
            h, t, u, v = ray_triangle(o, d, v0_all[tid], e1_all[tid], e2_all[tid], t_max=best_t)
            take = in_range & h & (t < best_t)
            best_t = jnp.where(take, t, best_t)
            best_tri = jnp.where(take, tid, best_tri)
            best_u = jnp.where(take, u, best_u)
            best_v = jnp.where(take, v, best_v)

        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, nclamp + 1, skip)
        node = jnp.where(active, nxt, node)
        return node, best_t, best_tri, best_u, best_v

    _, t, tri, u, v = jax.lax.while_loop(cond, body, init)
    found = tri >= 0
    return {"t": jnp.where(found, t, jnp.inf), "tri": tri, "u": u, "v": v}


def bvh_any_hit(o, d, bvh, tri_pos, t_max=jnp.inf, max_leaf: int = MAX_LEAF):
    """Stackless any-hit: lane retires (cursor -> N) on first hit."""
    n = o.shape[0]
    if tri_pos.shape[0] == 0:
        return jnp.zeros(n, bool)
    n_nodes = bvh["node_lo"].shape[0]
    inv_d = safe_inv_dir(d)
    v0_all = tri_pos[:, 0]
    e1_all = tri_pos[:, 1] - tri_pos[:, 0]
    e2_all = tri_pos[:, 2] - tri_pos[:, 0]
    tri_index = bvh["tri_index"]
    t_count = tri_index.shape[0]
    tmax_arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))

    init = (jnp.zeros(n, jnp.int32), jnp.zeros(n, bool))

    def cond(state):
        node, occluded = state
        return jnp.any(node < n_nodes)

    def body(state):
        node, occluded = state
        active = node < n_nodes
        nclamp = jnp.minimum(node, n_nodes - 1)
        lo, hi, first, count, skip = _gather_node(bvh, nclamp)
        box_hit = ray_aabb(o, inv_d, lo, hi, tmax_arr) & active
        is_leaf = count > 0
        do_tris = box_hit & is_leaf
        found = jnp.zeros(n, bool)
        for k in range(max_leaf):
            in_range = do_tris & (k < count)
            tid = tri_index[jnp.clip(first + k, 0, t_count - 1)]
            tid = jnp.where(in_range, tid, 0)
            h, t, _, _ = ray_triangle(o, d, v0_all[tid], e1_all[tid], e2_all[tid], t_max=tmax_arr)
            found = found | (in_range & h)
        occluded = occluded | found
        descend = box_hit & ~is_leaf
        nxt = jnp.where(descend, nclamp + 1, skip)
        nxt = jnp.where(occluded, n_nodes, nxt)  # retire occluded lanes
        node = jnp.where(active, nxt, node)
        return node, occluded

    _, occluded = jax.lax.while_loop(cond, body, init)
    return occluded


# ---------------------------------------------------------------------------
# Tracer factory: picks a strategy per scene, returns closures with a common
# signature (closest(o, d, t_max), any_hit(o, d, t_max)).
# ---------------------------------------------------------------------------


def _with_combo(closest, combo):
    """Expose a fused shadow+bounce traversal as `closest.combo` (functools
    partials reject attributes, so wrap in a plain function)."""

    def fn(o, d, t_max=jnp.inf):
        return closest(o, d, t_max=t_max)

    fn.combo = combo
    return fn


def make_tracer(scene: dict, bvh: dict | None, cfg):
    """Return (closest_fn, any_fn) choosing a strategy per scene/backend.

    auto: brute force for tiny scenes (dense vector math beats any tree),
    the Pallas packet kernel on TPU when packed tables are present, and the
    XLA skip-link walk otherwise.  ``scene``/``bvh`` are device-array dicts;
    closures capture them so jitted callers treat them as constants.
    """
    t_count = scene["tri_pos"].shape[0]
    has_packed = bvh is not None and (
        "chunks" in bvh
        or "tri_chunks" in bvh
        or (("nodes" in bvh or "fatnodes" in bvh or "fat4nodes" in bvh) and "tris" in bvh)
    )
    mode = cfg.tracer
    if mode == "auto":
        if bvh is None or t_count <= cfg.bruteforce_max_tris:
            mode = "bruteforce"
        elif has_packed and jax.default_backend() == "tpu":
            mode = "pallas"
        else:
            mode = "bvh"
    if mode == "bruteforce":
        closest = partial(bruteforce_closest_hit, tri_pos=scene["tri_pos"])
        any_hit = partial(bruteforce_any_hit, tri_pos=scene["tri_pos"])
    elif mode == "bvh":
        assert bvh is not None, "bvh arrays required for tracer='bvh'"
        closest = partial(bvh_closest_hit, bvh=bvh, tri_pos=scene["tri_pos"], max_leaf=cfg.bvh_max_leaf)
        any_hit = partial(bvh_any_hit, bvh=bvh, tri_pos=scene["tri_pos"], max_leaf=cfg.bvh_max_leaf)
    elif mode == "pallas":
        from nebulae_tpu.kernels.pallas_trace import (
            pallas_any_chunks,
            pallas_any_hit,
            pallas_any_hit_fat,
            pallas_any_hit_fat4,
            pallas_any_tri_chunks,
            pallas_closest_chunks,
            pallas_closest_hit,
            pallas_closest_hit_fat,
            pallas_closest_hit_fat4,
            pallas_closest_tri_chunks,
            pallas_shadow_closest_chunks,
            pallas_shadow_closest_fat,
            pallas_shadow_closest_fat4,
            pallas_shadow_closest_tri_chunks,
        )

        assert has_packed, "packed tables required for tracer='pallas'"
        interpret = jax.default_backend() != "tpu"
        if "tri_chunks" in bvh:  # Sponza-class: whole-tree nodes, tri chunks
            closest = partial(pallas_closest_tri_chunks, packed=bvh, interpret=interpret)
            any_hit = partial(pallas_any_tri_chunks, packed=bvh, interpret=interpret)

            def combo(o, b, l, t_max_b, t_max_l):
                return pallas_shadow_closest_tri_chunks(
                    o, b, l, bvh, t_max_b=t_max_b, t_max_l=t_max_l,
                    interpret=interpret,
                )

            closest = _with_combo(closest, combo)
        elif "chunks" in bvh:  # legacy: independent VMEM-sized subtree chunks
            closest = partial(pallas_closest_chunks, chunks=bvh["chunks"], interpret=interpret)
            any_hit = partial(pallas_any_chunks, chunks=bvh["chunks"], interpret=interpret)

            def combo(o, b, l, t_max_b, t_max_l):
                return pallas_shadow_closest_chunks(
                    o, b, l, bvh["chunks"], t_max_b=t_max_b, t_max_l=t_max_l,
                    interpret=interpret,
                )

            closest = _with_combo(closest, combo)
        elif "fat4nodes" in bvh:  # grandchildren-at-node layout (bvh_wide=4)
            packed = {"fat4nodes": bvh["fat4nodes"], "tris": bvh["tris"]}
            # Tables past the VMEM budget stream triangles from HBM with a
            # demand-paged cache -- and so does an EXPLICIT
            # chunk_mode="paged" at any size (the Renderer pads the tri
            # table for paging in that case; honoring the knob here keeps
            # the decision consistent instead of silently running resident
            # below the byte budget).  Sizes/config are static so this
            # resolves at trace time.
            from nebulae_tpu.kernels.pallas_trace import (
                PAGE_TILES,
                SINGLE_TABLE_MAX_BYTES,
            )

            paged = (
                4 * (packed["fat4nodes"].size + packed["tris"].size)
                > SINGLE_TABLE_MAX_BYTES
            ) or (
                cfg.chunk_mode == "paged"
                and packed["tris"].shape[0] % PAGE_TILES == 0
            )
            closest = partial(
                pallas_closest_hit_fat4, packed=packed, interpret=interpret, paged=paged
            )
            any_hit = partial(
                pallas_any_hit_fat4, packed=packed, interpret=interpret, paged=paged
            )

            def combo(o, b, l, t_max_b, t_max_l):
                return pallas_shadow_closest_fat4(
                    o, b, l, packed, t_max_b=t_max_b, t_max_l=t_max_l,
                    interpret=interpret, paged=paged,
                )

            closest = _with_combo(closest, combo)
        elif "fatnodes" in bvh:  # children-at-parent layout (default)
            packed = {"fatnodes": bvh["fatnodes"], "tris": bvh["tris"]}
            closest = partial(pallas_closest_hit_fat, packed=packed, interpret=interpret)
            any_hit = partial(pallas_any_hit_fat, packed=packed, interpret=interpret)

            def combo(o, b, l, t_max_b, t_max_l):
                return pallas_shadow_closest_fat(
                    o, b, l, packed, t_max_b=t_max_b, t_max_l=t_max_l, interpret=interpret
                )

            closest = _with_combo(closest, combo)
        else:
            packed = {"nodes": bvh["nodes"], "tris": bvh["tris"]}
            closest = partial(pallas_closest_hit, packed=packed, interpret=interpret)
            any_hit = partial(pallas_any_hit, packed=packed, interpret=interpret)
    else:
        raise ValueError(f"unknown tracer mode: {mode}")
    return closest, any_hit
