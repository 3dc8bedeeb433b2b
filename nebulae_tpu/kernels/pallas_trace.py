"""Pallas packet BVH traversal -- the TPU-native `TraceRay`.

Why packets: TPU has no per-lane gather hardware; XLA lowers gathers to
~10 GB/s element streams, so per-ray pointer chasing is hopeless (measured
0.03 Mrays/s at the XLA level).  Instead each 8x128 ray tile traverses the
tree *together* (classic SIMD packet tracing): one shared traversal stack in
SMEM, each node fetched once per tile by scalar index and tested against all
1024 rays with dense VPU ops.  Zero per-lane gathers anywhere.  Coherent
tiles (primary, shadow) visit barely more nodes than a single ray;
incoherent bounce tiles degrade to the union of visits and are re-sorted
upstream by the wavefront engine.

Scalar/vector discipline (the performance-critical part): per node visit
there are exactly TWO vector->scalar syncs -- the `any(box_hit)` reduce and
one metadata extract.  Node bounds never leave vector-land: the node row is
pulled from its lane by a one-hot MXU matvec and broadcast to the ray tile
as [1, 1] slices.  Control metadata (child/leaf info) is packed into a
single exact-small-integer f32 (MXU matvec would flush bitcast-int
denormals, so no bitcasting).

Memory layout (built host-side by `pack_bvh_for_pallas`):
  nodes [Nb, 8, 128] f32 -- node i at block i>>7, lane i&127:
        rows 0-2 lo.xyz, 3-5 hi.xyz,
        row 6: enc = first_or_right * 32 + field  (exact below 2^24)
        row 7: unused.
        field 1..15: leaf, field = triangle count, first_or_right = first
        triangle in permuted order.  field 16..21: inner,
        field = 16 + split_axis*2 + left_is_lower, first_or_right = right
        child (left child is i+1, pre-order).  field 0: table padding.
        The axis/lower bits drive *near-child-first* ordered traversal: all
        rays in a tile share direction signs (octant-sorted upstream), so one
        scalar compare per node picks the child order that tightens the
        closest-hit t cap earliest.
  tris  [Tb, TRI_STRIDE*G, 128] f32 -- triangle slot j at block j>>7,
        lane j&127: per group member rows 0-2 v0, 3-5 e1, 6-8 e2,
        9 original-id (f32) at offset TRI_STRIDE*g.

Rays are SoA [T*8, 128] f32 per component; grid = ray tiles (sequential on
the single TensorCore; lanes are the parallelism).

Reference analogue: DXR TraceRay / RayQuery (pathtracer.hlsl:497,
deferred_pbr.hlsl:100-110) over the driver-built BLAS
(RTAccelerationStructureBuilder.cpp:72-97).
"""

from __future__ import annotations

from functools import lru_cache as _lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os as _os0

# Sublane rows per packet (packet = SUB*LANES rays sharing one traversal
# stack).  8 = one vreg per component.  Env override for microbench sweeps.
SUB = int(_os0.environ.get("NEB_SUB", "8"))
LANES = 128
TILE = SUB * LANES  # rays per packet
# Rows per triangle in the grouped tri tables: 10 used (v0/e1/e2/id).  The
# old stride of 16 carried 6 dead rows per triangle straight through the
# kernel's cross-lane row fetch -- the single most expensive per-leaf op --
# and through HBM; 10 shrinks both by 37.5%% at G=8 (rows stay a sublane
# multiple: 10G %% 8 == 0 for the G=8 default and G=4).
TRI_STRIDE = 10
STACK_DEPTH = 128  # max tree depth + 1 (SAH trees of <=4M tris stay under)
EPS = 1e-7
META_SHIFT = 5  # enc = first_or_right * 32 + field (field in [0, 21])
DEAD_RAY_ORIGIN = 1.0e13  # |origin| beyond this = ejected/padded lane
MAX_LEAF_FIELD = 15  # field 1..15 = leaf count; INNER_FIELD+ = inner
INNER_FIELD = 16  # inner field = 16 + axis*2 + left_is_lower


# ---------------------------------------------------------------------------
# Host-side packing
# ---------------------------------------------------------------------------


def _grouped_tris(bvh, tri_pos: np.ndarray, tri_group: int):
    """Group each leaf's triangle range into ceil(c/G) slots of G triangles.

    Slot g of a leaf holds its (slot*G + g)-th triangle; short tails repeat
    the leaf's last triangle (a duplicate hit is harmless for closest and
    any-hit and keeps the kernel branch-free).  Returns
    (tris [tb, 16*G, 128], slot_first [n], slot_count [n]) with slot_first/
    slot_count per NODE (0 for inner nodes); G=1 reproduces the ungrouped
    layout exactly.
    """
    G = int(tri_group)
    n = bvh.node_lo.shape[0]
    counts = np.asarray(bvh.node_count, np.int64)
    leaf_nodes = np.nonzero(counts > 0)[0]
    c = counts[leaf_nodes]
    sc = (c + G - 1) // G
    sf = np.zeros_like(sc)
    if sc.size:
        sf[1:] = np.cumsum(sc)[:-1]
    ns = int(sc.sum())
    slot_first = np.zeros(n, np.int64)
    slot_count = np.zeros(n, np.int64)
    slot_first[leaf_nodes] = sf
    slot_count[leaf_nodes] = sc
    assert slot_count.max(initial=0) <= MAX_LEAF_FIELD, (
        "leaf slots exceed meta bits: raise bvh_tri_group or lower max_leaf"
    )

    tb = max((ns + LANES - 1) // LANES, 1)
    flat = np.zeros((tb * LANES, TRI_STRIDE * G), np.float32)
    if ns:
        tperm = tri_pos[bvh.tri_index]
        tid = np.asarray(bvh.tri_index, np.float32)
        leaf_of_slot = np.repeat(np.arange(leaf_nodes.shape[0]), sc)
        slot_in_leaf = np.arange(ns) - sf[leaf_of_slot]
        base = np.asarray(bvh.node_first, np.int64)[leaf_nodes]
        for g in range(G):
            off = np.minimum(slot_in_leaf * G + g, c[leaf_of_slot] - 1)
            sel = base[leaf_of_slot] + off  # permuted-order positions
            tp = tperm[sel]
            r0 = TRI_STRIDE * g
            flat[:ns, r0 + 0 : r0 + 3] = tp[:, 0]
            flat[:ns, r0 + 3 : r0 + 6] = tp[:, 1] - tp[:, 0]
            flat[:ns, r0 + 6 : r0 + 9] = tp[:, 2] - tp[:, 0]
            flat[:ns, r0 + 9] = tid[sel]
    tris = np.ascontiguousarray(flat.reshape(tb, LANES, TRI_STRIDE * G).transpose(0, 2, 1))
    return tris, slot_first, slot_count


def grouped_tri_ids(bvh, tri_group: int) -> np.ndarray:
    """Host-static slot->triangle map for the grouped tris table: [tb*128, G]
    original triangle ids (-1 = empty slot).  Mirrors _grouped_tris' slot
    layout so bvh.refit.repack_pallas_tris can rewrite vertex data in place
    for moved geometry (topology fixed)."""
    G = int(tri_group)
    counts = np.asarray(bvh.node_count, np.int64)
    leaf_nodes = np.nonzero(counts > 0)[0]
    c = counts[leaf_nodes]
    sc = (c + G - 1) // G
    sf = np.zeros_like(sc)
    if sc.size:
        sf[1:] = np.cumsum(sc)[:-1]
    ns = int(sc.sum())
    tb = max((ns + LANES - 1) // LANES, 1)
    ids = np.full((tb * LANES, G), -1, np.int64)
    if ns:
        tri_index = np.asarray(bvh.tri_index, np.int64)
        leaf_of_slot = np.repeat(np.arange(leaf_nodes.shape[0]), sc)
        slot_in_leaf = np.arange(ns) - sf[leaf_of_slot]
        base = np.asarray(bvh.node_first, np.int64)[leaf_nodes]
        for g in range(G):
            off = np.minimum(slot_in_leaf * G + g, c[leaf_of_slot] - 1)
            ids[:ns, g] = tri_index[base[leaf_of_slot] + off]
    return ids


def pack_bvh_for_pallas(bvh, tri_pos: np.ndarray, tri_group: int = 1) -> dict:
    """FlatBVH + world triangles -> lane-packed VMEM tables (numpy)."""
    n = int(bvh.node_lo.shape[0])
    tris, slot_first, slot_count = _grouped_tris(bvh, tri_pos, tri_group)
    nb = max((n + LANES - 1) // LANES, 1)

    nodes_flat = np.zeros((nb * LANES, 8), np.float32)
    nodes_flat[:n, 0:3] = bvh.node_lo
    nodes_flat[:n, 3:6] = bvh.node_hi
    is_leaf = bvh.node_count > 0
    first_or_right = np.where(is_leaf, slot_first, bvh.node_right).astype(np.int64)
    # Inner-node split axis + side, derived from child AABB centers (the
    # builder puts lower-coordinate triangles in the left child along its
    # split axis, so argmax center separation recovers it).
    left = np.minimum(np.arange(n) + 1, max(n - 1, 0))
    right = np.clip(bvh.node_right, 0, max(n - 1, 0))
    c_l = (bvh.node_lo[left] + bvh.node_hi[left]) * 0.5
    c_r = (bvh.node_lo[right] + bvh.node_hi[right]) * 0.5
    axis = np.argmax(np.abs(c_r - c_l), axis=-1)
    lower = (c_l[np.arange(n), axis] <= c_r[np.arange(n), axis]).astype(np.int64)
    field = np.where(is_leaf, slot_count, INNER_FIELD + axis * 2 + lower)
    enc = first_or_right * (1 << META_SHIFT) + field
    assert enc.max(initial=0) < (1 << 24), "meta encoding exceeds f32 exact range"
    nodes_flat[:n, 6] = enc.astype(np.float32)
    # Padding lanes: enc = 0 -> field 0, neither leaf nor inner: never pushed,
    # and their bounds are +/-0 (slab test misses).
    nodes = np.ascontiguousarray(nodes_flat.reshape(nb, LANES, 8).transpose(0, 2, 1))
    return {"nodes": nodes, "tris": tris}


# Per-chunk budget: the 160k single-table limit (~12 MB of VMEM tables) is
# measured-working on v5e (~16 MB VMEM), so chunks use nearly the same
# budget -- fewer chunks beats smaller chunks because every chunk pass pays
# a kernel dispatch + its table DMA (a 247k-tri scene is 2 chunks, not 4).
MAX_CHUNK_TRIS = 150 * 1024
SINGLE_TABLE_MAX_TRIS = 160 * 1024  # below this, always a single resident table
# The true single-table ceiling is VMEM bytes, not triangle count: at
# tri_group=8 the packed tables cost ~53 B/tri (40 B tris + 13 B fat4
# nodes).  v5e has 128 MB of physical VMEM; Mosaic only enforces the ~16 MB
# default *scoped* limit, which _packed_call raises per kernel
# (vmem_limit_bytes) when the tables need it.  The budget below keeps
# headroom for ray/output blocks, XLA's own VMEM-pinned gather tables in
# the surrounding program, and compiler slack; scenes whose PACKED tables
# fit it skip chunking outright (engine.renderer packs first and checks
# actual bytes -- ~1.5M tris).
SINGLE_TABLE_MAX_BYTES = 80 * 1024 * 1024
VMEM_HARD_CAP = 100 * 1024 * 1024


def pack_bvh_chunks(
    bvh, tri_pos: np.ndarray, max_tris: int = MAX_CHUNK_TRIS, wide: int = 2,
    tri_group: int = 1,
) -> list[dict]:
    """Cut the BVH into VMEM-sized subtree chunks; pack each for the kernel.

    Scenes beyond ~150k triangles overflow VMEM as a single table
    (Sponza-class: 262k).  The pre-order flatten makes subtrees contiguous in
    both node index ([r, skip[r])) and DFS triangle order, so each cut
    subtree re-bases to an independent table; the tracer chains chunks with
    tightening per-ray t caps (pallas_closest_chunks).  Spatial coherence of
    subtrees means most rays retire on all but 1-2 chunk roots."""
    from types import SimpleNamespace

    n = int(bvh.node_lo.shape[0])
    is_leaf = bvh.node_count > 0
    counts = np.zeros(n, np.int64)
    for i in range(n - 1, -1, -1):  # children follow parents in pre-order
        counts[i] = (
            bvh.node_count[i] if is_leaf[i] else counts[i + 1] + counts[bvh.node_right[i]]
        )
    cuts = []
    stack = [0]
    while stack:
        i = stack.pop()
        if is_leaf[i] or counts[i] <= max_tris:
            cuts.append(i)
        else:
            stack.append(int(bvh.node_right[i]))
            stack.append(i + 1)

    chunks = []
    for r in sorted(cuts):
        e = int(bvh.node_skip[r])
        leaf_mask = is_leaf[r:e]
        firsts = bvh.node_first[r:e][leaf_mask]
        tri_base = int(firsts.min())
        tri_cnt = int(counts[r])
        sub = SimpleNamespace(
            node_lo=bvh.node_lo[r:e],
            node_hi=bvh.node_hi[r:e],
            node_first=np.where(leaf_mask, bvh.node_first[r:e] - tri_base, 0).astype(np.int64),
            node_count=bvh.node_count[r:e],
            node_right=np.where(leaf_mask, -1, bvh.node_right[r:e] - r).astype(np.int64),
            tri_index=bvh.tri_index[tri_base : tri_base + tri_cnt],
        )
        # Fat (children-at-parent, or fat4 grandchildren) layout when the
        # chunk root is inner; single-leaf chunks keep the legacy layout.
        pack_fat = pack_bvh_fat4 if wide == 4 else pack_bvh_fat
        chunks.append(
            pack_fat(sub, tri_pos, tri_group=tri_group)
            or pack_bvh_for_pallas(sub, tri_pos, tri_group=tri_group)
        )
    return chunks


# Whole-tree nodes + chunked triangle tables: total resident VMEM budget for
# (fat4 nodes + one tris chunk); mirrors the measured-working single-table
# limit (~12.6 MB at 160k tris on ~16 MB VMEM).
TRI_CHUNK_TABLE_BUDGET = 13 * 1024 * 1024


@jax.tree_util.register_pytree_node_class
class TriChunk:
    """One resident triangle chunk.  `tris` is a traced leaf; the slot
    bounds are pytree aux_data so they stay Python ints across a jit
    boundary (the kernels specialize on them as static parameters)."""

    def __init__(self, tris, slot_lo: int, slot_hi: int):
        self.tris = tris
        self.slot_lo = int(slot_lo)
        self.slot_hi = int(slot_hi)

    def tree_flatten(self):
        return (self.tris,), (self.slot_lo, self.slot_hi)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], *aux)


def pack_bvh_tri_chunks(bvh, tri_pos: np.ndarray, tri_group: int = 1) -> dict | None:
    """Whole-tree fat4 nodes + VMEM-sized TRIANGLE chunks.

    The legacy chunking (pack_bvh_chunks) cuts the scene into independent
    subtrees and re-traverses every chunk's tree: chunk root boxes overlap
    spatially, so rays descend through the non-owning chunk's air -- measured
    ~1.5x single-table cost at 247k tris.  Here the NODE table covers the
    WHOLE tree (it is small: ~13 B/tri) and only the triangle table is
    chunked: each pass walks the one true tree with the caps it already has,
    intersecting only leaves resident in the pass's tris chunk (kernel
    slot_range gating).  Pass 2+ prune on pass 1's tightened caps, so the
    total is ~one full traversal plus cheap capped re-walks.

    Leaf slots are numbered globally (pre-order), so a subtree cut covers a
    contiguous slot range and every leaf is fully inside one chunk.  Returns
    {"fat4nodes", "fat4_slots", "tri_chunks": [TriChunk...]} or None when
    the root is a leaf / nodes alone bust the budget (caller falls back to
    pack_bvh_chunks)."""
    full = pack_bvh_fat4(bvh, tri_pos, tri_group=tri_group)
    if full is None:
        return None
    nodes_bytes = full["fat4nodes"].nbytes
    budget = TRI_CHUNK_TABLE_BUDGET - nodes_bytes
    g = int(tri_group)
    bytes_per_slot = TRI_STRIDE * g * 4  # one [TRI_STRIDE*G] f32 row per slot
    max_slots = budget // bytes_per_slot
    if max_slots < LANES:  # nodes leave no useful room (< one tris tile)
        return None
    max_tris = int(max_slots) * g  # conservative (slots hold <= G tris)

    n = int(bvh.node_lo.shape[0])
    is_leaf = bvh.node_count > 0
    counts = np.zeros(n, np.int64)
    for i in range(n - 1, -1, -1):  # children follow parents in pre-order
        counts[i] = (
            bvh.node_count[i] if is_leaf[i] else counts[i + 1] + counts[bvh.node_right[i]]
        )
    if counts[0] <= max_tris:
        return None  # single table fits; no point chunking
    cuts = []
    stack = [0]
    while stack:
        i = stack.pop()
        if is_leaf[i] or counts[i] <= max_tris:
            cuts.append(i)
        else:
            stack.append(int(bvh.node_right[i]))
            stack.append(i + 1)

    # Global slot numbering (identical to _grouped_tris / pack_bvh_fat4).
    counts_l = np.asarray(bvh.node_count, np.int64)
    leaf_nodes = np.nonzero(counts_l > 0)[0]
    sc = (counts_l[leaf_nodes] + g - 1) // g
    sf = np.zeros_like(sc)
    if sc.size:
        sf[1:] = np.cumsum(sc)[:-1]
    slot_first = np.zeros(n, np.int64)
    slot_end = np.zeros(n, np.int64)
    slot_first[leaf_nodes] = sf
    slot_end[leaf_nodes] = sf + sc

    tb, rows_g, lanes = full["tris"].shape
    flat = np.ascontiguousarray(full["tris"].transpose(0, 2, 1)).reshape(tb * lanes, rows_g)
    tri_chunks = []
    for r in sorted(cuts):
        e = int(bvh.node_skip[r])
        leaves = leaf_nodes[(leaf_nodes >= r) & (leaf_nodes < e)]
        if leaves.size == 0:
            continue
        lo = int(slot_first[leaves].min())
        hi = int(slot_end[leaves].max())
        sub = flat[lo:hi]
        pad = (-sub.shape[0]) % LANES
        if pad:
            sub = np.concatenate([sub, np.zeros((pad, rows_g), np.float32)])
        tris = np.ascontiguousarray(
            sub.reshape(sub.shape[0] // LANES, LANES, rows_g).transpose(0, 2, 1)
        )
        tri_chunks.append(TriChunk(tris, lo, hi))
    return {
        "fat4nodes": full["fat4nodes"],
        "fat4_slots": full["fat4_slots"],
        "tri_chunks": tri_chunks,
    }


def pallas_closest_tri_chunks(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    """Closest hit over whole-tree nodes + triangle chunks: one true-tree
    walk per chunk with tightening caps (pack_bvh_tri_chunks)."""
    best = None
    for c in packed["tri_chunks"]:
        sub = {"fat4nodes": packed["fat4nodes"], "tris": c.tris}
        cap = t_max if best is None else jnp.minimum(best["t"], t_max)
        hit = pallas_closest_hit_fat4(
            o, d, sub, t_max=cap, interpret=interpret,
            slot_range=(c.slot_lo, c.slot_hi),
        )
        if best is None:
            best = hit
        else:
            take = hit["tri"] >= 0
            best = {k: jnp.where(take, hit[k], best[k]) for k in ("t", "tri", "u", "v")}
    return best


def pallas_any_tri_chunks(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    occ = None
    for c in packed["tri_chunks"]:
        sub = {"fat4nodes": packed["fat4nodes"], "tris": c.tris}
        o_live = o if occ is None else jnp.where(
            occ[:, None], jnp.float32(10.0 * DEAD_RAY_ORIGIN), o
        )
        o2 = pallas_any_hit_fat4(
            o_live, d, sub, t_max=t_max, interpret=interpret,
            slot_range=(c.slot_lo, c.slot_hi),
        )
        occ = o2 if occ is None else occ | o2
    return occ


def pallas_shadow_closest_tri_chunks(
    o, b, l, packed: dict, t_max_b=jnp.inf, t_max_l=jnp.inf, interpret: bool = False
):
    n = o.shape[0]
    tb = jnp.broadcast_to(jnp.asarray(t_max_b, jnp.float32), (n,))
    tl = jnp.broadcast_to(jnp.asarray(t_max_l, jnp.float32), (n,))
    best = None
    occ = jnp.zeros(n, bool)
    for c in packed["tri_chunks"]:
        sub = {"fat4nodes": packed["fat4nodes"], "tris": c.tris}
        cap_b = tb if best is None else jnp.minimum(best["t"], tb)
        cap_l = jnp.where(occ, 0.0, tl)
        hit, o2 = pallas_shadow_closest_fat4(
            o, b, l, sub, t_max_b=cap_b, t_max_l=cap_l, interpret=interpret,
            slot_range=(c.slot_lo, c.slot_hi),
        )
        occ = occ | o2
        if best is None:
            best = hit
        else:
            take = hit["tri"] >= 0
            best = {k: jnp.where(take, hit[k], best[k]) for k in ("t", "tri", "u", "v")}
    return best, occ


def pack_bvh_fat(bvh, tri_pos: np.ndarray, tri_group: int = 1) -> dict | None:
    """Fat-node packing: each row holds BOTH children's AABBs + metadata.

    The fat kernels test both children at the parent's visit and push only
    *hit inner* children, so the while-loop runs ~2x fewer iterations than
    the one-node-per-visit kernel at the same total slab-test work (a box is
    still tested exactly once).  Leaf children are intersected inline at the
    parent.  Only inner nodes get rows (compacted ids), so the table is the
    same size as the legacy 8-row all-nodes table.

    Row layout [16, 128] f32, inner node i at block iid>>7, lane iid&127:
      rows 0-5   left child lo.xyz / hi.xyz
      rows 6-11  right child lo.xyz / hi.xyz
      row 12/13  encL/encR: leaf child  -> first_tri * 32 + count (1..15)
                 inner child -> inner_id * 32 + 16
      row 14     this node's near-order meta: split_axis * 2 + left_is_lower
      row 15     unused
    Returns None when the root is a leaf (caller uses the legacy kernel).
    """
    n = int(bvh.node_lo.shape[0])
    is_leaf = bvh.node_count > 0
    if n == 0 or is_leaf[0]:
        return None
    tris, slot_first, slot_count = _grouped_tris(bvh, tri_pos, tri_group)
    inner_idx = np.nonzero(~is_leaf)[0]
    ni = inner_idx.shape[0]
    inner_id = np.full(n, -1, np.int64)
    inner_id[inner_idx] = np.arange(ni)

    def childinfo(c):
        leaf = is_leaf[c]
        return np.where(
            leaf,
            slot_first[c] * (1 << META_SHIFT) + slot_count[c],
            inner_id[c] * (1 << META_SHIFT) + INNER_FIELD,
        )

    left = inner_idx + 1
    right = bvh.node_right[inner_idx].astype(np.int64)
    c_l = (bvh.node_lo[left] + bvh.node_hi[left]) * 0.5
    c_r = (bvh.node_lo[right] + bvh.node_hi[right]) * 0.5
    axis = np.argmax(np.abs(c_r - c_l), axis=-1)
    lower = (c_l[np.arange(ni), axis] <= c_r[np.arange(ni), axis]).astype(np.int64)

    nb = max((ni + LANES - 1) // LANES, 1)
    flat = np.zeros((nb * LANES, 16), np.float32)
    flat[:ni, 0:3] = bvh.node_lo[left]
    flat[:ni, 3:6] = bvh.node_hi[left]
    flat[:ni, 6:9] = bvh.node_lo[right]
    flat[:ni, 9:12] = bvh.node_hi[right]
    encl = childinfo(left)
    encr = childinfo(right)
    assert max(encl.max(initial=0), encr.max(initial=0)) < (1 << 24), "fat enc exceeds f32"
    flat[:ni, 12] = encl.astype(np.float32)
    flat[:ni, 13] = encr.astype(np.float32)
    flat[:ni, 14] = (axis * 2 + lower).astype(np.float32)
    fat = np.ascontiguousarray(flat.reshape(nb, LANES, 16).transpose(0, 2, 1))
    return {"fatnodes": fat, "tris": tris}


def pack_bvh_fat4(bvh, tri_pos: np.ndarray, tri_group: int = 1) -> dict | None:
    """Fat4 packing: each row holds FOUR grandchild slots' AABBs + metadata.

    One level of the BVH2 is contracted per visit: a fat4 node for inner
    node i carries the boxes of i's grandchildren (or a leaf child itself),
    so the while loop runs ~2x fewer iterations than the fat(2) kernel.  The
    intermediate (child) boxes are never slab-tested -- the classic wide-BVH
    trade: slightly more total box tests for far fewer visits, which wins
    when per-visit overhead (fetch, decode, syncs, loop) dominates.

    Slots 0,1 = children of i's left child (or [left child, empty] when it
    is a leaf); slots 2,3 likewise for the right child.

    Row layout [32, 128] f32, fat4 node at block id>>7, lane id&127:
      rows 0-23   slot k box at rows [6k, 6k+6): lo.xyz, hi.xyz
      rows 24-27  enc per slot: leaf  -> first_tri * 32 + count (1..15)
                               inner -> fat4_id * 32 + 16;  empty -> 0
      row 28      order meta: om_self * 36 + om_l * 6 + om_r, each
                  axis * 2 + left_is_lower for (this node, left child,
                  right child); 0 when the child is a leaf (pair order
                  is irrelevant -- slot 1/3 is the empty box).
      rows 29-31  unused.
    Returns None when the root is a leaf (caller uses the legacy kernel).
    """
    n = int(bvh.node_lo.shape[0])
    is_leaf = bvh.node_count > 0
    if n == 0 or is_leaf[0]:
        return None
    tris, slot_first, slot_count = _grouped_tris(bvh, tri_pos, tri_group)

    def pair_of(c):
        """Child node c -> (slot node ids, om). Leaf -> [c, -1], om 0."""
        if is_leaf[c]:
            return [c, -1], 0
        gl, gr = c + 1, int(bvh.node_right[c])
        cl = (bvh.node_lo[gl] + bvh.node_hi[gl]) * 0.5
        cr = (bvh.node_lo[gr] + bvh.node_hi[gr]) * 0.5
        axis = int(np.argmax(np.abs(cr - cl)))
        lower = int(cl[axis] <= cr[axis])
        return [gl, gr], axis * 2 + lower

    # BFS from the root over grandchild links; fat4 rows keyed by the inner
    # node they expand, compact ids in visit order.
    fat_id: dict[int, int] = {0: 0}
    order: list[int] = [0]
    slots_all: list[list[int]] = []
    oms: list[tuple[int, int, int]] = []
    qi = 0
    while qi < len(order):
        i = order[qi]
        qi += 1
        l, r = i + 1, int(bvh.node_right[i])
        cl = (bvh.node_lo[l] + bvh.node_hi[l]) * 0.5
        cr = (bvh.node_lo[r] + bvh.node_hi[r]) * 0.5
        axis = int(np.argmax(np.abs(cr - cl)))
        lower = int(cl[axis] <= cr[axis])
        pl_, om_l = pair_of(l)
        pr_, om_r = pair_of(r)
        slots = pl_ + pr_
        for s in slots:
            if s >= 0 and not is_leaf[s] and s not in fat_id:
                fat_id[s] = len(order)
                order.append(s)
        slots_all.append(slots)
        oms.append((axis * 2 + lower, om_l, om_r))

    ni = len(order)
    nb = max((ni + LANES - 1) // LANES, 1)
    flat = np.zeros((nb * LANES, 32), np.float32)
    for row, (slots, (om_s, om_l, om_r)) in enumerate(zip(slots_all, oms)):
        for k, s in enumerate(slots):
            if s < 0:
                continue  # empty slot: +/-0 box never hits, enc 0
            flat[row, 6 * k : 6 * k + 3] = bvh.node_lo[s]
            flat[row, 6 * k + 3 : 6 * k + 6] = bvh.node_hi[s]
            if is_leaf[s]:
                enc = int(slot_first[s]) * (1 << META_SHIFT) + int(slot_count[s])
            else:
                enc = fat_id[s] * (1 << META_SHIFT) + INNER_FIELD
            assert enc < (1 << 24), "fat4 enc exceeds f32 exact range"
            flat[row, 24 + k] = float(enc)
        flat[row, 28] = float(om_s * 36 + om_l * 6 + om_r)
    fat4 = np.ascontiguousarray(flat.reshape(nb, LANES, 32).transpose(0, 2, 1))
    # fat4_slots: original node id per slot (-1 = empty), for device-side
    # bound repack after a refit (bvh.refit.repack_pallas_fat4_bounds).
    slot_ids = np.full((nb * LANES, 4), -1, np.int32)
    for row, slots in enumerate(slots_all):
        slot_ids[row] = slots
    return {"fat4nodes": fat4, "tris": tris, "fat4_slots": slot_ids}


def pack_rays(o, d):
    """[N, 3] rays -> SoA dict of [ceil(N/TILE)*SUB, 128] arrays + count."""
    n = o.shape[0]
    n_tiles = max((n + TILE - 1) // TILE, 1)
    pad = n_tiles * TILE - n
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)])
        # Padded rays: near-zero direction exits every slab test immediately.
        d = jnp.concatenate([d, jnp.full((pad, 3), 1e-12, d.dtype)])
    comp = {}
    for i, name in enumerate(("ox", "oy", "oz")):
        comp[name] = o[:, i].reshape(n_tiles * SUB, LANES)
    for i, name in enumerate(("dx", "dy", "dz")):
        comp[name] = d[:, i].reshape(n_tiles * SUB, LANES)
    return comp, n_tiles, n


# ---------------------------------------------------------------------------
# Kernel helpers (all vector-land unless noted)
# ---------------------------------------------------------------------------


import os as _os

# Lane-select strategy for _fetch_row.  "vpu": mask + cross-lane sum (the
# reference path, always exact).  "mxu": one-hot matvec at HIGHEST precision
# -- the f32 operand is decomposed into bf16 triples whose products with the
# exact 0/1 one-hot are individually exact, so the result is bit-exact for
# every f32 table value while moving the reduction off the VPU's serial
# cross-lane path onto the (otherwise idle) MXU.  A *default*-precision
# matvec would truncate to one bf16 pass and corrupt child indices > 256;
# that is the failure mode that originally forced the VPU path.
_FETCH_MODE = _os.environ.get("NEB_FETCH_MODE", "vpu")


def _fetch_row(table_ref, idx, rows: int | None = None):
    """Element idx's row, replicated across lanes -> [rows, 128].

    Exactness matters (child indices / triangle ids ride in f32 rows), so
    the lane select is either a VPU mask + cross-lane sum or an MXU one-hot
    matvec at HIGHEST precision (see _FETCH_MODE above) -- both bit-exact.
    Mosaic can't broadcast [1,1]->[8,128] in one op, which is why fields
    stay [1,128] lane-uniform slices downstream (sublane-only broadcasts).
    `rows` limits the select to the leading rows actually used (tri blocks
    carry 6 reserved rows)."""
    return _lane_select(table_ref[idx // LANES], idx % LANES, rows)


def _lane_select(tile, lane, rows: int | None = None):
    """tile [R, 128], traced lane index -> [rows, 128] lane-replicated
    column (the select half of _fetch_row, for already-resident tiles)."""
    if rows is None:
        rows = tile.shape[0]
    else:
        tile = tile[:rows]
    idx = lane  # lane index within the tile
    if _FETCH_MODE == "mxu":
        # [LANES, LANES] matrix whose every column is the same one-hot row
        # select: (tile @ M)[i, j] = tile[i, idx] -- the result arrives
        # already lane-replicated (Mosaic cannot broadcast a [rows, 1] dot
        # output across lanes, so the replication must ride the matmul).
        onehot = (
            jax.lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0) == (idx % LANES)
        ).astype(jnp.float32)
        return jax.lax.dot_general(
            tile,
            onehot,
            (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [rows, LANES] exact (one nonzero per column; bf16-triple decomp)
    else:
        mask = (
            jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) == (idx % LANES)
        ).astype(jnp.float32)
        picked = jnp.sum(tile * mask, axis=1, keepdims=True)  # [rows, 1] exact
    return jnp.broadcast_to(picked, (rows, LANES))


def _tri_groups(tris_ref, slot):
    """Fetch one triangle slot; return per-triangle [10, 128] views.

    The tri table packs G triangles per lane slot (triangle g at rows
    [TRI_STRIDE*g, TRI_STRIDE*g+10)); G is static from the table shape.  Grouping replaces G
    separate fetches + leaf-loop iterations with ONE wider row fetch: the
    lane-select cost is proportional to total rows either way, but the
    per-fetch overhead and the dynamic-trip-count loop iterations divide by
    G (sorted bounce closest 156 -> 112 ms at G=8, leaf 15, 2M rays)."""
    g = tris_ref.shape[1] // TRI_STRIDE
    tv = _fetch_row(tris_ref, slot, rows=TRI_STRIDE * (g - 1) + 10)
    return [tv[TRI_STRIDE * i : TRI_STRIDE * i + 10] for i in range(g)]


# Demand-paging geometry for HBM-streamed tri tables: a page is PAGE_TILES
# consecutive [16G, 128] tile blocks (DMA latency ~1 us dominates the
# transfer at 64 KB, so multi-tile pages amortize it while pre-order slot
# locality keeps them hot), cached 2-way direct-mapped by page parity so a
# leaf run straddling a page boundary doesn't thrash.
PAGE_TILES = int(_os0.environ.get("NEB_PAGE_TILES", "4"))
PAGE_WAYS = 2


def _tri_groups_paged(tris_hbm, tri_buf, res_ref, sem, slot):
    """_tri_groups over an HBM-resident tri table with a paged VMEM cache.

    `tris_hbm` lives in ANY/HBM (padded to a multiple of PAGE_TILES tile
    blocks); `tri_buf` is a VMEM scratch of PAGE_WAYS pages and `res_ref`
    (SMEM [PAGE_WAYS]) the resident page ids.  On a miss the page is DMA'd
    in with full latency exposed -- leaf slots are pre-order contiguous, so
    coherent packets mostly re-hit a resident page, and the cache persists
    across grid steps so spatially adjacent packets start warm."""
    g = tri_buf.shape[1] // TRI_STRIDE
    blk = slot // LANES
    page = blk // PAGE_TILES
    way = page % PAGE_WAYS

    @pl.when(page != res_ref[way])
    def _():
        dma = pltpu.make_async_copy(
            tris_hbm.at[pl.ds(page * PAGE_TILES, PAGE_TILES)],
            tri_buf.at[pl.ds(way * PAGE_TILES, PAGE_TILES)],
            sem,
        )
        dma.start()
        dma.wait()
        res_ref[way] = page

    tile = tri_buf[way * PAGE_TILES + (blk % PAGE_TILES)]
    tv = _lane_select(tile, slot % LANES, rows=TRI_STRIDE * (g - 1) + 10)
    return [tv[TRI_STRIDE * i : TRI_STRIDE * i + 10] for i in range(g)]


def pad_tris_for_paging(tris: np.ndarray) -> np.ndarray:
    """Pad a [tb, 16G, 128] tri table to a PAGE_TILES multiple of tile
    blocks so paged DMA never reads past the end (zero tiles are never
    referenced by any leaf)."""
    pad = (-tris.shape[0]) % PAGE_TILES
    if pad:
        tris = np.concatenate(
            [tris, np.zeros((pad,) + tris.shape[1:], tris.dtype)], axis=0
        )
    return tris


def _slab_test(vals, oix, oiy, oiz, ix, iy, iz, t_cap, off: int = 0):
    """Packet ray-AABB. vals lane-replicated, box at rows [off, off+6); rays
    [8,128].  Takes the precomputed per-ray products o*inv_d (hoisted out of
    the traversal loop) so each plane is one fma: t = fma(bound, inv_d, -oi).
    The refactored rounding differs from (bound-o)*inv_d by ulps only where
    |bound*inv_d| is huge (axis-parallel rays far from the slab), where the
    enter/exit interval is huge too -- no false misses in practice, and the
    hit itself is always decided by the exact Moller test."""
    lo_x, lo_y, lo_z = vals[off + 0 : off + 1, :], vals[off + 1 : off + 2, :], vals[off + 2 : off + 3, :]
    hi_x, hi_y, hi_z = vals[off + 3 : off + 4, :], vals[off + 4 : off + 5, :], vals[off + 5 : off + 6, :]
    t0x = lo_x * ix - oix
    t1x = hi_x * ix - oix
    t0y = lo_y * iy - oiy
    t1y = hi_y * iy - oiy
    t0z = lo_z * iz - oiz
    t1z = hi_z * iz - oiz
    tenter = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)), jnp.minimum(t0z, t1z)
    )
    texit = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)), jnp.maximum(t0z, t1z)
    )
    return (tenter <= texit) & (texit > EPS) & (tenter < t_cap)


def _moller(tv, ox, oy, oz, dx, dy, dz, t_cap):
    """Packet Moller-Trumbore for one triangle (tv [16,128] lane-replicated)
    vs [8,128] rays."""
    v0x, v0y, v0z = tv[0:1, :], tv[1:2, :], tv[2:3, :]
    e1x, e1y, e1z = tv[3:4, :], tv[4:5, :], tv[5:6, :]
    e2x, e2y, e2z = tv[6:7, :], tv[7:8, :], tv[8:9, :]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) < EPS, 0.0, 1.0 / jnp.where(det == 0.0, 1.0, det))
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) >= EPS)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > EPS)
        & (t < t_cap)
    )
    return hit, t, u, v


def _safe_inv(d):
    sign = jnp.where(d >= 0.0, 1.0, -1.0)
    return sign / jnp.maximum(jnp.abs(d), 1e-12)


# ---------------------------------------------------------------------------
# Closest-hit kernel
# ---------------------------------------------------------------------------


def _closest_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    nodes_ref, tris_ref,
    t_out, tri_out, u_out, v_out,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    oix, oiy, oiz = ox * ix, oy * iy, oz * iz

    # Per-tile direction signs (one-time syncs): rays are octant-sorted
    # upstream, so the tile majority sign picks the true near child below.
    pos_x = jnp.sum(jnp.sign(dx)) >= 0.0
    pos_y = jnp.sum(jnp.sign(dy)) >= 0.0
    pos_z = jnp.sum(jnp.sign(dz)) >= 0.0

    stack_ref[0] = 0  # root

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, bt, btri, bu, bv = state
        node = stack_ref[sp - 1]
        sp = sp - 1
        vals = _fetch_row(nodes_ref, node, rows=7)  # [7, 128]
        box_hit = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, bt)
        any_hit = jnp.any(box_hit)  # vector->scalar sync #1
        # round() before the int cast: the one-hot fetch goes through the MXU
        # whose f32 matmul is a bf16 multi-pass -- values can come back a few
        # ulps off, and truncation would corrupt the child index.
        enc = jnp.round(vals[6, 0]).astype(jnp.int32)  # vector->scalar sync #2
        field = jax.lax.rem(enc, 1 << META_SHIFT)
        meta = jax.lax.div(enc, 1 << META_SHIFT)
        is_leaf = (field > 0) & (field <= MAX_LEAF_FIELD)
        count = jnp.where(is_leaf, field, 0)

        def leaf_body(k, carry):
            bt, btri, bu, bv = carry
            for tv in _tri_groups(tris_ref, meta + k):
                h, t, u, v = _moller(tv, ox, oy, oz, dx, dy, dz, bt)
                take = h & box_hit
                tid = jnp.broadcast_to(tv[9:10, :], bt.shape)  # original id as f32
                bt = jnp.where(take, t, bt)
                btri = jnp.where(take, tid, btri)
                bu = jnp.where(take, u, bu)
                bv = jnp.where(take, v, bv)
            return bt, btri, bu, bv

        # Branch-free: trip count is 0 unless (leaf AND any ray hit the box).
        n_tris = jnp.where(any_hit, count, 0)
        bt, btri, bu, bv = jax.lax.fori_loop(0, n_tris, leaf_body, (bt, btri, bu, bv))

        # Ordered branch-free push: near child on top (pops first) so its
        # hits tighten bt before the far subtree is tested.  axis/lower are
        # only meaningful for inner nodes; push is gated on is_leaf.
        code = field - INNER_FIELD
        axis = jax.lax.div(code, 2)
        left_is_lower = jax.lax.rem(code, 2) > 0
        d_pos = jnp.where(axis == 0, pos_x, jnp.where(axis == 1, pos_y, pos_z))
        near_is_left = jnp.logical_not(jnp.logical_xor(d_pos, left_is_lower))
        left = node + 1
        near = jnp.where(near_is_left, left, meta)
        far = jnp.where(near_is_left, meta, left)
        sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
        stack_ref[sp_c] = far
        stack_ref[sp_c + 1] = near
        push = any_hit & (field >= INNER_FIELD)
        sp = jnp.where(push, sp_c + 2, sp)
        return sp, bt, btri, bu, bv

    shape = ox.shape
    init = (
        jnp.int32(1),
        tmax_ref[:],
        jnp.full(shape, -1.0, jnp.float32),  # best tri id as f32 (-1 = miss)
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    tri_out[:] = jnp.round(btri).astype(jnp.int32)
    u_out[:] = bu
    v_out[:] = bv


def _any_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    nodes_ref, tris_ref,
    occ_out,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    oix, oiy, oiz = ox * ix, oy * iy, oz * iz
    tmax = tmax_ref[:]

    # Ejected/padded lanes never occlude; precompute so the all-done early
    # exit below can retire the tile without draining the stack.
    dead = (jnp.abs(ox) >= DEAD_RAY_ORIGIN) | (
        jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) < 1e-6
    )

    stack_ref[0] = 0

    def cond(state):
        sp, _, done_all = state
        return (sp > 0) & jnp.logical_not(done_all)

    def body(state):
        sp, occ, _ = state
        node = stack_ref[sp - 1]
        sp = sp - 1
        vals = _fetch_row(nodes_ref, node, rows=7)
        cap = jnp.where(occ > 0.0, 0.0, tmax)  # retire occluded lanes
        box_hit = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, cap)
        any_hit = jnp.any(box_hit)
        enc = jnp.round(vals[6, 0]).astype(jnp.int32)
        field = jax.lax.rem(enc, 1 << META_SHIFT)
        meta = jax.lax.div(enc, 1 << META_SHIFT)
        is_leaf = (field > 0) & (field <= MAX_LEAF_FIELD)
        count = jnp.where(is_leaf, field, 0)

        def leaf_body(k, occ):
            for tv in _tri_groups(tris_ref, meta + k):
                h, _, _, _ = _moller(tv, ox, oy, oz, dx, dy, dz, tmax)
                occ = jnp.where(h & box_hit, 1.0, occ)
            return occ

        n_tris = jnp.where(any_hit, count, 0)
        occ = jax.lax.fori_loop(0, n_tris, leaf_body, occ)

        sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
        stack_ref[sp_c] = meta
        stack_ref[sp_c + 1] = node + 1
        push = any_hit & (field >= INNER_FIELD)
        sp = jnp.where(push, sp_c + 2, sp)
        done_all = jnp.all((occ > 0.0) | dead)
        return sp, occ, done_all

    init = (jnp.int32(1), jnp.zeros(ox.shape, jnp.float32), jnp.bool_(False))
    _, occ, _ = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occ > 0.0


# ---------------------------------------------------------------------------
# Fat-node kernels (pack_bvh_fat): both children tested at the parent
# ---------------------------------------------------------------------------


def _fat_decode(vals):
    """Scalar metadata extracts shared by the fat kernels (3 syncs)."""
    encl = jnp.round(vals[12, 0]).astype(jnp.int32)
    encr = jnp.round(vals[13, 0]).astype(jnp.int32)
    om = jnp.round(vals[14, 0]).astype(jnp.int32)
    fl = jax.lax.rem(encl, 1 << META_SHIFT)
    ml = jax.lax.div(encl, 1 << META_SHIFT)
    fr = jax.lax.rem(encr, 1 << META_SHIFT)
    mr = jax.lax.div(encr, 1 << META_SHIFT)
    return fl, ml, fr, mr, om


def _closest_fat_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    fat_ref, tris_ref,
    t_out, tri_out, u_out, v_out,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    oix, oiy, oiz = ox * ix, oy * iy, oz * iz
    pos_x = jnp.sum(jnp.sign(dx)) >= 0.0
    pos_y = jnp.sum(jnp.sign(dy)) >= 0.0
    pos_z = jnp.sum(jnp.sign(dz)) >= 0.0

    stack_ref[0] = 0  # root inner id

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, bt, btri, bu, bv = state
        iid = stack_ref[sp - 1]
        sp = sp - 1
        vals = _fetch_row(fat_ref, iid, rows=15)  # [15, 128]
        box_l = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, bt, off=0)
        box_r = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, bt, off=6)
        any_l = jnp.any(box_l)
        any_r = jnp.any(box_r)
        fl, ml, fr, mr, om = _fat_decode(vals)

        def make_leaf(first, box):
            def leaf_body(k, carry):
                bt, btri, bu, bv = carry
                for tv in _tri_groups(tris_ref, first + k):
                    h, t, u, v = _moller(tv, ox, oy, oz, dx, dy, dz, bt)
                    take = h & box
                    tid = jnp.broadcast_to(tv[9:10, :], bt.shape)
                    bt = jnp.where(take, t, bt)
                    btri = jnp.where(take, tid, btri)
                    bu = jnp.where(take, u, bu)
                    bv = jnp.where(take, v, bv)
                return bt, btri, bu, bv

            return leaf_body

        leaf_l = (fl > 0) & (fl <= MAX_LEAF_FIELD)
        leaf_r = (fr > 0) & (fr <= MAX_LEAF_FIELD)
        n_l = jnp.where(any_l & leaf_l, jnp.where(leaf_l, fl, 0), 0)
        n_r = jnp.where(any_r & leaf_r, jnp.where(leaf_r, fr, 0), 0)
        bt, btri, bu, bv = jax.lax.fori_loop(0, n_l, make_leaf(ml, box_l), (bt, btri, bu, bv))
        bt, btri, bu, bv = jax.lax.fori_loop(0, n_r, make_leaf(mr, box_r), (bt, btri, bu, bv))

        # Push hit inner children, near on top (pops first).
        axis = jax.lax.div(om, 2)
        left_is_lower = jax.lax.rem(om, 2) > 0
        d_pos = jnp.where(axis == 0, pos_x, jnp.where(axis == 1, pos_y, pos_z))
        near_is_left = jnp.logical_not(jnp.logical_xor(d_pos, left_is_lower))
        ok_l = any_l & (fl >= INNER_FIELD)
        ok_r = any_r & (fr >= INNER_FIELD)
        near_id = jnp.where(near_is_left, ml, mr)
        far_id = jnp.where(near_is_left, mr, ml)
        near_ok = jnp.where(near_is_left, ok_l, ok_r)
        far_ok = jnp.where(near_is_left, ok_r, ok_l)
        sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
        stack_ref[sp_c] = far_id
        sp1 = jnp.where(far_ok, sp_c + 1, sp_c)
        sp1 = jnp.minimum(sp1, STACK_DEPTH - 1)
        stack_ref[sp1] = near_id
        sp = jnp.where(near_ok, sp1 + 1, sp1)
        return sp, bt, btri, bu, bv

    shape = ox.shape
    init = (
        jnp.int32(1),
        tmax_ref[:],
        jnp.full(shape, -1.0, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    tri_out[:] = jnp.round(btri).astype(jnp.int32)
    u_out[:] = bu
    v_out[:] = bv


def _any_fat_kernel(
    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
    fat_ref, tris_ref,
    occ_out,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
    oix, oiy, oiz = ox * ix, oy * iy, oz * iz
    tmax = tmax_ref[:]
    dead = (jnp.abs(ox) >= DEAD_RAY_ORIGIN) | (
        jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) < 1e-6
    )

    stack_ref[0] = 0

    def cond(state):
        sp, _, done_all = state
        return (sp > 0) & jnp.logical_not(done_all)

    def body(state):
        sp, occ, _ = state
        iid = stack_ref[sp - 1]
        sp = sp - 1
        vals = _fetch_row(fat_ref, iid, rows=15)
        cap = jnp.where(occ > 0.0, 0.0, tmax)
        box_l = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, cap, off=0)
        box_r = _slab_test(vals, oix, oiy, oiz, ix, iy, iz, cap, off=6)
        any_l = jnp.any(box_l)
        any_r = jnp.any(box_r)
        fl, ml, fr, mr, _ = _fat_decode(vals)

        def make_leaf(first, box):
            def leaf_body(k, occ):
                for tv in _tri_groups(tris_ref, first + k):
                    h, _, _, _ = _moller(tv, ox, oy, oz, dx, dy, dz, tmax)
                    occ = jnp.where(h & box, 1.0, occ)
                return occ

            return leaf_body

        leaf_l = (fl > 0) & (fl <= MAX_LEAF_FIELD)
        leaf_r = (fr > 0) & (fr <= MAX_LEAF_FIELD)
        occ = jax.lax.fori_loop(0, jnp.where(any_l & leaf_l, fl, 0), make_leaf(ml, box_l), occ)
        occ = jax.lax.fori_loop(0, jnp.where(any_r & leaf_r, fr, 0), make_leaf(mr, box_r), occ)

        ok_l = any_l & (fl >= INNER_FIELD)
        ok_r = any_r & (fr >= INNER_FIELD)
        sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
        stack_ref[sp_c] = ml
        sp1 = jnp.where(ok_l, sp_c + 1, sp_c)
        sp1 = jnp.minimum(sp1, STACK_DEPTH - 1)
        stack_ref[sp1] = mr
        sp = jnp.where(ok_r, sp1 + 1, sp1)
        done_all = jnp.all((occ > 0.0) | dead)
        return sp, occ, done_all

    init = (jnp.int32(1), jnp.zeros(ox.shape, jnp.float32), jnp.bool_(False))
    _, occ, _ = jax.lax.while_loop(cond, body, init)
    occ_out[:] = occ > 0.0


@partial(jax.jit, static_argnames=("interpret",))
def pallas_closest_hit_fat(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    """Closest hit over a pack_bvh_fat table (same contract as
    pallas_closest_hit)."""
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _closest_fat_kernel,
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["fatnodes"], packed["tris"]],
        4, n_tiles, interpret,
    )
    return _unpack_hit(out, n)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_any_hit_fat(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _any_fat_kernel,
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["fatnodes"], packed["tris"]],
        1, n_tiles, interpret,
    )
    return out[:, 0].reshape(-1)[:n] > 0.0


# ---------------------------------------------------------------------------
# Combined shadow+bounce kernel: at a path vertex the NEE shadow ray and the
# indirect bounce ray share an origin, so one traversal of the *union* of
# their node sets replaces two traversals that each repeat the deep
# root->origin path.  Closest-hit semantics for the bounce direction,
# any-hit for the shadow direction; per-set box gates keep leaf work
# identical to the separate kernels.
# ---------------------------------------------------------------------------


def _fat4_decode(vals):
    """Scalar metadata extracts for the fat4 kernels (5 syncs)."""
    encs = [jnp.round(vals[24 + k, 0]).astype(jnp.int32) for k in range(4)]
    om = jnp.round(vals[28, 0]).astype(jnp.int32)
    fields = [jax.lax.rem(e, 1 << META_SHIFT) for e in encs]
    metas = [jax.lax.div(e, 1 << META_SHIFT) for e in encs]
    om_s = jax.lax.div(om, 36)
    rest = jax.lax.rem(om, 36)
    om_l = jax.lax.div(rest, 6)
    om_r = jax.lax.rem(rest, 6)
    return fields, metas, om_s, om_l, om_r


def _near_first(om, pos_x, pos_y, pos_z):
    """True when the first element of an (om-described) pair is nearer along
    the tile's majority direction sign."""
    axis = jax.lax.div(om, 2)
    lower = jax.lax.rem(om, 2) > 0
    d_pos = jnp.where(axis == 0, pos_x, jnp.where(axis == 1, pos_y, pos_z))
    return jnp.logical_not(jnp.logical_xor(d_pos, lower))


def _leaf_gate(slot_range):
    """Leaf residency for tri-chunked tables: with `slot_range = (lo, hi)`
    only leaves whose (global) slot ids live in the resident triangle table
    are intersected, offset to table-local rows; other leaves are skipped
    (a later pass with that chunk resident covers them -- caps only ever
    tighten with real hits, so skipping is exact).  slot_range=None is the
    single-table case with zero extra ops."""
    if slot_range is None:
        return lambda first, gate: (gate, first)
    lo, hi = int(slot_range[0]), int(slot_range[1])

    def gate_fn(first, gate):
        return gate & (first >= lo) & (first < hi), first - lo

    return gate_fn


def _paged_fetch(tris_ref, paged_scratch):
    """Pick the leaf tri fetch: VMEM-resident table or HBM demand paging
    (see _tri_groups_paged).  Initializes the resident-block id once per
    kernel launch (scratch persists across grid steps, so later packets
    start warm)."""
    if not paged_scratch:
        return lambda s: _tri_groups(tris_ref, s)
    tri_buf, res_ref, sem = paged_scratch

    @pl.when(pl.program_id(0) == 0)
    def _():
        for w in range(PAGE_WAYS):
            res_ref[w] = -1

    return lambda s: _tri_groups_paged(tris_ref, tri_buf, res_ref, sem, s)


@_lru_cache(maxsize=None)
def _make_closest_fat4_kernel(slot_range=None, paged=False):
    gate_fn = _leaf_gate(slot_range)

    def _closest_fat4_kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        fat_ref, tris_ref,
        t_out, tri_out, u_out, v_out,
        stack_ref, *paged_scratch,
    ):
        tri_fetch = _paged_fetch(tris_ref, paged_scratch)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        oix, oiy, oiz = ox * ix, oy * iy, oz * iz
        pos_x = jnp.sum(jnp.sign(dx)) >= 0.0
        pos_y = jnp.sum(jnp.sign(dy)) >= 0.0
        pos_z = jnp.sum(jnp.sign(dz)) >= 0.0

        stack_ref[0] = 0  # root fat4 id

        def cond(state):
            return state[0] > 0

        def body(state):
            sp, bt, btri, bu, bv = state
            iid = stack_ref[sp - 1]
            sp = sp - 1
            vals = _fetch_row(fat_ref, iid, rows=29)  # [29, 128]
            boxes = [
                _slab_test(vals, oix, oiy, oiz, ix, iy, iz, bt, off=6 * k) for k in range(4)
            ]
            anys = [jnp.any(b) for b in boxes]
            fields, metas, om_s, om_l, om_r = _fat4_decode(vals)

            def make_leaf(first, box):
                def leaf_body(k, carry):
                    bt, btri, bu, bv = carry
                    for tv in tri_fetch(first + k):
                        h, t, u, v = _moller(tv, ox, oy, oz, dx, dy, dz, bt)
                        take = h & box
                        tid = jnp.broadcast_to(tv[9:10, :], bt.shape)
                        bt = jnp.where(take, t, bt)
                        btri = jnp.where(take, tid, btri)
                        bu = jnp.where(take, u, bu)
                        bv = jnp.where(take, v, bv)
                    return bt, btri, bu, bv

                return leaf_body

            carry = (bt, btri, bu, bv)
            for k in range(4):
                is_leaf = (fields[k] > 0) & (fields[k] <= MAX_LEAF_FIELD)
                gate, first_local = gate_fn(metas[k], anys[k] & is_leaf)
                n_k = jnp.where(gate, fields[k], 0)
                carry = jax.lax.fori_loop(0, n_k, make_leaf(first_local, boxes[k]), carry)
            bt, btri, bu, bv = carry

            # Push hit inner slots, global near order (near pair's near on top).
            ns = _near_first(om_s, pos_x, pos_y, pos_z)
            nl = _near_first(om_l, pos_x, pos_y, pos_z)
            nr = _near_first(om_r, pos_x, pos_y, pos_z)
            oks = [anys[k] & (fields[k] >= INNER_FIELD) for k in range(4)]
            idL_n = jnp.where(nl, metas[0], metas[1])
            idL_f = jnp.where(nl, metas[1], metas[0])
            okL_n = jnp.where(nl, oks[0], oks[1])
            okL_f = jnp.where(nl, oks[1], oks[0])
            idR_n = jnp.where(nr, metas[2], metas[3])
            idR_f = jnp.where(nr, metas[3], metas[2])
            okR_n = jnp.where(nr, oks[2], oks[3])
            okR_f = jnp.where(nr, oks[3], oks[2])
            push_ids = (
                jnp.where(ns, idR_f, idL_f),
                jnp.where(ns, idR_n, idL_n),
                jnp.where(ns, idL_f, idR_f),
                jnp.where(ns, idL_n, idR_n),
            )
            push_oks = (
                jnp.where(ns, okR_f, okL_f),
                jnp.where(ns, okR_n, okL_n),
                jnp.where(ns, okL_f, okR_f),
                jnp.where(ns, okL_n, okR_n),
            )
            for pid, pok in zip(push_ids, push_oks):
                sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
                stack_ref[sp_c] = pid
                sp = jnp.where(pok, sp_c + 1, sp_c)
            return sp, bt, btri, bu, bv

        shape = ox.shape
        init = (
            jnp.int32(1),
            tmax_ref[:],
            jnp.full(shape, -1.0, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        _, bt, btri, bu, bv = jax.lax.while_loop(cond, body, init)
        t_out[:] = bt
        tri_out[:] = jnp.round(btri).astype(jnp.int32)
        u_out[:] = bu
        v_out[:] = bv

    return _closest_fat4_kernel


_closest_fat4_kernel = _make_closest_fat4_kernel()


@_lru_cache(maxsize=None)
def _make_any_fat4_kernel(slot_range=None, paged=False):
    gate_fn = _leaf_gate(slot_range)

    def _any_fat4_kernel(
        ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
        fat_ref, tris_ref,
        occ_out,
        stack_ref, *paged_scratch,
    ):
        tri_fetch = _paged_fetch(tris_ref, paged_scratch)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
        ix, iy, iz = _safe_inv(dx), _safe_inv(dy), _safe_inv(dz)
        oix, oiy, oiz = ox * ix, oy * iy, oz * iz
        tmax = tmax_ref[:]
        dead = (jnp.abs(ox) >= DEAD_RAY_ORIGIN) | (
            jnp.abs(dx) + jnp.abs(dy) + jnp.abs(dz) < 1e-6
        )

        stack_ref[0] = 0

        def cond(state):
            sp, _, done_all = state
            return (sp > 0) & jnp.logical_not(done_all)

        def body(state):
            sp, occ, _ = state
            iid = stack_ref[sp - 1]
            sp = sp - 1
            vals = _fetch_row(fat_ref, iid, rows=29)
            cap = jnp.where(occ > 0.0, 0.0, tmax)
            boxes = [
                _slab_test(vals, oix, oiy, oiz, ix, iy, iz, cap, off=6 * k) for k in range(4)
            ]
            anys = [jnp.any(b) for b in boxes]
            fields, metas, _, _, _ = _fat4_decode(vals)

            def make_leaf(first, box):
                def leaf_body(k, occ):
                    for tv in tri_fetch(first + k):
                        h, _, _, _ = _moller(tv, ox, oy, oz, dx, dy, dz, tmax)
                        occ = jnp.where(h & box, 1.0, occ)
                    return occ

                return leaf_body

            for k in range(4):
                is_leaf = (fields[k] > 0) & (fields[k] <= MAX_LEAF_FIELD)
                gate, first_local = gate_fn(metas[k], anys[k] & is_leaf)
                n_k = jnp.where(gate, fields[k], 0)
                occ = jax.lax.fori_loop(0, n_k, make_leaf(first_local, boxes[k]), occ)

            for k in range(4):
                ok = anys[k] & (fields[k] >= INNER_FIELD)
                sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
                stack_ref[sp_c] = metas[k]
                sp = jnp.where(ok, sp_c + 1, sp_c)
            done_all = jnp.all((occ > 0.0) | dead)
            return sp, occ, done_all

        init = (jnp.int32(1), jnp.zeros(ox.shape, jnp.float32), jnp.bool_(False))
        _, occ, _ = jax.lax.while_loop(cond, body, init)
        occ_out[:] = occ > 0.0

    return _any_fat4_kernel


_any_fat4_kernel = _make_any_fat4_kernel()


@partial(jax.jit, static_argnames=("interpret", "slot_range", "paged"))
def pallas_closest_hit_fat4(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False,
                            slot_range=None, paged: bool = False):
    """Closest hit over a pack_bvh_fat4 table (same contract as
    pallas_closest_hit).  `slot_range=(lo, hi)`: tri-chunked traversal --
    only leaves resident in the supplied tris table are intersected.
    `paged`: tri table stays in HBM with a one-block VMEM cache (no VMEM
    size ceiling; see _tri_groups_paged)."""
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _make_closest_fat4_kernel(slot_range, paged),
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["fat4nodes"], packed["tris"]],
        4, n_tiles, interpret, paged=paged,
    )
    return _unpack_hit(out, n)


@partial(jax.jit, static_argnames=("interpret", "slot_range", "paged"))
def pallas_any_hit_fat4(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False,
                        slot_range=None, paged: bool = False):
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _make_any_fat4_kernel(slot_range, paged),
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["fat4nodes"], packed["tris"]],
        1, n_tiles, interpret, paged=paged,
    )
    return out[:, 0].reshape(-1)[:n] > 0.0


@_lru_cache(maxsize=None)
def _make_combo_fat4_kernel(slot_range=None, paged=False):
    gate_fn = _leaf_gate(slot_range)

    def _combo_fat4_kernel(
        ox_ref, oy_ref, oz_ref,
        bx_ref, by_ref, bz_ref, tmaxb_ref,
        lx_ref, ly_ref, lz_ref, tmaxl_ref,
        fat_ref, tris_ref,
        t_out, tri_out, u_out, v_out, occ_out,
        stack_ref, *paged_scratch,
    ):
        """Fused shadow+bounce walk over a fat4 table (see _combo_fat_kernel);
        4 slots x 2 ray sets = 8 slab tests per visit, ~2x fewer visits."""
        tri_fetch = _paged_fetch(tris_ref, paged_scratch)
        ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
        bx, by, bz = bx_ref[:], by_ref[:], bz_ref[:]
        lx, ly, lz = lx_ref[:], ly_ref[:], lz_ref[:]
        ibx, iby, ibz = _safe_inv(bx), _safe_inv(by), _safe_inv(bz)
        ilx, ily, ilz = _safe_inv(lx), _safe_inv(ly), _safe_inv(lz)
        obx, oby, obz = ox * ibx, oy * iby, oz * ibz
        olx, oly, olz = ox * ilx, oy * ily, oz * ilz
        tmax_l = tmaxl_ref[:]
        pos_x = jnp.sum(jnp.sign(bx)) >= 0.0
        pos_y = jnp.sum(jnp.sign(by)) >= 0.0
        pos_z = jnp.sum(jnp.sign(bz)) >= 0.0

        stack_ref[0] = 0

        def cond(state):
            return state[0] > 0

        def body(state):
            sp, bt, btri, bu, bv, occ = state
            iid = stack_ref[sp - 1]
            sp = sp - 1
            vals = _fetch_row(fat_ref, iid, rows=29)
            cap_l = jnp.where(occ > 0.0, 0.0, tmax_l)
            boxes_b = [
                _slab_test(vals, obx, oby, obz, ibx, iby, ibz, bt, off=6 * k) for k in range(4)
            ]
            boxes_l = [
                _slab_test(vals, olx, oly, olz, ilx, ily, ilz, cap_l, off=6 * k)
                for k in range(4)
            ]
            anys = [jnp.any(b | s) for b, s in zip(boxes_b, boxes_l)]
            fields, metas, om_s, om_l, om_r = _fat4_decode(vals)

            def make_leaf(first, box_b, box_l):
                def leaf_body(k, carry):
                    bt, btri, bu, bv, occ = carry
                    for tv in tri_fetch(first + k):
                        hb, t, u, v = _moller(tv, ox, oy, oz, bx, by, bz, bt)
                        take = hb & box_b
                        tid = jnp.broadcast_to(tv[9:10, :], bt.shape)
                        bt = jnp.where(take, t, bt)
                        btri = jnp.where(take, tid, btri)
                        bu = jnp.where(take, u, bu)
                        bv = jnp.where(take, v, bv)
                        hl, _, _, _ = _moller(tv, ox, oy, oz, lx, ly, lz, tmax_l)
                        occ = jnp.where(hl & box_l, 1.0, occ)
                    return bt, btri, bu, bv, occ

                return leaf_body

            carry = (bt, btri, bu, bv, occ)
            for k in range(4):
                is_leaf = (fields[k] > 0) & (fields[k] <= MAX_LEAF_FIELD)
                gate, first_local = gate_fn(metas[k], anys[k] & is_leaf)
                n_k = jnp.where(gate, fields[k], 0)
                carry = jax.lax.fori_loop(
                    0, n_k, make_leaf(first_local, boxes_b[k], boxes_l[k]), carry
                )
            bt, btri, bu, bv, occ = carry

            ns = _near_first(om_s, pos_x, pos_y, pos_z)
            nl = _near_first(om_l, pos_x, pos_y, pos_z)
            nr = _near_first(om_r, pos_x, pos_y, pos_z)
            oks = [anys[k] & (fields[k] >= INNER_FIELD) for k in range(4)]
            idL_n = jnp.where(nl, metas[0], metas[1])
            idL_f = jnp.where(nl, metas[1], metas[0])
            okL_n = jnp.where(nl, oks[0], oks[1])
            okL_f = jnp.where(nl, oks[1], oks[0])
            idR_n = jnp.where(nr, metas[2], metas[3])
            idR_f = jnp.where(nr, metas[3], metas[2])
            okR_n = jnp.where(nr, oks[2], oks[3])
            okR_f = jnp.where(nr, oks[3], oks[2])
            push_ids = (
                jnp.where(ns, idR_f, idL_f),
                jnp.where(ns, idR_n, idL_n),
                jnp.where(ns, idL_f, idR_f),
                jnp.where(ns, idL_n, idR_n),
            )
            push_oks = (
                jnp.where(ns, okR_f, okL_f),
                jnp.where(ns, okR_n, okL_n),
                jnp.where(ns, okL_f, okR_f),
                jnp.where(ns, okL_n, okR_n),
            )
            for pid, pok in zip(push_ids, push_oks):
                sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
                stack_ref[sp_c] = pid
                sp = jnp.where(pok, sp_c + 1, sp_c)
            return sp, bt, btri, bu, bv, occ

        shape = ox.shape
        init = (
            jnp.int32(1),
            tmaxb_ref[:],
            jnp.full(shape, -1.0, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
            jnp.zeros(shape, jnp.float32),
        )
        _, bt, btri, bu, bv, occ = jax.lax.while_loop(cond, body, init)
        t_out[:] = bt
        tri_out[:] = jnp.round(btri).astype(jnp.int32)
        u_out[:] = bu
        v_out[:] = bv
        occ_out[:] = occ > 0.0

    return _combo_fat4_kernel


_combo_fat4_kernel = _make_combo_fat4_kernel()


@partial(jax.jit, static_argnames=("interpret", "slot_range", "paged"))
def pallas_shadow_closest_fat4(
    o, b, l, packed: dict, t_max_b=jnp.inf, t_max_l=jnp.inf, interpret: bool = False,
    slot_range=None, paged: bool = False,
):
    """Fused shadow+bounce traversal over a pack_bvh_fat4 table (same
    contract as pallas_shadow_closest_fat)."""
    rays_o, n_tiles, n = pack_rays(o, b)
    rays_l, _, _ = pack_rays(o, l)
    tmaxb = _tmax_tiles(t_max_b, n, n_tiles)
    tmaxl = _tmax_tiles(t_max_l, n, n_tiles)
    out = _packed_call(
        _make_combo_fat4_kernel(slot_range, paged),
        [rays_o["ox"], rays_o["oy"], rays_o["oz"],
         rays_o["dx"], rays_o["dy"], rays_o["dz"], tmaxb,
         rays_l["dx"], rays_l["dy"], rays_l["dz"], tmaxl],
        [packed["fat4nodes"], packed["tris"]],
        5, n_tiles, interpret, paged=paged,
    )
    return _unpack_hit(out, n), out[:, 4].reshape(-1)[:n] > 0.0


def _combo_fat_kernel(
    ox_ref, oy_ref, oz_ref,
    bx_ref, by_ref, bz_ref, tmaxb_ref,
    lx_ref, ly_ref, lz_ref, tmaxl_ref,
    fat_ref, tris_ref,
    t_out, tri_out, u_out, v_out, occ_out,
    stack_ref,
):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    bx, by, bz = bx_ref[:], by_ref[:], bz_ref[:]
    lx, ly, lz = lx_ref[:], ly_ref[:], lz_ref[:]
    ibx, iby, ibz = _safe_inv(bx), _safe_inv(by), _safe_inv(bz)
    ilx, ily, ilz = _safe_inv(lx), _safe_inv(ly), _safe_inv(lz)
    obx, oby, obz = ox * ibx, oy * iby, oz * ibz
    olx, oly, olz = ox * ilx, oy * ily, oz * ilz
    tmax_l = tmaxl_ref[:]
    # Near-child order follows the bounce direction (the closest-hit set);
    # the shadow set is any-hit and order-free.
    pos_x = jnp.sum(jnp.sign(bx)) >= 0.0
    pos_y = jnp.sum(jnp.sign(by)) >= 0.0
    pos_z = jnp.sum(jnp.sign(bz)) >= 0.0

    stack_ref[0] = 0

    def cond(state):
        return state[0] > 0

    def body(state):
        sp, bt, btri, bu, bv, occ = state
        iid = stack_ref[sp - 1]
        sp = sp - 1
        vals = _fetch_row(fat_ref, iid, rows=15)
        cap_l = jnp.where(occ > 0.0, 0.0, tmax_l)
        bl_b = _slab_test(vals, obx, oby, obz, ibx, iby, ibz, bt, off=0)
        br_b = _slab_test(vals, obx, oby, obz, ibx, iby, ibz, bt, off=6)
        bl_l = _slab_test(vals, olx, oly, olz, ilx, ily, ilz, cap_l, off=0)
        br_l = _slab_test(vals, olx, oly, olz, ilx, ily, ilz, cap_l, off=6)
        any_l = jnp.any(bl_b | bl_l)
        any_r = jnp.any(br_b | br_l)
        fl, ml, fr, mr, om = _fat_decode(vals)

        def make_leaf(first, box_b, box_l):
            def leaf_body(k, carry):
                bt, btri, bu, bv, occ = carry
                for tv in _tri_groups(tris_ref, first + k):
                    hb, t, u, v = _moller(tv, ox, oy, oz, bx, by, bz, bt)
                    take = hb & box_b
                    tid = jnp.broadcast_to(tv[9:10, :], bt.shape)
                    bt = jnp.where(take, t, bt)
                    btri = jnp.where(take, tid, btri)
                    bu = jnp.where(take, u, bu)
                    bv = jnp.where(take, v, bv)
                    hl, _, _, _ = _moller(tv, ox, oy, oz, lx, ly, lz, tmax_l)
                    occ = jnp.where(hl & box_l, 1.0, occ)
                return bt, btri, bu, bv, occ

            return leaf_body

        leaf_l = (fl > 0) & (fl <= MAX_LEAF_FIELD)
        leaf_r = (fr > 0) & (fr <= MAX_LEAF_FIELD)
        carry = (bt, btri, bu, bv, occ)
        carry = jax.lax.fori_loop(
            0, jnp.where(any_l & leaf_l, fl, 0), make_leaf(ml, bl_b, bl_l), carry
        )
        carry = jax.lax.fori_loop(
            0, jnp.where(any_r & leaf_r, fr, 0), make_leaf(mr, br_b, br_l), carry
        )
        bt, btri, bu, bv, occ = carry

        axis = jax.lax.div(om, 2)
        left_is_lower = jax.lax.rem(om, 2) > 0
        d_pos = jnp.where(axis == 0, pos_x, jnp.where(axis == 1, pos_y, pos_z))
        near_is_left = jnp.logical_not(jnp.logical_xor(d_pos, left_is_lower))
        ok_l = any_l & (fl >= INNER_FIELD)
        ok_r = any_r & (fr >= INNER_FIELD)
        near_id = jnp.where(near_is_left, ml, mr)
        far_id = jnp.where(near_is_left, mr, ml)
        near_ok = jnp.where(near_is_left, ok_l, ok_r)
        far_ok = jnp.where(near_is_left, ok_r, ok_l)
        sp_c = jnp.minimum(sp, STACK_DEPTH - 2)
        stack_ref[sp_c] = far_id
        sp1 = jnp.where(far_ok, sp_c + 1, sp_c)
        sp1 = jnp.minimum(sp1, STACK_DEPTH - 1)
        stack_ref[sp1] = near_id
        sp = jnp.where(near_ok, sp1 + 1, sp1)
        return sp, bt, btri, bu, bv, occ

    shape = ox.shape
    init = (
        jnp.int32(1),
        tmaxb_ref[:],
        jnp.full(shape, -1.0, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
        jnp.zeros(shape, jnp.float32),
    )
    _, bt, btri, bu, bv, occ = jax.lax.while_loop(cond, body, init)
    t_out[:] = bt
    tri_out[:] = jnp.round(btri).astype(jnp.int32)
    u_out[:] = bu
    v_out[:] = bv
    occ_out[:] = occ > 0.0


@partial(jax.jit, static_argnames=("interpret",))
def pallas_shadow_closest_fat(
    o, b, l, packed: dict, t_max_b=jnp.inf, t_max_l=jnp.inf, interpret: bool = False
):
    """One traversal for a closest-hit ray (o, b) and an any-hit ray (o, l)
    sharing the origin.  t_max_l <= 0 disables a lane's shadow ray; t_max_b
    <= 0 disables its bounce ray.  Returns (hit dict, occluded [N])."""
    rays_o, n_tiles, n = pack_rays(o, b)
    rays_l, _, _ = pack_rays(o, l)
    tmaxb = _tmax_tiles(t_max_b, n, n_tiles)
    tmaxl = _tmax_tiles(t_max_l, n, n_tiles)
    out = _packed_call(
        _combo_fat_kernel,
        [rays_o["ox"], rays_o["oy"], rays_o["oz"],
         rays_o["dx"], rays_o["dy"], rays_o["dz"], tmaxb,
         rays_l["dx"], rays_l["dy"], rays_l["dz"], tmaxl],
        [packed["fatnodes"], packed["tris"]],
        5, n_tiles, interpret,
    )
    return _unpack_hit(out, n), out[:, 4].reshape(-1)[:n] > 0.0


# ---------------------------------------------------------------------------
# Public entry points (same hit-record contract as tracer.trace)
# ---------------------------------------------------------------------------


def _ray_spec():
    return pl.BlockSpec((SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)


def _table_spec():
    # Whole table resident in VMEM, same for every grid step.
    return pl.BlockSpec(memory_space=pltpu.VMEM)


# ---------------------------------------------------------------------------
# Packed-operand calling convention.
#
# All ray components ride ONE [C*SUB, LANES] input block and all hit
# channels ride ONE [R*SUB, LANES] f32 output block (tri ids and occlusion
# flags are exact in f32: ids < 2^24).  The kernel bodies are unchanged --
# adapters present row slices of the packed blocks through the tiny ref
# protocol the bodies use (`ref[...]` read / write of the full tile).
#
# Measurement note that motivated this and turned out to matter more than
# the packing itself: pallas_call dispatched EAGERLY (outside jit) runs up
# to 6x slower than the identical call inside jit (fat4 combo: 1084 ms
# eager vs 178 ms jitted at 2M rays/139k tris; the gap grows with operand
# count).  Every public wrapper here is therefore jitted, and any
# microbenchmark of these kernels MUST go through jit or it measures the
# eager penalty, not the kernel (this poisoned several earlier perf-notes
# comparisons, including the first fat4-combo measurements).
# ---------------------------------------------------------------------------


class _PackedIn:
    """Row slice of the packed input block, posing as an input ref."""

    def __init__(self, rows):
        self._rows = rows

    def __getitem__(self, idx):
        return self._rows


class _PackedOut:
    """Row range of the packed f32 output block, posing as an output ref."""

    def __init__(self, ref, lo):
        self._ref, self._lo = ref, lo

    def __setitem__(self, idx, val):
        self._ref[self._lo : self._lo + SUB] = val.astype(jnp.float32)


def _pack_ray_block(comps, n_tiles):
    """C arrays of [n_tiles*SUB, LANES] -> [n_tiles*C*SUB, LANES], tile-major
    (tile i's C components contiguous) so one BlockSpec row window covers a
    packet's full ray state."""
    c = len(comps)
    stacked = jnp.stack([x.reshape(n_tiles, SUB, LANES) for x in comps], axis=1)
    return stacked.reshape(n_tiles * c * SUB, LANES)


def _packed_call(body, comps, tables, n_out, n_tiles, interpret, paged=False):
    """Run a traversal kernel body under the packed-operand convention.

    body's positional contract: (*input refs, *table refs, *output refs,
    stack scratch[, paged scratch]); returns [n_tiles, n_out, SUB*LANES]
    f32.  With `paged`, the LAST table (the tri table) stays in HBM
    (memory_space=ANY) and the kernel gets a one-block VMEM cache +
    resident id + DMA semaphore (see _tri_groups_paged)."""
    n_comp = len(comps)
    blk = _pack_ray_block(comps, n_tiles)
    rspec = pl.BlockSpec((n_comp * SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((n_out * SUB, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)

    def kern(rays_ref, *rest):
        if paged:
            *table_refs, out_ref, stack_ref, tri_buf, res_ref, sem = rest
            scratch = (stack_ref, tri_buf, res_ref, sem)
        else:
            *table_refs, out_ref, stack_ref = rest
            scratch = (stack_ref,)
        r = rays_ref[:]
        ins = [_PackedIn(r[i * SUB : (i + 1) * SUB]) for i in range(n_comp)]
        outs = [_PackedOut(out_ref, i * SUB) for i in range(n_out)]
        body(*ins, *table_refs, *outs, *scratch)

    table_specs = [_table_spec()] * len(tables)
    scratch_shapes = [pltpu.SMEM((STACK_DEPTH,), jnp.int32)]
    if paged:
        assert tables[-1].shape[0] % PAGE_TILES == 0, (
            "paged tri table must be padded to PAGE_TILES blocks "
            "(pad_tris_for_paging)"
        )
        table_specs[-1] = pl.BlockSpec(memory_space=pl.ANY)
        scratch_shapes += [
            pltpu.VMEM(
                (PAGE_WAYS * PAGE_TILES,) + tuple(tables[-1].shape[1:]), jnp.float32
            ),
            pltpu.SMEM((PAGE_WAYS,), jnp.int32),
            pltpu.SemaphoreType.DMA(()),
        ]
    # Mosaic's default VMEM budget is only the ~16 MB *scoped* limit; the
    # physical VMEM on v5e is 128 MB (verified: 100 MB resident buffers
    # compile and run).  Tables past the default budget raise the limit
    # explicitly so Sponza-and-beyond scenes stay resident instead of
    # chunking (kernel working set = tables + a few ray/out blocks + stack).
    resident_bytes = sum(
        0 if (paged and i == len(tables) - 1) else t.size * t.dtype.itemsize
        for i, t in enumerate(tables)
    )
    params = {}
    if resident_bytes > 12 * 1024 * 1024:
        params["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=min(resident_bytes + 8 * 1024 * 1024, VMEM_HARD_CAP)
        )
    out = pl.pallas_call(
        kern,
        grid=(n_tiles,),
        in_specs=[rspec] + table_specs,
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * n_out * SUB, LANES), jnp.float32),
        scratch_shapes=scratch_shapes,
        interpret=interpret,
        **params,
    )(blk, *tables)
    return out.reshape(n_tiles, n_out, SUB * LANES)


def _unpack_hit(out, n):
    """Packed [n_tiles, 4, SUB*LANES] -> hit-record dict."""
    t = out[:, 0].reshape(-1)[:n]
    tri = jnp.round(out[:, 1]).astype(jnp.int32).reshape(-1)[:n]
    u = out[:, 2].reshape(-1)[:n]
    v = out[:, 3].reshape(-1)[:n]
    found = tri >= 0
    return {"t": jnp.where(found, t, jnp.inf), "tri": tri, "u": u, "v": v}


def _tmax_tiles(t_max, n, n_tiles):
    """Scalar or per-ray [N] t_max -> [tiles*SUB, LANES] (pad lanes capped 0)."""
    arr = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (n,))
    pad = n_tiles * TILE - n
    if pad:
        arr = jnp.concatenate([arr, jnp.zeros(pad, jnp.float32)])
    return arr.reshape(n_tiles * SUB, LANES)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_closest_hit(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    """o, d: [N, 3]. packed: pack_bvh_for_pallas output (device arrays).
    t_max: scalar or per-ray [N] cap (chunk chaining passes running best-t).

    Returns dict(t, tri, u, v); tri in original ids, -1 = miss, t = +inf."""
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _closest_kernel,
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["nodes"], packed["tris"]],
        4, n_tiles, interpret,
    )
    return _unpack_hit(out, n)


@partial(jax.jit, static_argnames=("interpret",))
def pallas_any_hit(o, d, packed: dict, t_max=jnp.inf, interpret: bool = False):
    rays, n_tiles, n = pack_rays(o, d)
    tmax = _tmax_tiles(t_max, n, n_tiles)
    out = _packed_call(
        _any_kernel,
        [rays["ox"], rays["oy"], rays["oz"], rays["dx"], rays["dy"], rays["dz"], tmax],
        [packed["nodes"], packed["tris"]],
        1, n_tiles, interpret,
    )
    return out[:, 0].reshape(-1)[:n] > 0.0


def _chunk_closest(o, d, c, t_max, interpret):
    if "fat4nodes" in c:
        fn = pallas_closest_hit_fat4
    elif "fatnodes" in c:
        fn = pallas_closest_hit_fat
    else:
        fn = pallas_closest_hit
    return fn(o, d, c, t_max=t_max, interpret=interpret)


def _chunk_any(o, d, c, t_max, interpret):
    if "fat4nodes" in c:
        fn = pallas_any_hit_fat4
    elif "fatnodes" in c:
        fn = pallas_any_hit_fat
    else:
        fn = pallas_any_hit
    return fn(o, d, c, t_max=t_max, interpret=interpret)


def pallas_shadow_closest_chunks(
    o, b, l, chunks: list, t_max_b=jnp.inf, t_max_l=jnp.inf, interpret: bool = False
):
    """Combined shadow+bounce traversal over BVH chunks: closest-hit caps
    tighten and occluded lanes' shadow caps drop to 0 between passes.
    Falls back to the separate kernels on non-fat (single-leaf) chunks."""
    n = o.shape[0]
    tb = jnp.broadcast_to(jnp.asarray(t_max_b, jnp.float32), (n,))
    tl = jnp.broadcast_to(jnp.asarray(t_max_l, jnp.float32), (n,))
    best = None
    occ = jnp.zeros(n, bool)
    for c in chunks:
        cap_b = tb if best is None else jnp.minimum(best["t"], tb)
        cap_l = jnp.where(occ, 0.0, tl)
        if "fat4nodes" in c:
            hit, o2 = pallas_shadow_closest_fat4(
                o, b, l, c, t_max_b=cap_b, t_max_l=cap_l, interpret=interpret
            )
        elif "fatnodes" in c:
            hit, o2 = pallas_shadow_closest_fat(
                o, b, l, c, t_max_b=cap_b, t_max_l=cap_l, interpret=interpret
            )
        else:
            hit = pallas_closest_hit(o, b, c, t_max=cap_b, interpret=interpret)
            o2 = pallas_any_hit(o, l, c, t_max=cap_l, interpret=interpret)
        occ = occ | o2
        if best is None:
            best = hit
        else:
            take = hit["tri"] >= 0
            best = {
                "t": jnp.where(take, hit["t"], best["t"]),
                "tri": jnp.where(take, hit["tri"], best["tri"]),
                "u": jnp.where(take, hit["u"], best["u"]),
                "v": jnp.where(take, hit["v"], best["v"]),
            }
    return best, occ


def pallas_closest_chunks(o, d, chunks: list, t_max=jnp.inf, interpret: bool = False):
    """Closest hit over VMEM-sized BVH chunks (pack_bvh_chunks).

    Sequential chunk passes with tightening per-ray t caps: each pass can
    only beat the running best, so a plain take-if-hit merge is exact.  Table
    DMA is once per chunk per call (whole-table VMEM spec); rays that miss a
    chunk's root AABB cost one slab test."""
    best = _chunk_closest(o, d, chunks[0], t_max, interpret)
    for c in chunks[1:]:
        cap = jnp.minimum(best["t"], t_max)
        hit = _chunk_closest(o, d, c, cap, interpret)
        take = hit["tri"] >= 0
        best = {
            "t": jnp.where(take, hit["t"], best["t"]),
            "tri": jnp.where(take, hit["tri"], best["tri"]),
            "u": jnp.where(take, hit["u"], best["u"]),
            "v": jnp.where(take, hit["v"], best["v"]),
        }
    return best


def pallas_any_chunks(o, d, chunks: list, t_max=jnp.inf, interpret: bool = False):
    """Any-hit over BVH chunks: occluded rays are ejected to DEAD_RAY_ORIGIN
    between passes so their tiles retire on the next chunk's root test."""
    occ = _chunk_any(o, d, chunks[0], t_max, interpret)
    for c in chunks[1:]:
        o_live = jnp.where(occ[:, None], jnp.float32(10.0 * DEAD_RAY_ORIGIN), o)
        occ = occ | _chunk_any(o_live, d, c, t_max, interpret)
    return occ
