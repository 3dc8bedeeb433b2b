"""Ray sorting for packet coherence (wavefront compaction, TPU-style).

Packet traversal (kernels.pallas_trace) is fast exactly when the 1024 rays
of a tile want the same nodes.  Primary and shadow tiles are coherent by
construction; diffuse bounce rays are not -- profiling shows bounce-2/3
traversals cost ~10x bounce-0.  The classic wavefront fix is to sort rays by
(direction octant, quantized origin Morton code) each bounce.

TPU twist: permuting arrays with gathers would cost more than it saves
(~10 GB/s); instead the rays are carried *through* `jax.lax.sort` as extra
operands of one multi-key sort (vectorized bitonic network, no gathers), and
hits are un-sorted the same way using the captured permutation as the key.

Dead lanes (terminated paths) are given key MAX so they cluster into tail
tiles, and callers additionally eject them to a far-away origin so their
tiles exit traversal on the root test (see passes.pathtrace).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DEAD_ORIGIN = 1.0e14  # far outside any scene AABB: root slab test misses


def _morton3(x, y, z):
    """Interleave 3x 7-bit ints -> 21-bit Morton code (bit-by-bit, vector ops)."""
    code = jnp.zeros_like(x)
    for bit in range(7):
        code = code | (((x >> bit) & 1) << (3 * bit))
        code = code | (((y >> bit) & 1) << (3 * bit + 1))
        code = code | (((z >> bit) & 1) << (3 * bit + 2))
    return code


def ray_sort_key(o, d, aabb_min, aabb_max, alive=None):
    """uint32 sort key: [1 dead][3 dir octant][21 origin morton][7 dir bits]."""
    ext = jnp.maximum(aabb_max - aabb_min, 1e-6)
    q = jnp.clip((o - aabb_min) / ext, 0.0, 1.0)
    qi = (q * 127.0).astype(jnp.int32)
    morton = _morton3(qi[:, 0], qi[:, 1], qi[:, 2])
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    # secondary direction bits: dominant-axis angle bucket
    dir_bits = (jnp.clip((d[:, 1] * 0.5 + 0.5), 0.0, 1.0) * 127.0).astype(jnp.int32)
    key = (octant << 28) | (morton << 7) | dir_bits
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(0x7FFFFFFF))
    return key


def sorted_trace(trace_fn, o, d, key, extra_outputs: tuple[str, ...]):
    """Run trace_fn on rays sorted by `key`, return hits in original order.

    trace_fn(o, d) -> dict with [N]-shaped float/int arrays named in
    extra_outputs.  Sorting rides lax.sort operands both ways (no gathers).
    """
    n = o.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    key_s, perm, ox, oy, oz, dx, dy, dz = jax.lax.sort(
        (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]), num_keys=1
    )
    os = jnp.stack([ox, oy, oz], axis=-1)
    ds = jnp.stack([dx, dy, dz], axis=-1)
    hit = trace_fn(os, ds)
    outs = [hit[name] for name in extra_outputs]
    unsorted = jax.lax.sort((perm, *outs), num_keys=1)[1:]
    return dict(zip(extra_outputs, unsorted))


def sorted_closest(closest_fn, o, d, key):
    out = sorted_trace(closest_fn, o, d, key, ("t", "tri", "u", "v"))
    return out


def sorted_any(any_fn, o, d, key):
    def fn(os, ds):
        return {"occ": any_fn(os, ds).astype(jnp.int32)}

    out = sorted_trace(fn, o, d, key, ("occ",))
    return out["occ"] > 0


def sorted_shadow_closest(any_fn, closest_fn, o, shoot, l, alive, b, key, combo_fn=None):
    """Shadow + bounce trace under ONE shared sort permutation.

    At a path vertex the NEE shadow ray and the indirect bounce ray share the
    same origin, so one sort (keyed for the bounce ray: octant + origin
    Morton) serves both -- shadow packets stay coherent under any
    origin-local permutation because every shadow ray points at the sun disk.
    Halves the per-bounce lax.sort rounds vs sorting each trace separately.

    When `combo_fn(o, b, l, t_max_b, t_max_l) -> (hit, occ)` is given (the
    fused Pallas kernel), BOTH rays ride one traversal of the union of their
    node sets -- the deep root->origin descent is shared instead of repeated.

    o [N,3] true origins; shoot [N] shadow-live mask; l [N,3] shadow dirs;
    alive [N] bounce-live mask; b [N,3] bounce dirs.  Returns
    (occluded [N], hit dict) in original ray order."""
    n = o.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    (key_s, perm, shoot_s, ox, oy, oz, lx, ly, lz, bx, by, bz) = jax.lax.sort(
        (key, idx, shoot.astype(jnp.int32),
         o[:, 0], o[:, 1], o[:, 2], l[:, 0], l[:, 1], l[:, 2],
         b[:, 0], b[:, 1], b[:, 2]),
        num_keys=1,
    )
    os = jnp.stack([ox, oy, oz], axis=-1)
    alive_s = key_s != jnp.int32(0x7FFFFFFF)
    if combo_fn is not None:
        t_b = jnp.where(alive_s, jnp.inf, 0.0)
        t_l = jnp.where(shoot_s > 0, jnp.inf, 0.0)
        hit, occ_b = combo_fn(
            os, jnp.stack([bx, by, bz], axis=-1), jnp.stack([lx, ly, lz], axis=-1), t_b, t_l
        )
        occ = occ_b.astype(jnp.int32)
    else:
        o_shadow = jnp.where((shoot_s > 0)[:, None], os, DEAD_ORIGIN)
        o_bounce = jnp.where(alive_s[:, None], os, DEAD_ORIGIN)
        occ = any_fn(o_shadow, jnp.stack([lx, ly, lz], axis=-1)).astype(jnp.int32)
        hit = closest_fn(o_bounce, jnp.stack([bx, by, bz], axis=-1))
    _, occ_u, t, tri, u, v = jax.lax.sort(
        (perm, occ, hit["t"], hit["tri"], hit["u"], hit["v"]), num_keys=1
    )
    return occ_u > 0, {"t": t, "tri": tri, "u": u, "v": v}
