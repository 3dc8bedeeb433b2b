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
DEAD_KEY = 0x7FFFFFFF  # sort key for non-participating lanes (clusters at tail)

import os as _os

# Debug: fixed compaction bucket n/k, bypassing the live-count lax.switch
# (see sorted_shadow_closest) -- for measuring conditional overhead.
# NOT exact when live lanes exceed the fixed bucket, and it has NO effect on
# the segment-local path (segments > 1); microbench use only.
_FIXED_BUCKET = int(_os.environ.get("NEB_FIXED_BUCKET", "0"))
if _FIXED_BUCKET:  # pragma: no cover - debug knob
    import warnings as _warnings

    _warnings.warn(
        f"NEB_FIXED_BUCKET={_FIXED_BUCKET}: compaction bucket is pinned to "
        "n/{0} -- results are INEXACT when live lanes exceed the bucket, and "
        "the knob is ignored by the segment-local (sort_segments>1) path. "
        "Microbenchmark use only.".format(_FIXED_BUCKET),
        stacklevel=2,
    )

_warned_seg_fallback = False


def _segment_fallback_warn(n: int, segments: int) -> None:
    """Log (once) when a segments>1 call falls back to the global sort --
    on a sharded mesh that silently reintroduces the wavefront all-gather
    the segment-local path exists to remove (dist/stats.py would otherwise
    be the only signal)."""
    global _warned_seg_fallback
    if _warned_seg_fallback:
        return
    _warned_seg_fallback = True
    from nebulae_tpu.utils.logging import log_warn

    log_warn(
        f"sort_segments={segments} does not divide the {n}-lane wavefront "
        "(or leaves <2 lanes/segment); falling back to the GLOBAL sort. On "
        "a sharded mesh this re-introduces cross-shard all-gathers per "
        "bounce -- pick a resolution whose pixel count divides the mesh size."
    )

# Live-lane compaction: after the sort, participating lanes form a prefix, so
# the traversal runs on the smallest static slice that covers them (XLA needs
# static shapes -> a lax.switch over a few power-of-4 bucket sizes) and the
# tail is padded with miss records.  On the open bench scene only ~18% of
# lanes survive bounce 0 and <1% survive bounce 1, so bounces 2-3 dispatch
# 1/64th of the tiles.  Exact: sliced-away lanes are dead-key lanes whose
# traversal previously retired on the root test and returned a miss anyway.
COMPACT_FRACTIONS = (64, 16, 4, 1)  # divisors of N, smallest bucket first


def _bucket_sizes(n: int):
    sizes = sorted({max(-(-n // f), 1024) for f in COMPACT_FRACTIONS})
    return [min(s, n) for s in sizes]


def _frac_to_bucket(frac: int, n: int) -> int:
    """Static bucket size for fraction divisor `frac` of an n-lane domain
    (same clamping as _bucket_sizes; frac <= 1 = full width)."""
    if frac <= 1:
        return n
    return min(max(-(-n // int(frac)), 1024), n)


def _scatter_unsort(b: int, n: int) -> bool:
    """Unsort strategy per bucket: True -> scatter the [b]-prefix results back
    to ray order (`.at[perm[:b]].set`), False -> carry them through a
    full-width lax.sort keyed on perm.  Scatter cost scales with b (~116 ns/
    row measured), sort cost with n (~3 ms/operand at 2M lanes); crossover
    sits near b = n/32, so only the smallest compaction buckets scatter."""
    return b * 32 <= n


def _pad_tail(x, n: int, fill):
    b = x.shape[0]
    if b == n:
        return x
    return jnp.concatenate([x, jnp.full((n - b,) + x.shape[1:], fill, x.dtype)])


def _morton3(x, y, z):
    """Interleave 3x 7-bit ints -> 21-bit Morton code (bit-by-bit, vector ops)."""
    code = jnp.zeros_like(x)
    for bit in range(7):
        code = code | (((x >> bit) & 1) << (3 * bit))
        code = code | (((y >> bit) & 1) << (3 * bit + 1))
        code = code | (((z >> bit) & 1) << (3 * bit + 2))
    return code


def ray_sort_key(o, d, aabb_min, aabb_max, alive=None, low_bits=None):
    """int32 sort key: [1 dead][3 dir octant][21 origin morton][5 dir][2 low].

    `low_bits` (values 0..3) ride the key's lowest bits -- lax.sort cost
    grows with operand count at 2M lanes, so per-lane flags (the shadow/
    bounce masks) are packed into the key instead of carried as an extra
    operand.  They only tie-break identical (octant, morton, dir) keys, so
    packet coherence is unchanged."""
    ext = jnp.maximum(aabb_max - aabb_min, 1e-6)
    q = jnp.clip((o - aabb_min) / ext, 0.0, 1.0)
    qi = (q * 127.0).astype(jnp.int32)
    morton = _morton3(qi[:, 0], qi[:, 1], qi[:, 2])
    octant = (
        (d[:, 0] >= 0).astype(jnp.int32)
        + 2 * (d[:, 1] >= 0).astype(jnp.int32)
        + 4 * (d[:, 2] >= 0).astype(jnp.int32)
    )
    # secondary direction bits: dominant-axis angle bucket (max 30, so a
    # live key can never collide with DEAD_KEY = all-ones)
    dir_bits = (jnp.clip((d[:, 1] * 0.5 + 0.5), 0.0, 1.0) * 30.0).astype(jnp.int32)
    key = (octant << 28) | (morton << 7) | (dir_bits << 2)
    if low_bits is not None:
        key = key | low_bits
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(DEAD_KEY))
    return key


_MISS_FILL = {"t": jnp.inf, "tri": -1, "u": 0.0, "v": 0.0, "occ": 0}


def _sorted_trace_seg(trace_fn, o, d, key, extra_outputs, compact, S: int,
                      static_bucket_frac: int | None = None):
    """Segment-local sorted_trace (see _sorted_shadow_closest_seg)."""
    n = o.shape[0]
    m = n // S
    key2 = key.reshape(S, m)
    idx2 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (S, m))
    key_s, perm = jax.lax.sort((key2, idx2), dimension=1, num_keys=2)
    rows = jnp.concatenate([o, d], axis=-1).reshape(S, m, 6)

    def run(nb: int):
        if nb == m:
            comps = [x.reshape(S, m) for x in
                     (o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2])]
            srt = jax.lax.sort((key2, idx2, *comps), dimension=1, num_keys=2)
            os = jnp.stack(srt[2:5], axis=-1).reshape(n, 3)
            ds = jnp.stack(srt[5:8], axis=-1).reshape(n, 3)
        else:
            r = jnp.take_along_axis(rows, perm[:, :nb, None], axis=1).reshape(S * nb, 6)
            os, ds = r[:, 0:3], r[:, 3:6]
        hit = trace_fn(os, ds)
        if _scatter_unsort(S * nb, n):
            return tuple(
                jnp.full((S, m), _MISS_FILL.get(name, 0), hit[name].dtype)
                .at[jnp.arange(S, dtype=jnp.int32)[:, None], perm[:, :nb]]
                .set(hit[name].reshape(S, nb), mode="drop", unique_indices=True)
                .reshape(n)
                for name in extra_outputs
            )
        padded = tuple(
            jnp.pad(
                hit[name].reshape(S, nb), ((0, 0), (0, m - nb)),
                constant_values=_MISS_FILL.get(name, 0),
            )
            if nb != m
            else hit[name].reshape(S, m)
            for name in extra_outputs
        )
        srt = jax.lax.sort((perm, *padded), dimension=1, num_keys=1)[1:]
        return tuple(x.reshape(n) for x in srt)

    if static_bucket_frac is not None and compact:
        # Frame-lagged static bucket: no data-dependent switch (the caller
        # scheduled this vertex's bucket from the previous frame's live
        # counts -- engine.renderer bucket scheduling).
        outs = run(_frac_to_bucket(static_bucket_frac, m))
    else:
        sizes = _bucket_sizes(m) if compact else [m]
        if len(sizes) > 1:
            live_per_seg = jnp.sum((key2 != jnp.int32(DEAD_KEY)).astype(jnp.int32), axis=1)
            n_live = live_per_seg.max()
            sel = sum((n_live > s).astype(jnp.int32) for s in sizes[:-1])
            outs = jax.lax.switch(sel, [lambda nb=nb: run(nb) for nb in sizes])
        else:
            outs = run(m)
    return dict(zip(extra_outputs, outs))


def sorted_trace(trace_fn, o, d, key, extra_outputs: tuple[str, ...], compact: bool = True,
                 segments: int = 1, static_bucket_frac: int | None = None):
    """Run trace_fn on rays sorted by `key`, return hits in original order.

    trace_fn(o, d) -> dict with [N]-shaped float/int arrays named in
    extra_outputs.  Sorting rides lax.sort operands both ways (no gathers).
    With `compact`, the trace runs on the live-lane prefix only (see
    COMPACT_FRACTIONS); dead-key lanes get miss records.  `segments` > 1 =
    segment-local sort/compact/unsort (shard-alignable).
    `static_bucket_frac` pins the compaction bucket to n/frac statically
    (no live-count lax.switch); live lanes beyond the bucket get miss
    records, so the caller must schedule a covering fraction (frame-lagged
    bucket scheduling, engine.renderer).
    """
    n = o.shape[0]
    if segments > 1:
        if n % segments == 0 and n // segments >= 2:
            return _sorted_trace_seg(trace_fn, o, d, key, extra_outputs, compact,
                                     int(segments), static_bucket_frac)
        _segment_fallback_warn(n, segments)
    idx = jnp.arange(n, dtype=jnp.int32)
    # Narrow sort + prefix row gather (see sorted_shadow_closest).  Both
    # sorts key on (key, idx) so their total order is identical (idx is
    # unique; lax.sort tie order is otherwise unspecified).
    key_s, perm = jax.lax.sort((key, idx), num_keys=2)
    rows = jnp.concatenate([o, d], axis=-1)  # [N, 6]

    def run(b: int):
        if b == n:
            # Full width: carrying the rays through the sort beats a full
            # N-row gather.
            srt = jax.lax.sort(
                (key, idx, o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2]),
                num_keys=2,
            )
            os = jnp.stack(srt[2:5], axis=-1)
            ds = jnp.stack(srt[5:8], axis=-1)
        else:
            r = jnp.take(rows, perm[:b], axis=0)
            os, ds = r[:, 0:3], r[:, 3:6]
        hit = trace_fn(os, ds)
        # Unsort INSIDE the branch so each bucket picks the cheap direction:
        # tiny prefixes scatter their rows back to ray order (cost scales
        # with b); larger ones ride the full-width multi-operand sort.
        if _scatter_unsort(b, n):
            return tuple(
                jnp.full((n,), _MISS_FILL.get(name, 0), hit[name].dtype)
                .at[perm[:b]]
                .set(hit[name], mode="drop", unique_indices=True)
                for name in extra_outputs
            )
        padded = tuple(
            _pad_tail(hit[name], n, _MISS_FILL.get(name, 0)) for name in extra_outputs
        )
        return jax.lax.sort((perm, *padded), num_keys=1)[1:]

    if static_bucket_frac is not None and compact:
        outs = run(_frac_to_bucket(static_bucket_frac, n))
    else:
        sizes = _bucket_sizes(n) if compact else [n]
        if len(sizes) > 1:
            n_live = jnp.sum((key != jnp.int32(DEAD_KEY)).astype(jnp.int32))
            sel = sum((n_live > s).astype(jnp.int32) for s in sizes[:-1])
            outs = jax.lax.switch(sel, [lambda b=b: run(b) for b in sizes])
        else:
            outs = run(n)
    return dict(zip(extra_outputs, outs))


def sorted_closest(closest_fn, o, d, key):
    out = sorted_trace(closest_fn, o, d, key, ("t", "tri", "u", "v"))
    return out


def sorted_any(any_fn, o, d, key, segments: int = 1, static_bucket_frac: int | None = None):
    def fn(os, ds):
        return {"occ": any_fn(os, ds).astype(jnp.int32)}

    out = sorted_trace(fn, o, d, key, ("occ",), segments=segments,
                       static_bucket_frac=static_bucket_frac)
    return out["occ"] > 0


def _sorted_shadow_closest_seg(any_fn, closest_fn, o, l, b, key, S: int,
                               combo_fn, compact, scatter_ok, compact_post,
                               post_fills, static_bucket_frac=None):
    """Segment-local variant of sorted_shadow_closest: rays sort/compact/
    unsort within S independent contiguous segments ([S, N/S] operations
    along axis 1 only).

    With segments aligned to a row-sharded device mesh (segments == shards,
    dist.runner), every sort, compaction gather, and unsort partitions
    SHARD-LOCALLY -- the XLA SPMD partitioner keeps batch-dim-sharded sorts
    and batched gathers/scatters on-device, so the wavefront stops riding
    all-gathers (the scaling hazard dist/stats.py detects for the global
    sort).  The only cross-shard traffic is the scalar max of per-segment
    live counts choosing the shared static bucket.

    Exactness: identical per-ray results to the global sort (traversal is
    per-lane exact regardless of packet composition; compaction only skips
    dead lanes).  Efficiency: the shared bucket covers the BUSIEST segment,
    so liveness imbalance across segments wastes some tiles -- single-chip
    runs keep segments=1."""
    n = o.shape[0]
    m = n // S
    post_names: tuple = ()
    if compact_post is not None:
        post_fills = dict(post_fills or {})
    key2 = key.reshape(S, m)
    idx2 = jnp.broadcast_to(jnp.arange(m, dtype=jnp.int32), (S, m))
    key_s, perm = jax.lax.sort((key2, idx2), dimension=1, num_keys=2)
    rows = jnp.concatenate([o, l, b], axis=-1).reshape(S, m, 9)
    participate_s = key_s != jnp.int32(DEAD_KEY)
    shoot_s = ((key_s & 1) > 0) & participate_s
    alive_s = ((key_s & 2) > 0) & participate_s

    def run(nb: int):
        if nb == m:
            comps = [x.reshape(S, m) for x in
                     (o[:, 0], o[:, 1], o[:, 2], l[:, 0], l[:, 1], l[:, 2],
                      b[:, 0], b[:, 1], b[:, 2])]
            srt = jax.lax.sort((key2, idx2, *comps), dimension=1, num_keys=2)
            os = jnp.stack(srt[2:5], axis=-1).reshape(n, 3)
            ls = jnp.stack(srt[5:8], axis=-1).reshape(n, 3)
            bs = jnp.stack(srt[8:11], axis=-1).reshape(n, 3)
        else:
            r = jnp.take_along_axis(rows, perm[:, :nb, None], axis=1)
            r = r.reshape(S * nb, 9)
            os, ls, bs = r[:, 0:3], r[:, 3:6], r[:, 6:9]
        alive_f = alive_s[:, :nb].reshape(-1)
        shoot_f = shoot_s[:, :nb].reshape(-1)
        t_b = jnp.where(alive_f, jnp.inf, 0.0)
        t_l = jnp.where(shoot_f, jnp.inf, 0.0)
        if combo_fn is not None:
            hit, occ_b = combo_fn(os, bs, ls, t_b, t_l)
            occ = occ_b.astype(jnp.int32)
        else:
            o_shadow = jnp.where(shoot_f[:, None], os, DEAD_ORIGIN)
            o_bounce = jnp.where(alive_f[:, None], os, DEAD_ORIGIN)
            occ = any_fn(o_shadow, ls).astype(jnp.int32)
            hit = closest_fn(o_bounce, bs)
        if compact_post is not None:
            extras = compact_post(hit, os, bs)
            nonlocal post_names
            post_names = tuple(sorted(extras))
            id_occ = (jnp.round(extras.pop("mat")).astype(jnp.int32) + 1) * 2 + occ
            chans = [("id_occ", id_occ, 0.0), ("t", hit["t"], jnp.inf)]
            chans += [(k, extras[k], float(post_fills.get(k, 0.0)))
                      for k in post_names if k != "mat"]
        else:
            id_occ = (hit["tri"] + 1) * 2 + occ
            chans = [("id_occ", id_occ, 0.0),
                     ("t", hit["t"], jnp.inf),
                     ("u", hit["u"], 0.0), ("v", hit["v"], 0.0)]
        if scatter_ok and _scatter_unsort(S * nb, n):
            live_rows = jnp.stack(
                [c.astype(jnp.float32) for _, c, _ in chans], axis=-1
            ).reshape(S, nb, len(chans))
            base = jnp.tile(
                jnp.asarray([f for _, _, f in chans], jnp.float32), (S, m, 1)
            )
            out = base.at[
                jnp.arange(S, dtype=jnp.int32)[:, None], perm[:, :nb]
            ].set(live_rows, mode="drop", unique_indices=True)
            out = out.reshape(n, len(chans))
            return (out[:, 0].astype(jnp.int32),) + tuple(
                out[:, i] for i in range(1, len(chans))
            )
        padded = tuple(
            jnp.pad(c.reshape(S, nb), ((0, 0), (0, m - nb)), constant_values=f)
            if nb != m
            else c.reshape(S, m)
            for _, c, f in chans
        )
        srt = jax.lax.sort((perm, *padded), dimension=1, num_keys=1)[1:]
        return tuple(x.reshape(n) for x in srt)

    if static_bucket_frac is not None and compact:
        # Frame-lagged static bucket (shared across segments): no switch.
        outs = run(_frac_to_bucket(static_bucket_frac, m))
    else:
        sizes = _bucket_sizes(m) if compact else [m]
        if len(sizes) > 1:
            # Shared static bucket = the busiest segment's live count (a scalar
            # max-reduce -- the only cross-segment communication).
            live_per_seg = jnp.sum((key2 != jnp.int32(DEAD_KEY)).astype(jnp.int32), axis=1)
            n_live = live_per_seg.max()
            sel = sum((n_live > s).astype(jnp.int32) for s in sizes[:-1])
            outs = jax.lax.switch(sel, [lambda nb=nb: run(nb) for nb in sizes])
        else:
            outs = run(m)
    id_occ, t = outs[0], outs[1]
    occluded = (id_occ & 1) > 0
    ids = (id_occ >> 1) - 1
    if compact_post is not None:
        hit = {"t": t, "mat": ids, "found": ids >= 0}
        names = [k for k in post_names if k != "mat"]
        hit.update({k: v for k, v in zip(names, outs[2:])})
        return occluded, hit
    return occluded, {"t": t, "tri": ids, "u": outs[2], "v": outs[3]}


def sorted_shadow_closest(any_fn, closest_fn, o, l, b, key, combo_fn=None,
                          compact: bool = True, num_tris: int | None = None,
                          compact_post=None, post_fills: dict | None = None,
                          segments: int = 1, static_bucket_frac: int | None = None):
    """Shadow + bounce trace under ONE shared sort permutation.

    At a path vertex the NEE shadow ray and the indirect bounce ray share the
    same origin, so one sort (keyed for the bounce ray: octant + origin
    Morton) serves both -- shadow packets stay coherent under any
    origin-local permutation because every shadow ray points at the sun disk.
    Halves the per-bounce lax.sort rounds vs sorting each trace separately.

    When `combo_fn(o, b, l, t_max_b, t_max_l) -> (hit, occ)` is given (the
    fused Pallas kernel), BOTH rays ride one traversal of the union of their
    node sets -- the deep root->origin descent is shared instead of repeated.

    The caller's `key` must mark a lane dead (DEAD_KEY) only when it neither
    bounces nor shoots a shadow ray (shoot can outlive the bounce mask since
    RR absorption kills the continuation but not the vertex's NEE), and must
    carry `low_bits = shoot + 2*alive` (ray_sort_key) -- the masks ride the
    key instead of costing a sort operand.  With `compact`, the traversal
    dispatches only the live-lane prefix (static bucket sizes via
    lax.switch; see COMPACT_FRACTIONS).

    o [N,3] true origins; l [N,3] shadow dirs; b [N,3] bounce dirs.
    `num_tris` (static scene triangle count) gates the scatter unsort: its
    tri_occ channel packs (tri+1)*2+occ into an f32, exact only below 2^24,
    so scenes past ~8.38M triangles route through the int-preserving
    sort-carry path instead (None = caller guarantees the range).

    `compact_post(hit, os, bs) -> dict[str, [nb] f32]` runs INSIDE the
    compacted sorted domain on the raw hit record (gathers there scale with
    the live count, not N) and its channels ride the same unsort as the hit
    -- the round-4 fix for the full-width per-bounce surface gather.  With
    it, the returned hit dict drops u/v/tri (consumed by compact_post) and
    gains the post channels; `post_fills` gives each channel's dead-lane
    fill (default 0).  Post channels are treated as non-differentiable
    (callers detach their inputs).

    `segments` > 1 routes to the segment-local variant (sorting/compaction/
    unsort within N/segments-lane segments; shard-aligned segments make the
    whole block partition locally on a device mesh -- see
    _sorted_shadow_closest_seg).  Must divide N; 1 = global (single-chip
    default).

    Returns (occluded [N], hit dict) in original ray order."""
    n = o.shape[0]
    scatter_ok = num_tris is None or (num_tris + 1) * 2 + 1 < (1 << 24)
    if segments > 1:
        if n % segments == 0 and n // segments >= 2:
            return _sorted_shadow_closest_seg(
                any_fn, closest_fn, o, l, b, key, int(segments), combo_fn,
                compact, scatter_ok, compact_post, post_fills,
                static_bucket_frac,
            )
        _segment_fallback_warn(n, segments)
    post_names: tuple = ()
    if compact_post is not None:
        post_fills = dict(post_fills or {})
    idx = jnp.arange(n, dtype=jnp.int32)
    # Narrow sort: only (key, idx) ride the 2M-lane sort (sort cost is per
    # operand); the 9 ray channels are fetched for the live prefix by ONE
    # [nb, 9] row gather instead -- gather cost scales with the live count,
    # so bounce 2-3's fetch is ~1/64th of a full-width sort carry.  The
    # full-width bucket carries rays through the sort instead (cheaper than
    # an N-row gather); idx is a second sort key so every branch orders
    # ties identically.
    key_s, perm = jax.lax.sort((key, idx), num_keys=2)
    rows = jnp.concatenate([o, l, b], axis=-1)  # [N, 9]
    # The shadow/bounce masks ride the key's low bits (ray_sort_key
    # low_bits); DEAD_KEY is all-ones, so gate on participation first.
    participate_s = key_s != jnp.int32(DEAD_KEY)
    shoot_s = ((key_s & 1) > 0) & participate_s
    alive_s = ((key_s & 2) > 0) & participate_s

    def run(nb: int):
        if nb == n:
            srt = jax.lax.sort(
                (key, idx,
                 o[:, 0], o[:, 1], o[:, 2], l[:, 0], l[:, 1], l[:, 2],
                 b[:, 0], b[:, 1], b[:, 2]),
                num_keys=2,
            )
            os = jnp.stack(srt[2:5], axis=-1)
            ls = jnp.stack(srt[5:8], axis=-1)
            bs = jnp.stack(srt[8:11], axis=-1)
        else:
            r = jnp.take(rows, perm[:nb], axis=0)
            os, ls, bs = r[:, 0:3], r[:, 3:6], r[:, 6:9]
        t_b = jnp.where(alive_s[:nb], jnp.inf, 0.0)
        t_l = jnp.where(shoot_s[:nb], jnp.inf, 0.0)
        if combo_fn is not None:
            hit, occ_b = combo_fn(os, bs, ls, t_b, t_l)
            occ = occ_b.astype(jnp.int32)
        else:
            o_shadow = jnp.where(shoot_s[:nb, None], os, DEAD_ORIGIN)
            o_bounce = jnp.where(alive_s[:nb, None], os, DEAD_ORIGIN)
            occ = any_fn(o_shadow, ls).astype(jnp.int32)
            hit = closest_fn(o_bounce, bs)
        # occ rides the id channel ((id+1)*2 + occ, exact below 2^24):
        # every unsort operand costs ~3 ms at 2M lanes.
        if compact_post is not None:
            extras = compact_post(hit, os, bs)
            nonlocal post_names
            post_names = tuple(sorted(extras))
            # compact_post consumes u/v/tri; its "mat" id replaces tri in
            # the packed occ channel.
            id_occ = (jnp.round(extras.pop("mat")).astype(jnp.int32) + 1) * 2 + occ
            chans = [("id_occ", id_occ, 0.0), ("t", hit["t"], jnp.inf)]
            chans += [(k, extras[k], float(post_fills.get(k, 0.0)))
                      for k in post_names if k != "mat"]
        else:
            id_occ = (hit["tri"] + 1) * 2 + occ
            chans = [("id_occ", id_occ, 0.0),
                     ("t", hit["t"], jnp.inf),
                     ("u", hit["u"], 0.0), ("v", hit["v"], 0.0)]
        # id_occ stays int32 on the sort path (no f32 exactness ceiling);
        # the scatter path casts it to f32 for the row stack, exact below
        # 2^24 and gated by scatter_ok.  Both switch branches return
        # (int32, f32...).
        if scatter_ok and _scatter_unsort(nb, n):
            # Tiny live prefix: ONE [nb, C] row scatter back to ray order
            # beats the full-width unsort (~7.5 vs ~15 ms at n/64; the sort
            # stays cheaper above ~n/32).
            live_rows = jnp.stack(
                [c.astype(jnp.float32) for _, c, _ in chans], axis=-1
            )
            base = jnp.tile(
                jnp.asarray([f for _, _, f in chans], jnp.float32), (n, 1)
            )
            out = base.at[perm[:nb]].set(live_rows, mode="drop", unique_indices=True)
            return (out[:, 0].astype(jnp.int32),) + tuple(
                out[:, i] for i in range(1, len(chans))
            )
        padded = tuple(_pad_tail(c, n, f) for _, c, f in chans)
        return jax.lax.sort((perm, *padded), num_keys=1)[1:]

    sizes = _bucket_sizes(n) if compact else [n]
    if static_bucket_frac is not None and compact:
        # Frame-lagged static bucket (engine.renderer bucket scheduling):
        # the caller chose this vertex's bucket from the previous frame's
        # live counts, so no data-dependent lax.switch serializes the frame.
        outs = run(_frac_to_bucket(static_bucket_frac, n))
    elif _FIXED_BUCKET and compact:
        # Debug/microbench knob (NEB_FIXED_BUCKET=k): skip the live-count
        # switch and always dispatch the n/k bucket.  NOT exact unless the
        # live count stays under n/k -- for isolating the data-dependent
        # conditional's overhead from its branches' work.
        outs = run(min(max(-(-n // _FIXED_BUCKET), 1024), n))
    elif len(sizes) > 1:
        n_live = jnp.sum((key != jnp.int32(DEAD_KEY)).astype(jnp.int32))
        sel = sum((n_live > s).astype(jnp.int32) for s in sizes[:-1])
        outs = jax.lax.switch(sel, [lambda nb=nb: run(nb) for nb in sizes])
    else:
        outs = run(n)
    id_occ, t = outs[0], outs[1]
    occluded = (id_occ & 1) > 0
    ids = (id_occ >> 1) - 1
    if compact_post is not None:
        hit = {"t": t, "mat": ids, "found": ids >= 0}
        names = [k for k in post_names if k != "mat"]
        hit.update({k: v for k, v in zip(names, outs[2:])})
        return occluded, hit
    return occluded, {"t": t, "tri": ids, "u": outs[2], "v": outs[3]}
