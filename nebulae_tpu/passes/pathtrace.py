"""Wavefront path tracing pass (differentiable, XLA level).

The TPU-native counterpart of the reference's DXR raygen megakernel
(assets/shaders/pathtracer.hlsl:397-625): primary hit comes from the
G-buffer (no primary rays re-traced), then a fixed-trip-count bounce loop
with masked lanes -- sun-disk NEE at every vertex, cosine-hemisphere
Lambertian indirect bounces, constant-sky miss radiance.  Data-dependent
termination (path death) becomes masking; the loop is unrolled at trace time
(max_bounces is static), so XLA fuses each bounce's shading into large fused
elementwise blocks between the traversal calls.

RNG contract (identical to ref.tracer.path_trace_np): per bounce 2 draws NEE
then, if not the last bounce, 1 draw lobe-selection Russian roulette + 2
draws indirect direction (pathtracer.hlsl:474-479, 596-620).

Returns per-pixel HDR radiance including direct lighting at every vertex; an
optional `nrc` hook terminates paths into the neural radiance cache instead
of tracing the full tail (passes.nrc_integration).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nebulae_tpu.core import brdf
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core import rng as nrng
from nebulae_tpu.core.surface import reconstruct_surface
from nebulae_tpu.passes.gbuffer import detach
from nebulae_tpu.tracer.sorting import (
    DEAD_ORIGIN,
    ray_sort_key,
    sorted_any,
    sorted_closest,
    sorted_shadow_closest,
)


SURF_KEYS = ("position", "normal_g", "normal_s", "albedo", "roughness", "metalness", "emissive")


def _live_count(participate, segments: int):
    """Live-lane count with the same semantics the compaction bucket uses:
    global sum for the global sort, busiest-segment sum when segment-local
    (the shared bucket must cover the busiest segment)."""
    c = participate.astype(jnp.int32)
    n = c.shape[0]
    if segments > 1 and n % segments == 0 and n // segments >= 2:
        return c.reshape(segments, -1).sum(axis=1).max()
    return c.sum()


def _schedule_entries(cfg):
    """Per-vertex static bucket fractions from cfg.bucket_schedule, padded
    with 1 (full width, always exact) to max_bounces entries; None when no
    schedule is set (live-count switch)."""
    if cfg.bucket_schedule is None:
        return None
    return (tuple(int(f) for f in cfg.bucket_schedule) + (1,) * cfg.max_bounces)[
        : cfg.max_bounces
    ]


def nee_bounce_draws(surf, view, sun, alive, rng_state):
    """The 5 RNG draws + shading-side math of one path vertex: sun-disk NEE
    direction/BRDF (2 draws), lobe-selection Russian roulette (1 draw), then
    cosine-hemisphere indirect (2 draws).  Draw order matches the CPU oracle
    contract.  No rays are traced here.

    The RR ports pathtracer.hlsl:474-479/596-620 + brdf.hlsli:130-146: draw
    u; the path continues through the diffuse lobe iff u < p_d (the clamped
    diffuse probability), dividing throughput by p_d; otherwise it is
    absorbed.  `weight` therefore already includes the 1/p_d boost, and
    `rr_continue` must be ANDed into the bounce-alive mask; `pdf` is the
    RR-adjusted solid-angle pdf (cos/pi * p_d) the NRC spread term consumes
    (NrcSetBrdfPdf, pathtracer.hlsl:620)."""
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    l = brdf.sun_disk_sample(u1, u2, sun.direction[None, :], sun.tan_half_angle, jnp)
    n_dot_l = jnp.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(
        surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], jnp
    )
    rng_state, u_rr = nrng.next_float(rng_state)
    n_dot_v = jnp.clip(nmath.dot(surf["normal_s"], view)[..., 0], 0.0, 1.0)
    p_d = brdf.diffuse_probability(surf["albedo"], surf["metalness"], n_dot_v, jnp)
    rr_continue = u_rr < p_d
    rng_state, u3 = nrng.next_float(rng_state)
    rng_state, u4 = nrng.next_float(rng_state)
    new_d = brdf.cosine_hemisphere_sample(u3, u4, surf["normal_s"], jnp)
    weight = brdf.diffuse_reflectance(surf["albedo"], surf["metalness"], jnp) / p_d[..., None]
    origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
    shoot = alive & (n_dot_l > 0.0)
    pre = {"l": l, "n_dot_l": n_dot_l, "f": f, "shoot": shoot,
           "origin": origin, "new_d": new_d, "weight": weight,
           "rr_continue": rr_continue, "p_d": p_d}
    return rng_state, pre


def nee_bounce_trace(scene, pre, alive_bounce, closest_fn, any_fn, cfg, bucket_frac=None):
    """Trace the vertex's shadow + bounce rays; one shared sort when
    cfg.sort_rays.  Returns (vis [N], hit dict) in original ray order.

    (Measured dead end, kept out: reconstructing the next surface inside the
    compacted sorted domain.  The 17 surface channels must ride the unsort
    back to pixel order, and lax.sort cost grows steeply with operand count
    at 2M lanes -- frame went 273 -> 338 ms with a second 17-operand unsort
    and 376 ms with one fused 22-operand unsort, vs full-width reconstruct
    after the 6-operand hit unsort.  See docs/PERFORMANCE.md round 2.)"""
    origin = jax.lax.stop_gradient(pre["origin"])
    l = jax.lax.stop_gradient(pre["l"])
    b = jax.lax.stop_gradient(pre["new_d"])
    if cfg.sort_rays:
        # Dead-key a lane only when it neither bounces nor shoots: RR
        # absorption kills the continuation but the vertex's NEE shadow ray
        # still fires, and compaction must keep it in the live prefix.
        participate = alive_bounce | pre["shoot"]
        key = ray_sort_key(
            origin, b, scene["aabb_min"], scene["aabb_max"], participate,
            low_bits=pre["shoot"].astype(jnp.int32) + 2 * alive_bounce.astype(jnp.int32),
        )
        occ, hit = sorted_shadow_closest(
            any_fn, closest_fn, origin, l, b, key,
            combo_fn=getattr(closest_fn, "combo", None),
            num_tris=scene["tri_pos"].shape[0],
            segments=cfg.sort_segments,
            static_bucket_frac=bucket_frac,
        )
        hit = detach(hit)
    else:
        o_sh = jnp.where(pre["shoot"][..., None], origin, DEAD_ORIGIN)
        occ = any_fn(o_sh, l)
        o_b = jnp.where(alive_bounce[..., None], origin, DEAD_ORIGIN)
        hit = detach(closest_fn(o_b, b))
    vis = jnp.where(pre["shoot"] & ~occ, 1.0, 0.0)
    return vis, hit


def _reconstruct(scene, hit, origin, new_d, cfg):
    """Next-vertex surface reconstruction (shared by the sorted/compact path
    and the full-width fallback)."""
    if cfg.fast_bounce_shading:
        from nebulae_tpu.core.surface import reconstruct_surface_fast

        return reconstruct_surface_fast(
            scene, hit["tri"], hit["u"], hit["v"], origin, new_d, hit["t"], jnp
        )
    return reconstruct_surface(scene, hit["tri"], hit["u"], hit["v"], view_dir=-new_d, xp=jnp)


def _compact_reconstruct_mode(scene, cfg):
    """'fast' | 'full' | None: which compact-domain reconstruct applies."""
    if not cfg.sort_rays:
        return None
    if cfg.fast_bounce_shading:
        if "tri_fast" in scene and scene["tri_fast"].shape[0] > 0:
            return "fast"
        return None
    packed = "tri_geom" in scene and scene["tri_geom"].shape[0] > 0
    has_tex = scene["textures"].shape[0] > 0
    quad_ok = (not has_tex) or (
        "mat_tex_quad" in scene and "mat_tex" in scene and scene["mat_tex"].shape[0] > 0
    )
    return "full" if (packed and quad_ok) else None


def _fast_shading_compact_post(scene):
    """compact_post for sorted_shadow_closest: interpolate the fast-shading
    attributes (shading/geometric normal + material id) INSIDE the compacted
    sorted domain, where the tri_fast row gather scales with the live count
    instead of paying a full-width HBM row fetch per bounce (36 ms x bounces
    in the NRC frame, round-4 trace).  The 7 outputs ride the existing
    unsort.  Math identical to core.surface.reconstruct_surface_fast."""
    from nebulae_tpu.core.surface import _bary_packed, _take_rows

    def post(hit, os, bs):
        tid = jnp.clip(hit["tri"], 0, scene["tri_pos"].shape[0] - 1)
        row = _take_rows(scene["tri_fast"], tid, jnp)
        nrm = nmath.normalize(_bary_packed(row[..., 0:9], hit["u"], hit["v"], 3, jnp))
        ng = row[..., 9:12]
        view = -bs
        flip = jnp.where(nmath.dot(nrm, view) < 0.0, -1.0, 1.0)
        ns = nrm * flip
        ng = ng * jnp.where(nmath.dot(ng, ns) < 0.0, -1.0, 1.0)
        out = {
            # miss lanes carry mat -1: the unsorted (mat+1)*2+occ channel
            # doubles as the found flag, like tri_occ did
            "mat": jnp.where(hit["tri"] >= 0, row[..., 12], -1.0),
            "nsx": ns[..., 0], "nsy": ns[..., 1], "nsz": ns[..., 2],
            "ngx": ng[..., 0], "ngy": ng[..., 1], "ngz": ng[..., 2],
        }
        return jax.lax.stop_gradient(out)

    # Dead-lane fills: a unit normal keeps downstream normalize/dot finite.
    fills = {"nsz": 1.0, "ngz": 1.0}
    return post, fills


def _full_shading_compact_post(scene):
    """compact_post for FULL-shading bounces: the whole ReconstructSurfaceData
    (pathtracer.hlsl:299-395 -- wide geometry row, bilinear material atlas
    fetch, normal-map TBN) runs in the compacted sorted domain, so the
    [N, 39] tri_geom row gather AND the per-hit texture fetch scale with the
    live count instead of full width per bounce.  Texture terms ride the
    unsort DETACHED and separate from the differentiable material factors,
    which multiply back in full width (nee_bounce_step) -- gradient flow to
    mat_base_color/roughness/metallic/emissive is identical to the
    full-width reconstruct_surface (textures are stop-gradiented there too).
    Math mirrors core.surface.reconstruct_surface's packed+quad-atlas path."""
    from nebulae_tpu.core.scene import MAT_HAS_NORMAL_TEX
    from nebulae_tpu.core.surface import _bary_packed, _f32_int, _take_rows
    from nebulae_tpu.core.texture import sample_bilinear_quad, srgb_to_linear

    has_tex = scene["textures"].shape[0] > 0

    def post(hit, os, bs):
        tid = jnp.clip(hit["tri"], 0, scene["tri_pos"].shape[0] - 1)
        row = _take_rows(scene["tri_geom"], tid, jnp)
        u, v = hit["u"], hit["v"]
        v0, e1, e2 = row[..., 0:3], row[..., 3:6], row[..., 6:9]
        pos = v0 + u[..., None] * e1 + v[..., None] * e2
        nrm = nmath.normalize(_bary_packed(row[..., 9:18], u, v, 3, jnp))
        ng = nmath.normalize(nmath.cross(e1, e2))
        ng = ng * jnp.where(nmath.dot(ng, nrm) < 0.0, -1.0, 1.0)
        out = {
            "mat": jnp.where(hit["tri"] >= 0, row[..., 36], -1.0),
            "px": pos[..., 0], "py": pos[..., 1], "pz": pos[..., 2],
        }
        if has_tex:
            uv = _bary_packed(row[..., 18:24], u, v, 2, jnp)
            tan4 = _bary_packed(row[..., 24:36], u, v, 4, jnp)
            flags = _f32_int(row[..., 37], jnp)
            atlas_id = _f32_int(row[..., 38], jnp)
            px = sample_bilinear_quad(
                scene["mat_tex_quad"],
                scene.get("mat_tex_mip_hw", scene["mat_tex_hw"]),
                atlas_id, uv, jnp,
                row_off=scene.get("mat_tex_row_off"),
            )
            ta = srgb_to_linear(px[..., 0:3])
            te = srgb_to_linear(px[..., 8:11])
            has_nm = (flags & MAT_HAS_NORMAL_TEX) != 0
            tn = px[..., 5:8] * 2.0 - 1.0
            tangent = nmath.normalize(tan4[..., :3] - nrm * nmath.dot(tan4[..., :3], nrm))
            bitangent = nmath.cross(nrm, tangent) * tan4[..., 3:4]
            mapped = nmath.normalize(
                tn[..., 0:1] * tangent + tn[..., 1:2] * bitangent + tn[..., 2:3] * nrm
            )
            ns = jnp.where(has_nm[..., None], mapped, nrm)
            out.update({
                "tax": ta[..., 0], "tay": ta[..., 1], "taz": ta[..., 2],
                "tr": px[..., 3], "tm": px[..., 4],
                "tex": te[..., 0], "tey": te[..., 1], "tez": te[..., 2],
            })
        else:
            ns = nrm
        view = -bs
        flip = jnp.where(nmath.dot(ns, view) < 0.0, -1.0, 1.0)
        ns = ns * flip
        ng = ng * flip
        out.update({
            "nsx": ns[..., 0], "nsy": ns[..., 1], "nsz": ns[..., 2],
            "ngx": ng[..., 0], "ngy": ng[..., 1], "ngz": ng[..., 2],
        })
        return jax.lax.stop_gradient(out)

    fills = {"nsz": 1.0, "ngz": 1.0, "tax": 1.0, "tay": 1.0, "taz": 1.0,
             "tr": 1.0, "tm": 1.0, "tex": 0.0, "tey": 0.0, "tez": 0.0}
    return post, fills


def nee_bounce_step(scene, pre, alive_bounce, closest_fn, any_fn, cfg, bucket_frac=None):
    """One path vertex's traces + next-vertex surface reconstruction.

    Returns (vis [N], found [N] bool, hit_t [N], surf dict).  With ray
    sorting the shading attributes are reconstructed in the compacted sorted
    domain (_fast_shading_compact_post / _full_shading_compact_post); other
    configurations trace then reconstruct full-width.  `bucket_frac` pins
    this vertex's compaction bucket statically (frame-lagged scheduling)."""
    mode = _compact_reconstruct_mode(scene, cfg)
    if mode is not None:
        origin = jax.lax.stop_gradient(pre["origin"])
        l = jax.lax.stop_gradient(pre["l"])
        b = jax.lax.stop_gradient(pre["new_d"])
        participate = alive_bounce | pre["shoot"]
        key = ray_sort_key(
            origin, b, scene["aabb_min"], scene["aabb_max"], participate,
            low_bits=pre["shoot"].astype(jnp.int32) + 2 * alive_bounce.astype(jnp.int32),
        )
        post, fills = (
            _fast_shading_compact_post(scene)
            if mode == "fast"
            else _full_shading_compact_post(scene)
        )
        occ, hit = sorted_shadow_closest(
            any_fn, closest_fn, origin, l, b, key,
            combo_fn=getattr(closest_fn, "combo", None),
            num_tris=scene["tri_pos"].shape[0],
            compact_post=post, post_fills=fills,
            segments=cfg.sort_segments,
            static_bucket_frac=bucket_frac,
        )
        vis = jnp.where(pre["shoot"] & ~occ, 1.0, 0.0)
        # Detach the hit distance (matching nee_bounce_trace's detach(hit)):
        # position = origin + t*d must not keep a live differentiable path
        # through the tracer's t w.r.t. tri_pos if geometry ever becomes
        # trainable; origin/dirs were stop-gradiented before the trace.
        hit = {**hit, "t": jax.lax.stop_gradient(hit["t"])}
        from nebulae_tpu.core.surface import fetch_rows

        mat = hit["mat"]
        m = jnp.clip(mat, 0, scene["mat_base_color"].shape[0] - 1)
        ns = jnp.stack([hit["nsx"], hit["nsy"], hit["nsz"]], axis=-1)
        ng = jnp.stack([hit["ngx"], hit["ngy"], hit["ngz"]], axis=-1)
        if mode == "fast":
            tcl = jnp.clip(hit["t"], 0.0, 1e30)
            surf = {
                "position": pre["origin"] + tcl[..., None] * pre["new_d"],
                "normal_g": ng,
                "normal_s": ns,
                "albedo": fetch_rows(scene["mat_avg_albedo"], m, jnp),
                "roughness": jnp.clip(
                    fetch_rows(scene["mat_avg_rough"][:, None], m, jnp)[..., 0], 0.02, 1.0
                ),
                "metalness": jnp.clip(
                    fetch_rows(scene["mat_avg_metal"][:, None], m, jnp)[..., 0], 0.0, 1.0
                ),
                "emissive": fetch_rows(scene["mat_avg_emissive"], m, jnp),
            }
        else:
            # Differentiable material factors multiply the detached texture
            # terms full-width -- gradient flow identical to the full-width
            # reconstruct_surface (textures stop-gradiented there too).
            base = fetch_rows(scene["mat_base_color"], m, jnp)
            rough = fetch_rows(scene["mat_roughness"][:, None], m, jnp)[..., 0]
            metal = fetch_rows(scene["mat_metallic"][:, None], m, jnp)[..., 0]
            emissive = fetch_rows(scene["mat_emissive"], m, jnp)
            albedo = base[..., :3]
            if "tax" in hit:
                albedo = albedo * jnp.stack([hit["tax"], hit["tay"], hit["taz"]], -1)
                rough = rough * hit["tr"]
                metal = metal * hit["tm"]
                emissive = emissive * jnp.stack([hit["tex"], hit["tey"], hit["tez"]], -1)
            surf = {
                "position": jnp.stack([hit["px"], hit["py"], hit["pz"]], axis=-1),
                "normal_g": ng,
                "normal_s": ns,
                "albedo": albedo,
                "roughness": jnp.clip(rough, 0.02, 1.0),
                "metalness": jnp.clip(metal, 0.0, 1.0),
                "emissive": emissive,
            }
        return vis, hit["found"], hit["t"], surf
    vis, hit = nee_bounce_trace(scene, pre, alive_bounce, closest_fn, any_fn, cfg, bucket_frac)
    surf_full = _reconstruct(scene, hit, pre["origin"], pre["new_d"], cfg)
    surf = {k: surf_full[k] for k in SURF_KEYS}
    return vis, hit["tri"] >= 0, hit["t"], surf


def _nee_direct(scene, surf, view, sun, alive, any_fn, rng_state, cfg, sort,
                bucket_frac=None):
    """Sun-disk NEE at a vertex (2 draws).

    Returns (direct, rng_state, shoot) -- `shoot` is the participating-lane
    mask (for the frame-lagged bucket-count bookkeeping)."""
    rng_state, u1 = nrng.next_float(rng_state)
    rng_state, u2 = nrng.next_float(rng_state)
    l = brdf.sun_disk_sample(u1, u2, sun.direction[None, :], sun.tan_half_angle, jnp)
    n_dot_l = jnp.clip(nmath.dot(surf["normal_s"], l)[..., 0], 0.0, 1.0)
    f = brdf.eval_brdf(
        surf["normal_s"], view, l, surf["albedo"], surf["roughness"], surf["metalness"], jnp
    )
    origin = brdf.offset_ray_origin(surf["position"], surf["normal_g"])
    # Dead/unlit lanes get ejected far outside the scene so their packet
    # tiles retire on the root AABB test.
    shoot = alive & (n_dot_l > 0.0)
    origin_sh = jax.lax.stop_gradient(jnp.where(shoot[..., None], origin, DEAD_ORIGIN))
    l_sh = jax.lax.stop_gradient(l)
    if sort:
        key = ray_sort_key(origin_sh, l_sh, scene["aabb_min"], scene["aabb_max"], shoot)
        occ = sorted_any(any_fn, origin_sh, l_sh, key, segments=cfg.sort_segments,
                         static_bucket_frac=bucket_frac)
    else:
        occ = any_fn(origin_sh, l_sh)
    vis = jnp.where(shoot & ~occ, 1.0, 0.0)
    direct = f * (n_dot_l * vis)[..., None] * sun.radiance[None, :]
    return direct, rng_state, shoot


def run_scheduled_bounces(body, carry, n_it: int, entries, with_index: bool = False):
    """Run `n_it` bounce iterations of `body(carry, x, bucket_frac)`.

    With `entries` (per-vertex static bucket fractions) the loop splits into
    groups of consecutive equal fractions -- each group is its own lax.scan
    (or a single inlined call), so every vertex gets its scheduled static
    bucket with at most a handful of traced bodies.  Without a schedule it
    is one uniform scan (the graph stays one-bounce-sized; full unrolling
    made backward compiles take minutes).  `with_index` feeds the global
    iteration index as the scan xs (int32) instead of None -- used by the
    NRC query pass, whose body indexes per-vertex debug counters."""
    from functools import partial

    def _scan(fn, carry, start, count):
        if with_index:
            return jax.lax.scan(fn, carry, jnp.arange(start, start + count, dtype=jnp.int32))
        return jax.lax.scan(fn, carry, None, length=count)

    if entries is None:
        carry, _ = _scan(partial(body, bucket_frac=None), carry, 0, n_it)
        return carry
    i = 0
    while i < n_it:
        j = i
        while j < n_it and entries[j] == entries[i]:
            j += 1
        grp = partial(body, bucket_frac=entries[i])
        if j - i == 1:
            carry, _ = grp(carry, jnp.int32(i) if with_index else None)
        else:
            carry, _ = _scan(grp, carry, i, j - i)
        i = j
    return carry


def path_trace(scene, gbuf, sun, closest_fn, any_fn, rng_state, cfg):
    """Trace indirect GI starting from the G-buffer surfaces.

    The bounce loop is a `lax.scan` with a uniform body (NEE + indirect
    trace), followed by one final NEE -- identical RNG draw order to the CPU
    oracle's loop, but the XLA graph stays one-bounce-sized regardless of
    max_bounces (unrolling made backward compiles take minutes).  With
    cfg.bucket_schedule the scan splits into groups of equal static bucket
    fractions (run_scheduled_bounces); with cfg.bucket_scheduling the
    per-vertex live counts are measured for the engine's frame-lagged
    scheduler.

    Returns (radiance [N, 3], rng_state, live_counts [max_bounces] | None).
    """
    n_pix = gbuf["ray_d"].shape[0]
    surf0 = {k: gbuf[k] for k in SURF_KEYS}
    acc0 = jnp.where(gbuf["hit"][..., None], surf0["emissive"], 0.0)
    track = cfg.bucket_scheduling
    entries = _schedule_entries(cfg)

    def bounce_body(carry, _, bucket_frac=None):
        rng_state, throughput, alive, acc, surf, view, counts, vi = carry
        rng_state, pre = nee_bounce_draws(surf, view, sun, alive, rng_state)

        new_throughput = throughput * pre["weight"]
        alive_b = alive & pre["rr_continue"]  # RR absorption kills the bounce
        if cfg.throughput_threshold > 0.0:
            alive_b = alive_b & (new_throughput.max(axis=-1) > cfg.throughput_threshold)

        if track:
            participate = alive_b | pre["shoot"]
            counts = counts.at[vi].set(_live_count(participate, cfg.sort_segments))

        # Shadow + bounce under one shared sort; next-vertex reconstruction
        # rides the compacted domain when fast shading is on (nee_bounce_step).
        vis, found, _hit_t, surf = nee_bounce_step(
            scene, pre, alive_b, closest_fn, any_fn, cfg, bucket_frac
        )
        direct = pre["f"] * (pre["n_dot_l"] * vis)[..., None] * sun.radiance[None, :]
        acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)

        throughput = new_throughput
        alive = alive_b
        new_d = pre["new_d"]
        sky = brdf.sky_eval(new_d, sun, scene, cfg, jnp)
        acc = acc + jnp.where((alive & ~found)[..., None], throughput * sky, 0.0)
        alive = alive & found
        acc = acc + jnp.where(alive[..., None], throughput * surf["emissive"], 0.0)
        return (rng_state, throughput, alive, acc, surf, -new_d, counts, vi + 1), None

    counts0 = jnp.zeros(cfg.max_bounces, jnp.int32)
    carry = (
        rng_state, jnp.ones((n_pix, 3), jnp.float32), gbuf["hit"], acc0, surf0,
        gbuf["view"], counts0, jnp.int32(0),
    )
    if cfg.max_bounces > 1:
        carry = run_scheduled_bounces(bounce_body, carry, cfg.max_bounces - 1, entries)
    rng_state, throughput, alive, acc, surf, view, counts, _vi = carry
    # Final vertex: NEE only (matches the oracle's "break before indirect").
    last_frac = None if entries is None else entries[cfg.max_bounces - 1]
    direct, rng_state, shoot = _nee_direct(
        scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays, last_frac
    )
    acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)
    if track:
        counts = counts.at[cfg.max_bounces - 1].set(_live_count(shoot, cfg.sort_segments))
    return acc, rng_state, (counts if track else None)
