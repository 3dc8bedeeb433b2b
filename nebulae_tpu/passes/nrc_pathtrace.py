"""Path tracing with the neural radiance cache in the loop.

Mirrors the reference's two-kernel NRC scheme (DeferredRenderer.cpp:396-591):
a full-resolution *query* pass whose paths terminate early into the cache
(spread heuristic), and a reduced-resolution *training* pass whose longer
paths generate per-vertex training records, with self-training tail queries.
Both are plain JAX over the packet tracer; the cache MLP trains in-graph
(nrc.cache.train_cache_step) inside the same jitted frame, replacing the
CUDA-side QueryAndTrain black box (NvRtxgiNRC.cpp:145-148).

Bounce loops are `lax.scan`s (uniform bodies, one-bounce-sized XLA graphs);
per-vertex training records ride the scan's stacked outputs.

RNG: the query pass follows the standard draw-order contract; the training
pass uses an independent seed offset (frame ^ 0x9E3779B9).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from nebulae_tpu.core import brdf
from nebulae_tpu.core import math as nmath
from nebulae_tpu.core import rng as nrng
from nebulae_tpu.nrc.cache import primary_spread, query_cache, spread_term, train_cache_step
from nebulae_tpu.passes.pathtrace import SURF_KEYS, _nee_direct

PI = 3.14159265358979


def path_trace_nrc_query(scene, gbuf, sun, closest_fn, any_fn, rng_state, cfg, cache_params):
    """Full-res query pass: paths terminate into the cache by spread heuristic.

    Returns (radiance, rng_state, aux) where aux carries the query/alive
    fractions and per-pixel debug counters (see engine.renderer nrc_debug)."""
    n_pix = gbuf["ray_d"].shape[0]
    surf0 = {k: gbuf[k] for k in SURF_KEYS}
    acc0 = jnp.where(gbuf["hit"][..., None], surf0["emissive"], 0.0)

    # Spread tracking (Nrc.hlsli:200-203): primary spread from the G-buffer.
    cos0 = jnp.clip(nmath.dot(surf0["normal_s"], gbuf["view"])[..., 0], 1e-3, 1.0)
    spread0 = primary_spread(gbuf["depth"], cos0)
    spread0 = jnp.where(jnp.isfinite(spread0), spread0, 0.0)

    QREC_KEYS = ("position", "normal_s", "albedo", "roughness", "metalness")
    track = cfg.bucket_scheduling
    from nebulae_tpu.passes.pathtrace import _live_count, _schedule_entries

    entries = _schedule_entries(cfg)

    def body(carry, bounce_i, bucket_frac=None):
        rng_state, throughput, alive, acc, surf, view, spread, q_set, dbg, qrec = carry
        from nebulae_tpu.passes.pathtrace import nee_bounce_draws, nee_bounce_step

        rng_state, pre = nee_bounce_draws(surf, view, sun, alive, rng_state)
        alive_b = alive & pre["rr_continue"]  # RR absorption kills the bounce
        if track:
            participate = alive_b | pre["shoot"]
            dbg = {**dbg, "live_counts": dbg["live_counts"].at[bounce_i].set(
                _live_count(participate, cfg.sort_segments))}
        vis, found, hit_t, new_surf = nee_bounce_step(
            scene, pre, alive_b, closest_fn, any_fn, cfg, bucket_frac
        )
        direct = pre["f"] * (pre["n_dot_l"] * vis)[..., None] * sun.radiance[None, :]
        acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)

        alive = alive_b
        new_d = pre["new_d"]
        cos_new = jnp.clip(nmath.dot(new_surf["normal_s"], -new_d)[..., 0], 1e-3, 1.0)

        throughput = throughput * pre["weight"]
        sky = brdf.sky_eval(new_d, sun, scene, cfg, jnp)
        acc = acc + jnp.where((alive & ~found)[..., None], throughput * sky, 0.0)
        alive = alive & found
        surf, view = new_surf, -new_d

        # Spread accumulation at the new vertex; pdf = cos/pi (cosine
        # sampling) x the RR diffuse probability -- the lobe draw is part of
        # the direction-sampling pdf (NrcSetBrdfPdf, pathtracer.hlsl:620).
        pdf = cos_new / PI * pre["p_d"]
        spread = spread + spread_term(hit_t, cos_new, pdf)
        terminate = alive & (spread > cfg.nrc_terminate_threshold * spread0) & ~q_set
        if cfg.nrc_inline_resolve:
            # Inline resolve (radiance_resolve.hlsl:24-32): query the cache
            # AT the handoff vertex and add query radiance x prefix
            # throughput now -- the cache params are loop-invariant, so this
            # is exact up to float add order and removes ~17 full-width
            # channels of carried query-record state from the scan.
            pred = query_cache(
                cache_params, surf, view, scene["aabb_min"], scene["aabb_max"],
                learn_irradiance=cfg.nrc_learn_irradiance,
            )
            acc = acc + jnp.where(terminate[..., None], throughput * pred, 0.0)
        else:
            # Carried query record (the reference's buffered-query structure:
            # query records are written during the trace and resolved after,
            # NrcStructures.h:94-169 + radiance_resolve.hlsl): latch the
            # handoff vertex's surface/view/prefix-throughput; ONE cache
            # query resolves post-scan.  Keeps the MLP out of the bounce
            # loop -- a leaner while body for XLA's memory-space assignment.
            t_ = terminate[..., None]
            new_qrec = {k: jnp.where(t_ if surf[k].ndim == 2 else terminate, surf[k], qrec[k])
                        for k in QREC_KEYS}
            new_qrec["view"] = jnp.where(t_, view, qrec["view"])
            new_qrec["throughput"] = jnp.where(t_, throughput, qrec["throughput"])
            qrec = new_qrec
        q_set = q_set | terminate
        # Debug counters (the reference's NRC debug resolve modes,
        # NrcStructures.h:186-245): per-path vertex count and the bounce
        # index where the path handed off to the cache (-1 = never).
        dbg = {
            **dbg,
            "n_vert": dbg["n_vert"] + alive.astype(jnp.float32),
            "term_bounce": jnp.where(
                terminate & (dbg["term_bounce"] < 0),
                jnp.float32(1.0) + bounce_i.astype(jnp.float32),
                dbg["term_bounce"],
            ),
        }
        alive = alive & ~terminate
        return (rng_state, throughput, alive, acc, surf, view, spread, q_set, dbg, qrec), None

    dbg0 = {
        "n_vert": gbuf["hit"].astype(jnp.float32),  # primary vertex counts
        "term_bounce": jnp.full(n_pix, -1.0, jnp.float32),
    }
    if track:
        dbg0["live_counts"] = jnp.zeros(cfg.max_bounces, jnp.int32)
    if cfg.nrc_inline_resolve:
        qrec0 = jnp.zeros((), jnp.float32)  # placeholder carry leaf
    else:
        qrec0 = {k: jnp.zeros_like(surf0[k]) for k in QREC_KEYS}
        qrec0["view"] = jnp.zeros((n_pix, 3), jnp.float32)
        qrec0["throughput"] = jnp.zeros((n_pix, 3), jnp.float32)
    carry = (
        rng_state,
        jnp.ones((n_pix, 3), jnp.float32),
        gbuf["hit"],
        acc0,
        surf0,
        gbuf["view"],
        jnp.zeros(n_pix, jnp.float32),
        jnp.zeros(n_pix, bool),
        dbg0,
        qrec0,
    )
    if cfg.max_bounces > 1:
        n_it = cfg.max_bounces - 1
        if cfg.nrc_unroll_query:
            # Unrolled bounce loop: no XLA while -- memory-space assignment
            # prices each gather-table use individually instead of through
            # the while-loop cost model that starved the NRC program's
            # tri_fast pin (docs/PERFORMANCE.md round 4).
            for i in range(n_it):
                carry, _ = body(
                    carry, jnp.int32(i),
                    bucket_frac=None if entries is None else entries[i],
                )
        else:
            # Scan (schedule-grouped when a static bucket schedule is set),
            # shared with the plain path (pathtrace.run_scheduled_bounces).
            from nebulae_tpu.passes.pathtrace import run_scheduled_bounces

            carry = run_scheduled_bounces(body, carry, n_it, entries, with_index=True)
    rng_state, throughput, alive, acc, surf, view, spread, q_set, dbg, qrec = carry
    if not cfg.nrc_inline_resolve and cfg.max_bounces > 1:
        # Post-scan resolve: one cache query over the latched handoff records
        # (radiance_resolve.hlsl:24-32); q_set masks never-terminated paths.
        pred = query_cache(
            cache_params,
            {k: qrec[k] for k in QREC_KEYS},
            qrec["view"],
            scene["aabb_min"],
            scene["aabb_max"],
            learn_irradiance=cfg.nrc_learn_irradiance,
        )
        acc = acc + jnp.where(q_set[..., None], qrec["throughput"] * pred, 0.0)
    last_frac = None if entries is None else entries[cfg.max_bounces - 1]
    direct, rng_state, shoot = _nee_direct(
        scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays, last_frac
    )
    acc = acc + jnp.where(alive[..., None], throughput * direct, 0.0)

    aux = {
        "query_frac": q_set.mean(),
        "alive_frac": alive.mean(),
        "n_vert": dbg["n_vert"],
        "term_bounce": dbg["term_bounce"],
        "query_set": q_set,
    }
    if track:
        from nebulae_tpu.passes.pathtrace import _live_count as _lc

        aux["live_counts"] = dbg["live_counts"].at[cfg.max_bounces - 1].set(
            _lc(shoot, cfg.sort_segments)
        )
    return acc, rng_state, aux


def compute_ideal_training_dims(width: int, height: int, cfg) -> tuple[int, int]:
    """ComputeIdealTrainingDimensions analogue (NrcCommon.h:221, 293-305):
    size the training pass so it generates about
    nrc_train_iterations x nrc_records_per_iteration per-vertex records
    (16K-record batches), preserving the frame aspect ratio.  Average
    training-path length is estimated at half the vertex cap (the spread
    heuristic terminates most paths early)."""
    avg_verts = max(cfg.nrc_max_path_vertices * 0.5, 1.0)
    target_paths = cfg.nrc_train_iterations * cfg.nrc_records_per_iteration / avg_verts
    scale = min((target_paths / float(width * height)) ** 0.5, 1.0)
    tw = max(int(round(width * scale / 4.0)) * 4, 8)
    th = max(int(round(height * scale / 4.0)) * 4, 8)
    return tw, th


def path_trace_nrc_train(scene, sun, closest_fn, any_fn, cfg, cache_state, optimizer, cam, frame):
    """Reduced-res training pass: long paths -> per-vertex records ->
    nrc_train_iterations adam steps on 16K-record batches
    (DeferredRenderer.cpp:229-234's QueryAndTrain schedule).

    Returns (new_cache_state, loss) -- loss averaged over the batches."""
    from nebulae_tpu.passes.gbuffer import blocked_closest, camera_rays_jax, render_gbuffer

    tw, th = compute_ideal_training_dims(cfg.width, cfg.height, cfg)
    n_pix = tw * th

    # Jittered rays decorrelate training samples across frames.
    ys, xs = jnp.meshgrid(jnp.arange(th, dtype=jnp.uint32), jnp.arange(tw, dtype=jnp.uint32), indexing="ij")
    rng_state = nrng.init_rng(xs.reshape(-1), ys.reshape(-1), tw, frame ^ jnp.uint32(0x9E3779B9))
    rng_state, jx = nrng.next_float(rng_state)
    rng_state, jy = nrng.next_float(rng_state)
    o, d = camera_rays_jax(cam, tw, th, jitter=jnp.stack([jx, jy], -1))
    gbuf = render_gbuffer(
        scene, blocked_closest(closest_fn, th, tw), o, d,
        image_hw=(th, tw) if cfg.texture_mips else None,
    )

    k_verts = cfg.nrc_max_path_vertices
    surf0 = {k: gbuf[k] for k in SURF_KEYS}

    def vertex_record(surf, view, local, alive):
        return {
            "position": surf["position"],
            "normal": surf["normal_s"],
            "view": view,
            "roughness": surf["roughness"],
            "albedo": surf["albedo"],
            "metalness": surf["metalness"],
            "local": local,
            "alive": alive.astype(jnp.float32),
        }

    # Unbiased-path lottery (Nrc.hlsli:301-303): a pseudorandom 1/16 of the
    # training paths are never heuristic-terminated, anchoring the cache with
    # full-length targets.  Spread tracking mirrors the query pass.
    rng_state, u_lot = nrng.next_float(rng_state)
    unbiased = u_lot < cfg.nrc_unbiased_fraction
    cos0 = jnp.clip(nmath.dot(surf0["normal_s"], gbuf["view"])[..., 0], 1e-3, 1.0)
    spread0 = primary_spread(gbuf["depth"], cos0)
    spread0 = jnp.where(jnp.isfinite(spread0), spread0, 0.0)

    def body(carry, _):
        rng_state, alive, surf, view, spread = carry
        from nebulae_tpu.passes.pathtrace import nee_bounce_draws, nee_bounce_step

        rng_state, pre = nee_bounce_draws(surf, view, sun, alive, rng_state)
        alive_b = alive & pre["rr_continue"]  # RR absorption kills the bounce
        vis, found, hit_t, new_surf = nee_bounce_step(
            scene, pre, alive_b, closest_fn, any_fn, cfg
        )
        direct = pre["f"] * (pre["n_dot_l"] * vis)[..., None] * sun.radiance[None, :]
        local = jnp.where(alive[..., None], direct + surf["emissive"], 0.0)
        rec_surf, rec_view, rec_alive = surf, view, alive
        alive = alive_b

        new_d = pre["new_d"]
        weight = pre["weight"]
        # Sky closes the path: fold into this vertex's local target.
        sky = brdf.sky_eval(new_d, sun, scene, cfg, jnp)
        local = local + jnp.where((alive & ~found)[..., None], weight * sky, 0.0)

        # Training termination heuristic (Nrc.hlsli:410): when the cumulative
        # spread at the new vertex exceeds the threshold (and the path is not
        # unbiased), the suffix becomes a self-training cache query at that
        # vertex -- folded into this record's target exactly like the sky.
        cos_new = jnp.clip(nmath.dot(new_surf["normal_s"], -new_d)[..., 0], 1e-3, 1.0)
        pdf = cos_new / PI * pre["p_d"]  # RR-adjusted pdf (pathtracer.hlsl:620)
        spread = spread + spread_term(hit_t, cos_new, pdf)
        term = (
            alive & found & ~unbiased
            & (spread > cfg.nrc_train_terminate_threshold * spread0)
        )
        if cfg.nrc_self_training:
            pred = query_cache(
                jax.lax.stop_gradient(cache_state["ema_params"]), new_surf, -new_d,
                scene["aabb_min"], scene["aabb_max"],
                learn_irradiance=cfg.nrc_learn_irradiance,
            )
            local = local + jnp.where(term[..., None], weight * pred, 0.0)
        alive = alive & found & ~term
        w_after = jnp.where(alive[..., None], weight, 0.0)
        rec = vertex_record(rec_surf, rec_view, local, rec_alive)
        rec["w_after"] = w_after
        return (rng_state, alive, new_surf, -new_d, spread), rec

    carry = (rng_state, gbuf["hit"], surf0, gbuf["view"], jnp.zeros(n_pix, jnp.float32))
    if k_verts > 1:
        carry, recs = jax.lax.scan(body, carry, None, length=k_verts - 1)
    else:
        recs = None
    rng_state, alive, surf, view, _spread = carry

    # Final vertex: NEE only; its suffix is the self-training tail query.
    direct, rng_state, _shoot = _nee_direct(scene, surf, view, sun, alive, any_fn, rng_state, cfg, cfg.sort_rays)
    local_last = jnp.where(alive[..., None], direct + surf["emissive"], 0.0)
    if cfg.nrc_self_training:
        tail_pred = query_cache(
            jax.lax.stop_gradient(cache_state["ema_params"]), surf, view,
            scene["aabb_min"], scene["aabb_max"],
            learn_irradiance=cfg.nrc_learn_irradiance,
        )
        target_last = local_last + jnp.where(alive[..., None], tail_pred, 0.0)
    else:
        target_last = local_last
    last_rec = vertex_record(surf, view, local_last, alive)

    # Backward-accumulate per-vertex targets: L_k = local_k + w_k * L_{k+1}.
    # Records are assembled pixel-major ([n_pix, k_verts] order) so each
    # contiguous 16K batch mixes all path depths of a pixel block.
    def interleave(stacked, last):
        # stacked [k-1, n_pix, ...] + last [n_pix, ...] -> [n_pix * k, ...]
        full = jnp.concatenate([stacked, last[None]], axis=0)
        full = jnp.moveaxis(full, 0, 1)
        return full.reshape((full.shape[0] * full.shape[1],) + full.shape[2:])

    if recs is not None:
        def back(carry, rec):
            target_next = carry
            target_k = rec["local"] + rec["w_after"] * target_next
            return target_k, target_k

        _, targets = jax.lax.scan(back, target_last, recs, reverse=True)
        records = {
            "position": interleave(recs["position"], last_rec["position"]),
            "normal": interleave(recs["normal"], last_rec["normal"]),
            "view": interleave(recs["view"], last_rec["view"]),
            "roughness": interleave(recs["roughness"], last_rec["roughness"]),
            "albedo": interleave(recs["albedo"], last_rec["albedo"]),
            "metalness": interleave(recs["metalness"], last_rec["metalness"]),
            "target": interleave(targets, target_last),
            "weight": interleave(recs["alive"], last_rec["alive"]),
        }
    else:
        records = {
            "position": last_rec["position"],
            "normal": last_rec["normal"],
            "view": last_rec["view"],
            "roughness": last_rec["roughness"],
            "albedo": last_rec["albedo"],
            "metalness": last_rec["metalness"],
            "target": target_last,
            "weight": last_rec["alive"],
        }

    # k x 16K-record training iterations (DeferredRenderer.cpp:229-234): the
    # record stream is cut into nrc_records_per_iteration batches and each
    # gets its own adam step, up to nrc_train_iterations per frame.
    total = records["weight"].shape[0]
    bsz = min(cfg.nrc_records_per_iteration, total)
    n_batches = max(min(cfg.nrc_train_iterations, total // bsz), 1)
    batched = {
        k: v[: n_batches * bsz].reshape((n_batches, bsz) + v.shape[1:])
        for k, v in records.items()
    }

    def train_body(cs, batch):
        cs, loss = train_cache_step(
            cs, optimizer, batch, scene["aabb_min"], scene["aabb_max"],
            learn_irradiance=cfg.nrc_learn_irradiance,
        )
        return cs, loss

    cache_state, losses = jax.lax.scan(train_body, cache_state, batched)
    return cache_state, losses.mean()
