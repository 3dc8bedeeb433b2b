"""Benchmark: Mrays/s per chip, forward and forward+backward.

Workload (BASELINE.md): Sponza-class scene at 1920x1080, 1 spp path trace
with NEE + SVGF + ACES through the full jitted pipeline, then a full
train step (forward + backward through the differentiable pipeline + adam
update on material/sun parameters).  The mounted reference snapshot ships
only Sponza's textures (no geometry binary), so the Sponza-class stand-in is
a 3x3 DamagedHelmet field + ground plane (~139k textured PBR triangles; see
nebulae_tpu/utils/testscenes.py).

HEADLINE config is reference parity: full-texture shading at every bounce
(the reference fetches textures per hit, pathtracer.hlsl:299-395).  The
fast-bounce-shading approximation (face normals + texture-averaged
materials on secondary bounces) is measured as a probe in `detail`.

Ray accounting: primary (W*H) + per sample per bounce one NEE shadow ray +
one indirect ray (bounces-1 indirect segments), matching what the tracer
actually casts.

Output protocol: the PRIMARY JSON line (fwd + fwd/bwd on the headline
config) is printed and flushed FIRST, as soon as those two programs have
run -- a driver timeout mid-probes still captures the official number.
After the probes an enriched line with the same headline value re-emits
with the full `detail` dict.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def _emit(result: dict) -> None:
    print(json.dumps(result), flush=True)
    sys.stdout.flush()


def main() -> None:
    import jax

    # Persistent XLA compilation cache: the 1080p forward + train-step
    # programs take minutes to compile cold; cached they load in seconds.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from nebulae_tpu.config import RenderConfig
    from nebulae_tpu.engine.renderer import Renderer, init_frame_state
    from nebulae_tpu.engine.train import make_train_step, split_scene_params
    from nebulae_tpu.passes.gbuffer import make_camera_arrays
    from nebulae_tpu.utils.testscenes import bench_camera, helmet_field

    width, height, bounces, spp = 1920, 1080, 4, 1
    cfg = RenderConfig(
        width=width, height=height, spp=spp, max_bounces=bounces,
        enable_svgf=True, enable_tonemap=True, tracer="auto",
        # Present-only outputs, like the reference's swapchain (debug targets
        # are opt-in there too).
        lean_outputs=True,
        # Reference parity: full per-hit texture shading at every bounce
        # (pathtracer.hlsl:299-395).  The compact-domain reconstruct keeps
        # the texture gathers scaled to the live count.
        fast_bounce_shading=False,
        # Frame-lagged static compaction buckets (engine.renderer): the
        # production frame pacing -- no in-graph live-count switch.
        bucket_scheduling=True,
    )
    fs = helmet_field(3, 3, max_texture_dim=512)
    renderer = Renderer(fs, cfg)
    cam_obj = bench_camera(fs)
    cam = make_camera_arrays(cam_obj, width, height)

    n_pix = width * height
    rays_per_frame = n_pix * (1 + spp * (bounces + (bounces - 1)))

    # --- PRIMARY: forward frame (headline, full shading) ---
    # NOTE: timings force a device->host scalar each frame (float(mean));
    # on the tunneled platform block_until_ready alone has been observed to
    # return before device completion, yielding impossible numbers.
    # 3 warmup frames: frame 0 is the full-width bucket bootstrap, frame 1
    # compiles the steady-state schedule, frame 2 confirms it is stable.
    for _ in range(3):
        out = renderer.render(cam_obj)
        float(out["ldr"].mean())
    n_iter = 5
    t0 = time.perf_counter()
    for _ in range(n_iter):
        out = renderer.render(cam_obj)
        float(out["ldr"].mean())
    fwd_s = (time.perf_counter() - t0) / n_iter
    fwd_mrays = rays_per_frame / fwd_s / 1e6

    # --- PRIMARY: forward + backward (full train step, headline config) ---
    # The train step is driven directly (no host adaptive loop), so bake the
    # forward phase's converged bucket schedule in statically.
    from dataclasses import replace as _replace0

    from nebulae_tpu.engine.renderer import derive_bucket_schedule

    sched = derive_bucket_schedule(
        np.asarray(renderer.state["live_counts"]), n_pix, cfg.sort_segments
    )
    cfg_train = _replace0(cfg, bucket_schedule=sched)
    params, frozen = split_scene_params(renderer.scene)
    params["sun"] = renderer.sun
    step, optimizer = make_train_step(cfg_train, frozen, renderer.bvh)
    opt_state = optimizer.init(params)
    state = init_frame_state(cfg)
    target = jnp.zeros((height, width, 3), jnp.float32)
    jstep = jax.jit(step)
    # Frame state threads across steps (steady-state online training, like
    # the render loop); params/opt stay fixed so per-step work is constant.
    params2, opt_state2, state, loss, img = jstep(params, opt_state, cam, state, target)
    float(loss)
    t0 = time.perf_counter()
    n_bwd = 3
    for _ in range(n_bwd):
        params2, opt_state2, state, loss, img = jstep(params, opt_state, cam, state, target)
        float(loss)
    fwdbwd_s = (time.perf_counter() - t0) / n_bwd
    fwdbwd_mrays = rays_per_frame / fwdbwd_s / 1e6

    # The reference publishes no numbers (BASELINE.md), so the baseline is
    # round-over-round: round 1 measured 40.66 Mrays/s fwd+bwd on this
    # workload (BENCH_r01.json; that round's config used fast bounce
    # shading -- the current headline shades every bounce from textures,
    # i.e. strictly MORE work per ray).
    R01_FWDBWD_MRAYS = 40.66
    detail = {
        "headline_config": "full_texture_bounce_shading",
        "bucket_schedule": list(sched),
        "fwd_mrays_s": round(fwd_mrays, 2),
        "fwd_frame_ms": round(fwd_s * 1e3, 1),
        "fwdbwd_step_ms": round(fwdbwd_s * 1e3, 1),
        "rays_per_frame": rays_per_frame,
        "triangles": int(fs.num_triangles),
        "loss": float(loss),
        "device": str(jax.devices()[0]),
    }
    result = {
        "metric": (
            "Mrays/s/chip fwd+bwd, Sponza-class 1080p 1spp 4-bounce path "
            "trace + SVGF (full texture shading every bounce)"
        ),
        "value": round(fwdbwd_mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(fwdbwd_mrays / R01_FWDBWD_MRAYS, 3),
        "detail": detail,
    }
    # Emit the official number NOW: a timeout in the probes below must not
    # cost the round its benchmark (round-4 post-mortem, VERDICT.md Weak#1).
    _emit(result)

    # ---------- probes (each isolated; failures never kill the metric) ----

    # Fast-bounce-shading config (rounds 1-4's headline): face normals +
    # texture-averaged materials on secondary bounces.  Kept for
    # round-over-round comparability; CPU oracle covers it
    # (tests/test_fast_shading.py).
    from dataclasses import replace as _replace

    fast_probe = None
    try:
        cfg_fast = _replace(cfg, fast_bounce_shading=True)
        rfast = Renderer(fs, cfg_fast, bvh=renderer.bvh)
        for _ in range(3):  # schedule warmup (see headline)
            out = rfast.render(cam_obj)
            float(out["ldr"].mean())
        t0 = time.perf_counter()
        for _ in range(3):
            out = rfast.render(cam_obj)
            float(out["ldr"].mean())
        fast_fwd_s = (time.perf_counter() - t0) / 3
        pf, ff = split_scene_params(rfast.scene)
        pf["sun"] = rfast.sun
        sched_f = derive_bucket_schedule(
            np.asarray(rfast.state["live_counts"]), n_pix, cfg.sort_segments
        )
        stepf, optf = make_train_step(_replace(cfg_fast, bucket_schedule=sched_f), ff, rfast.bvh)
        osf = optf.init(pf)
        stf = init_frame_state(cfg_fast)
        jstepf = jax.jit(stepf)
        r = jstepf(pf, osf, cam, stf, target)
        float(r[3])
        t0 = time.perf_counter()
        for _ in range(3):
            r = jstepf(pf, osf, cam, r[2], target)
            float(r[3])
        fast_bwd_s = (time.perf_counter() - t0) / 3
        fast_probe = {
            "fwd_frame_ms": round(fast_fwd_s * 1e3, 1),
            "fwd_mrays_s": round(rays_per_frame / fast_fwd_s / 1e6, 2),
            "fwdbwd_step_ms": round(fast_bwd_s * 1e3, 1),
            "fwdbwd_mrays_s": round(rays_per_frame / fast_bwd_s / 1e6, 2),
        }
    except Exception:
        fast_probe = None
    detail["fast_shading"] = fast_probe

    # Moving camera (orbit): exercises SVGF motion-vector reprojection (the
    # static case skips the warp under lax.cond).  Same compiled program as
    # the headline forward.
    from nebulae_tpu.core.camera import Camera

    fwd_orbit_s = None
    try:
        def orbit_cam(i):
            ang = 0.02 * (i + 1)
            tgt = np.asarray(cam_obj.target, np.float32)
            rel = np.asarray(cam_obj.eye, np.float32) - tgt
            c, s = np.cos(ang), np.sin(ang)
            rot = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
            return Camera(eye=tgt + rot @ rel, target=tgt, fov_y_deg=cam_obj.fov_y_deg)

        for i in range(2):  # absorb a possible schedule re-jit under motion
            out = renderer.render(orbit_cam(i))
            float(out["ldr"].mean())
        t0 = time.perf_counter()
        for i in range(3):
            out = renderer.render(orbit_cam(i + 2))
            float(out["ldr"].mean())
        fwd_orbit_s = (time.perf_counter() - t0) / 3
        detail["fwd_orbit_frame_ms"] = round(fwd_orbit_s * 1e3, 1)
    except Exception:
        pass

    # Neural radiance cache ON (the reference's headline GI mode: query pass
    # + online cache training in-frame).
    nrc_fwd_s = None
    try:
        cfg_nrc = _replace(cfg, enable_nrc=True)
        renderer_nrc = Renderer(fs, cfg_nrc, bvh=renderer.bvh)
        for _ in range(3):  # schedule warmup
            out = renderer_nrc.render(cam_obj)
            float(out["ldr"].mean())
        t0 = time.perf_counter()
        for _ in range(3):
            out = renderer_nrc.render(cam_obj)
            float(out["ldr"].mean())
        nrc_fwd_s = (time.perf_counter() - t0) / 3
        detail["nrc_fwd_frame_ms"] = round(nrc_fwd_s * 1e3, 1)
    except Exception:
        pass

    # --- Sponza scale and beyond ---
    # (a) ~247k tris (4x4 field): packed fat4 tables VMEM-resident
    #     (byte-accurate gate; v5e has 128 MB physical VMEM) -- the RESIDENT
    #     path at real-Sponza triangle count.
    # (b) ~385k tris (5x5 field) with chunk_mode="subtree" forced: the
    #     chunked traversal machinery on hardware.
    def _scene_probe(grid, iters=3, cfg_probe=None):
        fsn = helmet_field(grid, grid, max_texture_dim=512)
        rn = Renderer(fsn, cfg_probe or cfg)
        camn = bench_camera(fsn)
        for _ in range(3):  # schedule warmup
            out = rn.render(camn)
            float(out["ldr"].mean())
        t0 = time.perf_counter()
        for _ in range(iters):
            out = rn.render(camn)
            float(out["ldr"].mean())
        s = (time.perf_counter() - t0) / iters
        mode = "resident"
        if rn.bvh is not None:
            if "chunks" in rn.bvh or "tri_chunks" in rn.bvh:
                mode = "chunked"
            elif "fat4nodes" in rn.bvh:
                from nebulae_tpu.kernels.pallas_trace import SINGLE_TABLE_MAX_BYTES

                if 4 * (rn.bvh["fat4nodes"].size + rn.bvh["tris"].size) > SINGLE_TABLE_MAX_BYTES:
                    mode = "paged"
        return {
            "triangles": int(fsn.num_triangles),
            "mode": mode,
            "fwd_frame_ms": round(s * 1e3, 1),
            "fwd_mrays_s": round(rays_per_frame / s / 1e6, 2),
        }

    try:
        detail["resident_247k"] = _scene_probe(4)
    except Exception:
        pass
    try:
        detail["chunked"] = _scene_probe(5, cfg_probe=_replace(cfg, chunk_mode="subtree"))
    except Exception:
        pass

    # --- NRC quality: does the cache buy quality-per-ray? (the reference's
    # entire point for NRC, NvRtxgiNRC.cpp:145-153).  Interior scene, equal
    # frame budget: accumulate K short-path frames with the cache ON vs OFF
    # and compare against a long-path brute-force accumulation.
    try:
        from nebulae_tpu.utils.nrc_quality import nrc_quality_probe

        detail["nrc_quality"] = nrc_quality_probe()
    except Exception:
        pass

    # Observability: the bench emits the same JSONL metrics stream as the app
    # (utils.metrics) so perf history is machine-readable across rounds.
    try:
        from nebulae_tpu.utils.metrics import MetricsLogger

        metrics = MetricsLogger("/root/repo/.bench_metrics.jsonl")
        metrics.scalar("fwd_frame_ms", fwd_s * 1e3)
        metrics.scalar("fwdbwd_step_ms", fwdbwd_s * 1e3)
        metrics.scalar("fwd_mrays_s", fwd_mrays)
        metrics.scalar("fwdbwd_mrays_s", fwdbwd_mrays)
        if fwd_orbit_s:
            metrics.scalar("fwd_orbit_frame_ms", fwd_orbit_s * 1e3)
        if fast_probe:
            metrics.scalar("fast_fwd_frame_ms", fast_probe["fwd_frame_ms"])
            metrics.scalar("fast_fwdbwd_step_ms", fast_probe["fwdbwd_step_ms"])
        metrics.flush()
    except Exception:
        pass

    # Re-emit the SAME headline value with the enriched detail dict.
    _emit(result)


if __name__ == "__main__":
    main()
