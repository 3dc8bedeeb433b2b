"""Frame orchestration: the whole render pipeline as one jitted function.

TPU-native equivalent of Renderer::RenderSceneDeferred's pass DAG
(/root/reference/src/Renderer.cpp:90-152: BeginFrame -> G-buffer -> PBR ->
GI path trace -> SVGF -> tonemap).  Where the reference records 7 command
lists serialized by fences per frame, here the DAG is a single XLA program:
`render_frame(scene, sun, camera, state, frame)` traced once per (config,
shape) and replayed every frame; XLA owns scheduling and hazards.

Differentiability: `jax.grad` through `render_frame` (or a loss on its
output) yields gradients w.r.t. material tables (scene arrays), sun/sky
parameters, and -- once enabled -- the NRC MLP parameters carried in the
frame state.  Visibility is detached (see passes.gbuffer).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from nebulae_tpu.config import RenderConfig, SunLight
from nebulae_tpu.core import rng as nrng
from nebulae_tpu.core.camera import Camera
from nebulae_tpu.core.scene import FlatScene
from nebulae_tpu.passes.direct import shade_direct
from nebulae_tpu.passes.gbuffer import camera_rays_jax, make_camera_arrays, render_gbuffer
from nebulae_tpu.passes.pathtrace import path_trace
from nebulae_tpu.passes.svgf import init_history, svgf_denoise
from nebulae_tpu.passes.tonemap import aces_tonemap
from nebulae_tpu.tracer.trace import make_tracer


def init_frame_state(cfg: RenderConfig) -> dict:
    """Per-frame carried state: SVGF ping-pong history, frame counter, and
    (when enabled) the NRC cache parameters + optimizer state."""
    state = {
        "svgf": init_history(cfg.height, cfg.width),
        "frame": jnp.uint32(0),
        "reset_history": jnp.bool_(True),
    }
    if cfg.enable_nrc:
        from nebulae_tpu.nrc.cache import init_cache

        state["nrc"] = init_cache(seed=0)
    if cfg.bucket_scheduling:
        # Per-vertex live-lane counts from the last frame -- the host-side
        # frame-lagged bucket scheduler reads these (Renderer._next_schedule).
        state["live_counts"] = jnp.zeros(cfg.max_bounces, jnp.int32)
    return state


def nrc_train_frame(scene, sun, closest_fn, any_fn, cache_state, cam, frame, cfg):
    """The QueryAndTrain training half (DeferredRenderer.cpp:523-560): the
    reduced-resolution training path trace + k adam steps on the cache."""
    from nebulae_tpu.nrc.cache import make_optimizer
    from nebulae_tpu.passes.nrc_pathtrace import path_trace_nrc_train

    optimizer = make_optimizer(cfg.nrc_learning_rate)
    return path_trace_nrc_train(
        scene, sun, closest_fn, any_fn, cfg, cache_state, optimizer, cam, frame
    )


def render_frame(scene: dict, bvh: dict | None, sun: SunLight, cam: dict, state: dict, cfg: RenderConfig):
    """Pure jittable frame function.

    Returns (outputs, new_state); outputs has 'hdr' (pre-denoise), 'denoised',
    'ldr' [H, W, 3] and the G-buffer channels.
    """
    w, h = cfg.width, cfg.height
    n_pix = w * h
    closest_fn, any_fn = make_tracer(scene, bvh, cfg)

    o, d = camera_rays_jax(cam, w, h)
    from nebulae_tpu.passes.gbuffer import blocked_closest

    mips_hw = (h, w) if cfg.texture_mips else None
    gbuf = render_gbuffer(scene, blocked_closest(closest_fn, h, w), o, d, image_hw=mips_hw)

    ys, xs = jnp.meshgrid(jnp.arange(h, dtype=jnp.uint32), jnp.arange(w, dtype=jnp.uint32), indexing="ij")
    rng_state = nrng.init_rng(xs.reshape(-1), ys.reshape(-1), w, state["frame"])

    new_state = dict(state)
    acc = jnp.zeros((n_pix, 3), jnp.float32)
    from nebulae_tpu.core import brdf as _brdf

    if cfg.enable_gi and cfg.enable_nrc:
        # Online cache training (the QueryAndTrain analogue) fused into the
        # same jitted frame at reduced resolution -- and BEFORE the query
        # pass, matching the reference's order: QueryAndTrain runs the
        # training iterations first, then Resolve reads the post-train
        # cache (DeferredRenderer.cpp:560-587).  The query pass below
        # therefore sees this frame's updated EMA parameters.
        new_state["nrc"], nrc_loss = nrc_train_frame(
            scene, sun, closest_fn, any_fn, state["nrc"], cam, state["frame"], cfg
        )
    else:
        nrc_loss = jnp.float32(0.0)

    live_counts = None
    for _ in range(cfg.spp):
        sample_gbuf = gbuf
        if cfg.jitter_primary:
            # Per-sample sub-pixel jitter (2 RNG draws, then the path draws
            # -- the draw-order contract in core.brdf): each sample traces
            # its own primary hit, decorrelating spp like the reference's
            # training-pass jitter (pathtracer.hlsl:414-420).  The
            # unjittered `gbuf` above still feeds SVGF guidance + outputs.
            rng_state, jx = nrng.next_float(rng_state)
            rng_state, jy = nrng.next_float(rng_state)
            o_j, d_j = camera_rays_jax(cam, w, h, jitter=jnp.stack([jx, jy], -1))
            sample_gbuf = render_gbuffer(
                scene, blocked_closest(closest_fn, h, w), o_j, d_j, image_hw=mips_hw
            )
        if cfg.enable_gi and cfg.enable_nrc:
            from nebulae_tpu.passes.nrc_pathtrace import path_trace_nrc_query

            # stop_gradient: the outer (inverse-rendering) loss must not
            # differentiate THROUGH the in-frame adam update -- that path
            # (materials -> training records -> adam moments -> queried
            # radiance) is ill-conditioned and NaNs the material gradients;
            # cache-parameter gradients are computed by the training pass's
            # own inner value_and_grad.  Forward values still follow the
            # reference's train-then-resolve order.
            sample, rng_state, nrc_aux = path_trace_nrc_query(
                scene, sample_gbuf, sun, closest_fn, any_fn, rng_state, cfg,
                jax.lax.stop_gradient(new_state["nrc"]["ema_params"]),
            )
            live_counts = nrc_aux.get("live_counts", live_counts)
        elif cfg.enable_gi:
            sample, rng_state, counts = path_trace(
                scene, sample_gbuf, sun, closest_fn, any_fn, rng_state, cfg
            )
            live_counts = counts if counts is not None else live_counts
        else:
            sample, rng_state = shade_direct(scene, sample_gbuf, sun, any_fn, rng_state)
        if cfg.jitter_primary:
            # Per-sample miss pixels see the sky along their own jittered ray.
            sky_s = _brdf.sky_eval(sample_gbuf["ray_d"], sun, scene, cfg, jnp)
            sample = jnp.where(sample_gbuf["hit"][..., None], sample, sky_s)
        acc = acc + sample
    radiance = acc / cfg.spp

    if not cfg.jitter_primary:
        # Primary misses show the sky (with jitter the per-sample fold above
        # already composited each sample's own sky).
        sky = _brdf.sky_eval(gbuf["ray_d"], sun, scene, cfg, jnp)
        radiance = jnp.where(gbuf["hit"][..., None], radiance, sky)

    img = radiance.reshape(h, w, 3)
    depth = gbuf["depth"].reshape(h, w)
    normal = gbuf["normal_s"].reshape(h, w, 3)

    if cfg.enable_svgf:
        hist = state["svgf"]
        reset = state["reset_history"]

        if cfg.svgf_reproject:
            # Motion-vector temporal reprojection: warp history through the
            # previous frame's view-projection (passes.svgf.reproject_history).
            # When the camera did not move since the last frame the warp is
            # the identity, so a traced compare skips its ~90 ms gather
            # entirely (the reference's analogue: it only denoises static
            # frames at all, DeferredRenderer.cpp:595).
            from nebulae_tpu.passes.svgf import reproject_history

            position_img = gbuf["position"].reshape(h, w, 3)
            hist_bufs = {
                k: hist[k] for k in ("radiance", "depth", "normal", "moments", "histlen")
            }

            def warp(bufs):
                warped, valid = reproject_history(
                    dict(bufs), position_img, hist["prev_viewproj"], w, h,
                    prev_eye=hist["prev_eye"], current_depth=depth,
                )
                # Invalid (off-screen/behind-camera) lookups: poison the depth
                # so the temporal stability weight goes to zero -> reset.
                warped["depth"] = jnp.where(valid, warped["depth"], -1e9)
                return warped

            same_cam = jnp.all(hist["prev_viewproj"] == cam["viewproj"]) & jnp.all(
                hist["prev_eye"] == cam["eye"]
            )
            hist = jax.lax.cond(same_cam, lambda bufs: dict(bufs), warp, hist_bufs)

        def pick(cur, old):
            return jnp.where(reset, cur, old)

        from nebulae_tpu.core import math as nmath

        lum = nmath.luminance(img, jnp)
        hist = {
            "radiance": pick(img, hist["radiance"]),
            "depth": pick(depth, hist["depth"]),
            "normal": pick(normal, hist["normal"]),
            "moments": pick(jnp.stack([lum, lum * lum], -1), hist["moments"]),
            "histlen": pick(jnp.zeros_like(hist["histlen"]), hist["histlen"]),
        }
        denoised, new_hist = svgf_denoise(
            img, depth, normal, hist, cfg, hit=gbuf["hit"].reshape(h, w)
        )
        new_hist["prev_viewproj"] = cam["viewproj"]
        new_hist["prev_eye"] = cam["eye"]
        new_state["svgf"] = new_hist
    else:
        denoised = img
    new_state["frame"] = state["frame"] + jnp.uint32(1)
    new_state["reset_history"] = jnp.bool_(False)
    if cfg.bucket_scheduling:
        new_state["live_counts"] = (
            live_counts if live_counts is not None else state["live_counts"]
        )

    ldr = aces_tonemap(denoised) if cfg.enable_tonemap else denoised
    if cfg.lean_outputs:
        return {
            "ldr": ldr,
            "nrc_loss": nrc_loss,
            "nrc_query_frac": (
                nrc_aux["query_frac"] if (cfg.enable_gi and cfg.enable_nrc) else jnp.float32(0.0)
            ),
        }, new_state
    outputs = {
        "hdr": img,
        "denoised": denoised,
        "ldr": ldr,
        "depth": depth,
        "normal": normal,
        "albedo": gbuf["albedo"].reshape(h, w, 3),
        "hit": gbuf["hit"].reshape(h, w),
        "nrc_loss": nrc_loss,
        "nrc_query_frac": (
            nrc_aux["query_frac"] if (cfg.enable_gi and cfg.enable_nrc) else jnp.float32(0.0)
        ),
    }
    if cfg.nrc_debug is not None and cfg.enable_gi and cfg.enable_nrc:
        # Debug resolve modes (NrcStructures.h:186-245 analogue); last-spp
        # sample's counters.  Colorize host-side (utils.display.colorize_map).
        if cfg.nrc_debug == "bounce_heatmap":
            outputs["nrc_debug"] = nrc_aux["n_vert"].reshape(h, w)
        elif cfg.nrc_debug == "query_bounce":
            outputs["nrc_debug"] = nrc_aux["term_bounce"].reshape(h, w)
        elif cfg.nrc_debug == "cache_view":
            from nebulae_tpu.nrc.cache import query_cache

            surf0 = {k: gbuf[k] for k in ("position", "normal_s", "albedo", "roughness", "metalness")}
            pred = query_cache(
                state["nrc"]["ema_params"], surf0, gbuf["view"],
                scene["aabb_min"], scene["aabb_max"],
                learn_irradiance=cfg.nrc_learn_irradiance,
            )
            outputs["nrc_debug"] = jnp.where(
                gbuf["hit"][..., None], pred, 0.0
            ).reshape(h, w, 3)
        else:
            raise ValueError(f"unknown nrc_debug mode: {cfg.nrc_debug!r}")
    return outputs, new_state


# Headroom for the frame-lagged bucket schedule: a bucket is only chosen if
# it covers live_count / SCHEDULE_MARGIN lanes, so the wavefront can grow
# ~11% frame-over-frame before an overflow (which drops the excess live
# lanes to miss records for that one frame; the schedule self-corrects on
# the next).  The margin must stay NEAR 1: the fraction ladder is coarse
# (4x steps), so a conservative margin bumps a vertex a whole 4x bucket up
# -- measured on v5e, a 0.75 margin pushed a 21%-live bounce to FULL width
# and cost +40 ms/frame vs the live-count switch.  0.9 keeps the bucket the
# switch would pick while still absorbing slow drift.
SCHEDULE_MARGIN = 0.9


def derive_bucket_schedule(counts, n_lanes: int, segments: int = 1,
                           margin: float = SCHEDULE_MARGIN) -> tuple:
    """Static per-vertex compaction fractions from measured live counts.

    `counts` [V]: previous frame's per-vertex live-lane counts (busiest
    segment when segment-local).  Picks the largest COMPACT_FRACTIONS
    divisor whose bucket covers count/margin; falls back to full width."""
    from nebulae_tpu.tracer.sorting import COMPACT_FRACTIONS, _frac_to_bucket

    m = n_lanes // max(int(segments), 1)
    fracs = []
    for c in np.asarray(counts):
        chosen = 1
        for f in sorted(COMPACT_FRACTIONS, reverse=True):
            if f <= 1:
                continue
            b = _frac_to_bucket(f, m)
            if b < m and float(c) <= margin * b:
                chosen = int(f)
                break
        fracs.append(chosen)
    return tuple(fracs)


class Renderer:
    """Host-side convenience wrapper: owns device arrays, jit cache, state.

    The `Nebulae`/`Renderer` singleton analogue (Nebulae.h:22-64) minus the
    Win32 shell: init with a scene, call `.render(camera)` per frame, read
    images back.  Presentation (Swapchain analogue) is utils.display.

    With cfg.bucket_scheduling the renderer runs the reference's
    frame-lagged sizing trick (ComputeIdealTrainingDimensions,
    DeferredRenderer.cpp:110) on wavefront compaction: each frame's
    per-vertex live counts ride the frame state; before the next frame the
    host derives a STATIC bucket schedule from them and dispatches the
    jitted program compiled for that schedule (cached per schedule) -- no
    in-graph live-count lax.switch serializing the bounce loop.  Frame 0
    runs full-width buckets (exact, and the cheapest program to compile).
    """

    def __init__(self, flat_scene: FlatScene, cfg: RenderConfig, sun: SunLight | None = None, bvh=None):
        self.cfg = cfg
        self.scene = {k: jnp.asarray(v) for k, v in flat_scene.device_arrays().items()}
        # Instance table for runtime per-instance transforms (RTScene
        # analogue); base triangles kept host-side for update_instances.
        self._instance_of_tri = getattr(flat_scene, "instance_of_tri", None)
        if self._instance_of_tri is not None:
            self._base_tri_pos = np.array(flat_scene.tri_pos, np.float32, copy=True)
            self._base_tri_nrm = np.array(flat_scene.tri_nrm, np.float32, copy=True)
        t_count = flat_scene.num_triangles
        needs_bvh = cfg.tracer in ("bvh", "pallas") or (
            cfg.tracer == "auto" and t_count > cfg.bruteforce_max_tris
        )
        if bvh is None and needs_bvh:
            from nebulae_tpu.bvh import build_bvh_fast
            from nebulae_tpu.kernels.pallas_trace import (
                SINGLE_TABLE_MAX_BYTES,
                SINGLE_TABLE_MAX_TRIS,
                pack_bvh_chunks,
                pack_bvh_fat,
                pack_bvh_fat4,
                pack_bvh_for_pallas,
                pack_bvh_tri_chunks,
            )

            pack_fat = pack_bvh_fat4 if cfg.bvh_wide == 4 else pack_bvh_fat
            flat_bvh = build_bvh_fast(flat_scene.tri_pos, max_leaf=cfg.bvh_max_leaf)
            bvh = flat_bvh.device_arrays()
            chunk_mode = cfg.chunk_mode
            if chunk_mode == "auto":
                # Measured crossover (config.py chunk_mode notes): subtree
                # re-walks win while the scene is <= 3 chunks, demand-paged
                # streaming wins beyond.
                from nebulae_tpu.kernels.pallas_trace import MAX_CHUNK_TRIS

                est_chunks = -(-t_count // MAX_CHUNK_TRIS)
                chunk_mode = "subtree" if est_chunks <= 3 else "paged"
            # The single-table gate is BYTE-accurate: past the quick
            # tri-count filter, pack the fat4 tables and keep them resident
            # whenever they actually fit the measured VMEM budget (a 247k-tri
            # scene packs to 14.8 MB and runs resident on v5e; chunking it
            # costs an extra whole-tree walk per traversal).
            single_packed = cand = None
            if (
                t_count > SINGLE_TABLE_MAX_TRIS
                and cfg.bvh_wide == 4
                and cfg.chunk_mode == "auto"  # explicit modes force chunking
            ):
                cand = pack_bvh_fat4(
                    flat_bvh, flat_scene.tri_pos, tri_group=cfg.bvh_tri_group
                )
                if (
                    cand is not None
                    and cand["tris"].nbytes + cand["fat4nodes"].nbytes
                    <= SINGLE_TABLE_MAX_BYTES
                ):
                    single_packed = cand
            if single_packed is not None:
                bvh.update(single_packed)
            elif chunk_mode == "paged" and cfg.bvh_wide == 4 and (
                packed_full := (
                    cand
                    if cand is not None
                    else pack_bvh_fat4(
                        flat_bvh, flat_scene.tri_pos, tri_group=cfg.bvh_tri_group
                    )
                )
            ) is not None:
                # Demand-paged: ONE full fat4 table; the kernels keep the tri
                # table in HBM behind a paged VMEM cache.  Explicit
                # chunk_mode="paged" takes this path at ANY size (the knob
                # bounds VMEM use / exercises the paged kernels); auto only
                # routes here past the byte budget.  make_tracer honors the
                # same rule (cfg.chunk_mode or table bytes).
                from nebulae_tpu.kernels.pallas_trace import pad_tris_for_paging

                packed_full["tris"] = pad_tris_for_paging(packed_full["tris"])
                bvh.update(packed_full)
            elif t_count > SINGLE_TABLE_MAX_TRIS:
                # Sponza-class: VMEM-sized chunks (cfg.chunk_mode picks the
                # strategy; "tri" needs fat4 and falls back to subtree when
                # the whole-tree node table alone busts the VMEM budget).
                tri_chunked = (
                    pack_bvh_tri_chunks(
                        flat_bvh, flat_scene.tri_pos, tri_group=cfg.bvh_tri_group
                    )
                    if chunk_mode == "tri" and cfg.bvh_wide == 4
                    else None
                )
                if tri_chunked is not None:
                    bvh.update(tri_chunked)
                else:
                    bvh["chunks"] = pack_bvh_chunks(
                        flat_bvh, flat_scene.tri_pos, wide=cfg.bvh_wide,
                        tri_group=cfg.bvh_tri_group,
                    )
            else:
                # Fat children-at-parent layout (2x fewer kernel iterations);
                # legacy one-node layout when the whole tree is a single leaf.
                bvh.update(
                    pack_fat(flat_bvh, flat_scene.tri_pos, tri_group=cfg.bvh_tri_group)
                    or pack_bvh_for_pallas(
                        flat_bvh, flat_scene.tri_pos, tri_group=cfg.bvh_tri_group
                    )
                )
        def _to_dev(k, v):
            if k == "chunks":
                return [jax.tree.map(jnp.asarray, c) for c in v]
            if k == "tri_chunks":
                # TriChunk slot bounds are pytree aux_data (static ints).
                return [jax.tree.map(jnp.asarray, c) for c in v]
            return jnp.asarray(v)

        self.bvh = (
            {k: _to_dev(k, v) for k, v in bvh.items()}
            if isinstance(bvh, dict) and bvh
            else None
        )
        if sun is None:
            sun = SunLight.default(np)
        self.sun = jax.tree.map(jnp.asarray, sun)
        self.state = init_frame_state(cfg)
        self._build_jits()

    def _make_jit(self, cfg):
        """Jitted frame for one concrete config (DistRenderer adds shardings)."""
        return jax.jit(partial(render_frame, cfg=cfg))

    def _build_jits(self):
        self._sched_jits = {}
        self._frames_rendered = 0  # schedule bootstrap restarts on re-jit
        self._active_sched = None
        self._sched_checked_at = -1
        if self.cfg.bucket_scheduling and self.cfg.bucket_schedule is None:
            # Frame 0 bootstrap: full-width buckets -- always exact, no
            # switch, and the cheapest big program to compile.  Live counts
            # from it drive the steady-state schedule from frame 1 on.
            from dataclasses import replace

            full = tuple([1] * self.cfg.max_bounces)
            self._jit_frame = self._make_jit(replace(self.cfg, bucket_schedule=full))
            self._sched_jits[full] = self._jit_frame
        else:
            self._jit_frame = self._make_jit(self.cfg)

    def _frame_jit(self):
        """The program to dispatch this frame: schedule-specific when
        bucket scheduling is live, else the base program."""
        if not (self.cfg.bucket_scheduling and self.cfg.bucket_schedule is None):
            return self._jit_frame
        counts = self.state.get("live_counts")
        frames = getattr(self, "_frames_rendered", 0)
        if counts is None or frames == 0:
            return self._jit_frame  # frame 0: full-width bootstrap
        # Periodic re-derivation: the counts readback is a device->host
        # transfer with fixed per-call latency (measured ~25 ms/frame when
        # read every frame through the v5e tunnel -- it erased the win).
        # Liveness drifts slowly, so check every bucket_check_every frames
        # and reuse the cached schedule in between; frames 1-2 always check
        # so the bootstrap hands off immediately.
        cached = getattr(self, "_active_sched", None)
        checked_at = getattr(self, "_sched_checked_at", -1)
        if (
            cached is not None
            and cached in self._sched_jits
            and frames - checked_at < max(self.cfg.bucket_check_every, 1)
            and frames > 2
        ):
            return self._sched_jits[cached]
        if getattr(counts, "is_fully_addressable", True) is False:
            # Multi-process mesh: the replicated global array is not fully
            # addressable; every process reads its local replica (identical
            # values -> identical derived schedule on every host).
            counts = counts.addressable_data(0)
        sched = derive_bucket_schedule(
            np.asarray(counts), self.cfg.width * self.cfg.height,
            self.cfg.sort_segments,
        )
        self._active_sched = sched
        self._sched_checked_at = frames
        fn = self._sched_jits.get(sched)
        if fn is None:
            from dataclasses import replace

            fn = self._make_jit(replace(self.cfg, bucket_schedule=sched))
            self._sched_jits[sched] = fn
            # Bounded program cache: a long dynamic-scene run can drift
            # through many distinct schedules; evict the oldest compiled
            # programs past a small working set (revisits recompile via the
            # persistent XLA compile cache, which makes that cheap).
            while len(self._sched_jits) > 8:
                oldest = next(iter(self._sched_jits))
                if oldest == sched:
                    break
                del self._sched_jits[oldest]
        else:
            # LRU refresh (dict preserves insertion order).
            self._sched_jits.pop(sched, None)
            self._sched_jits[sched] = fn
        return fn

    def reset_history(self):
        self.state["reset_history"] = jnp.bool_(True)

    def update_instances(self, transforms):
        """Move rigid instances at runtime: per-instance 3x4 transforms map
        the base (load-time) triangles, then the BVH refits on device --
        the TLAS-instance-update analogue (RTCommon.h:85-107 +
        RTAccelerationStructureBuilder.cpp:99-131).  Requires the scene to
        have been assembled with instance ids (FlatScene.instance_of_tri).

        transforms: [num_instances, 3, 4] float32."""
        if self._instance_of_tri is None:
            raise ValueError(
                "scene has no instance table (FlatScene.instance_of_tri); "
                "use update_geometry for free-form motion"
            )
        from nebulae_tpu.core.scene import transform_instances

        pos, nrm = transform_instances(
            self._base_tri_pos, self._base_tri_nrm, self._instance_of_tri, transforms
        )
        self.update_geometry(pos, tri_nrm=nrm)

    def resize(self, width: int, height: int):
        """The WM_SIZE protocol (Renderer::Resize, Renderer.cpp:215-229 +
        DeferredRenderer.cpp:59-81): reallocate every per-resolution target
        -- here the SVGF history ping-pong and frame counter in the carried
        state -- while the scene, BVH tables, sun, and the NRC cache (which
        the reference also keeps across resize; it reconfigures lazily next
        BeginFrame) survive.  The jitted program swaps like a shader reload."""
        from dataclasses import replace

        cfg = replace(self.cfg, width=width, height=height)
        nrc = self.state.get("nrc")
        self.cfg = cfg
        self.state = init_frame_state(cfg)
        if nrc is not None:
            self.state["nrc"] = nrc
        self._build_jits()

    def update_config(self, cfg: RenderConfig):
        """Runtime reconfiguration -- the headless analogue of the
        reference's ImGui panels (DeferredRenderer.cpp:161-252).  Traced
        inputs (sun/sky) already change per-frame for free; static knobs
        (spp, bounces, SVGF constants, NRC schedule...) swap the jitted
        program, exactly like the reference's shader hot reload recompiles
        the RTPSO.  Resolution changes go through `resize` (the WM_SIZE
        path), which also reallocates the per-resolution frame state."""
        if (cfg.width, cfg.height) != (self.cfg.width, self.cfg.height):
            raise ValueError("update_config cannot change resolution; use resize()")
        enable_nrc_turned_on = cfg.enable_nrc and not self.cfg.enable_nrc
        self.cfg = cfg
        self._build_jits()
        if enable_nrc_turned_on and "nrc" not in self.state:
            from nebulae_tpu.nrc.cache import init_cache

            self.state["nrc"] = init_cache(seed=0)
        if cfg.bucket_scheduling:
            lc = self.state.get("live_counts")
            if lc is None or lc.shape[0] != cfg.max_bounces:
                self.state["live_counts"] = jnp.zeros(cfg.max_bounces, jnp.int32)
        elif "live_counts" in self.state:
            del self.state["live_counts"]

    def update_geometry(self, tri_pos, tri_nrm=None):
        """Dynamic-scene geometry update: swap the world triangles, refit the
        BVH bottom-up and repack the traversal tables -- all on device in one
        jitted program.  The TLAS-refit analogue
        (/root/reference/src/nri/raytracing/RTAccelerationStructureBuilder.cpp:99-131,
        lazy rebuild DeferredRenderer.cpp:978-1030): topology is fixed (same
        triangle count, same tree); only positions (and optionally vertex
        normals, for rigid motion) change.  Scene AABB and NRC position
        encoding keep the build-time bounds, like the reference's fixed
        sceneBounds (DeferredRenderer.cpp:104-118) -- keep animation inside
        the original extents or rebuild.

        tri_pos [T, 3, 3] float32; tri_nrm optional [T, 3, 3]."""
        if self.bvh is not None and ("chunks" in self.bvh or "tri_chunks" in self.bvh):
            # Chunked tables re-base the tree per chunk, so a direct refit is
            # unsupported -- auto-route the scene to the demand-paged layout
            # (ONE whole-tree fat4 table, refittable at any size; the tri
            # table stays in HBM behind the kernel's paged VMEM cache).  The
            # reference's TLAS refits at any size too
            # (RTAccelerationStructureBuilder.cpp:99-131); a one-time repack
            # here keeps that contract for dynamic chunked-scale scenes.
            self._route_chunked_to_paged()
        if not hasattr(self, "_refit_fn"):
            self._refit_fn = self._build_refit_fn()
        tri_pos = jnp.asarray(tri_pos, jnp.float32)
        updates = self._refit_fn(
            tri_pos,
            None if tri_nrm is None else jnp.asarray(tri_nrm, jnp.float32),
            self.scene,
            self.bvh,
        )
        self.scene.update(updates["scene"])
        if self.bvh is not None:
            self.bvh.update(updates["bvh"])

    def _route_chunked_to_paged(self):
        """Swap subtree/tri-chunked traversal tables for the demand-paged
        single-table layout (dynamic-scene path; see update_geometry)."""
        if self.cfg.bvh_wide != 4:
            raise NotImplementedError(
                "refit over chunked fat2 tables is unsupported; use "
                "bvh_wide=4 (default) or rebuild the Renderer"
            )
        from types import SimpleNamespace

        from nebulae_tpu.kernels.pallas_trace import (
            pack_bvh_fat4,
            pad_tris_for_paging,
        )
        from nebulae_tpu.utils.logging import log_info

        log_info(
            "update_geometry on a chunked scene: repacking traversal tables "
            "to chunk_mode='paged' (one-time cost; refit is supported there)"
        )
        host = SimpleNamespace(
            **{
                k: np.asarray(self.bvh[k])
                for k in (
                    "node_lo", "node_hi", "node_first", "node_count",
                    "node_skip", "node_right", "tri_index",
                )
            }
        )
        host.num_nodes = host.node_count.shape[0]
        packed = pack_bvh_fat4(
            host, np.asarray(self.scene["tri_pos"]), tri_group=self.cfg.bvh_tri_group
        )
        if packed is None:
            raise RuntimeError("paged repack failed (degenerate root leaf)")
        packed["tris"] = pad_tris_for_paging(packed["tris"])
        self.bvh.pop("chunks", None)
        self.bvh.pop("tri_chunks", None)
        self.bvh.pop("fat4nodes", None)
        self.bvh.pop("fatnodes", None)
        self.bvh.update({k: jnp.asarray(v) for k, v in packed.items()})
        # Structure changed: drop the cached refit program + jitted frames
        # (jax.jit retraces on the new bvh pytree structure anyway).
        if hasattr(self, "_refit_fn"):
            del self._refit_fn
        self._build_jits()

    def _build_refit_fn(self):
        """Host-static refit metadata (tree levels, fat-table slot maps) +
        the jitted device program that consumes it."""
        from functools import partial as _partial
        from types import SimpleNamespace

        from nebulae_tpu.bvh.refit import (
            compute_levels,
            refit_bvh,
            repack_pallas_bounds,
            repack_pallas_fat4_bounds,
            repack_pallas_fat_bounds,
            repack_pallas_tris,
        )
        from nebulae_tpu.kernels.pallas_trace import grouped_tri_ids

        meta = {}
        if self.bvh is not None:
            host = SimpleNamespace(
                **{
                    k: np.asarray(self.bvh[k])
                    for k in ("node_first", "node_count", "node_right", "tri_index")
                }
            )
            host.num_nodes = host.node_count.shape[0]
            meta["levels"] = compute_levels(host)
            g = 1
            if "tris" in self.bvh:
                from nebulae_tpu.kernels.pallas_trace import TRI_STRIDE

                g = int(self.bvh["tris"].shape[1]) // TRI_STRIDE
                slot_tri = grouped_tri_ids(host, g)
                # Demand-paged tables are padded to PAGE_TILES block
                # multiples (pad_tris_for_paging); pad the slot map with
                # empty (-1) slots so the repack covers the padded blocks.
                need = int(self.bvh["tris"].shape[0]) * 128
                if slot_tri.shape[0] < need:
                    slot_tri = np.concatenate(
                        [slot_tri,
                         np.full((need - slot_tri.shape[0], g), -1, slot_tri.dtype)]
                    )
                meta["slot_tri"] = slot_tri
            if "fat4nodes" in self.bvh:
                meta["fat4_slots"] = np.asarray(self.bvh["fat4_slots"])
            elif "fatnodes" in self.bvh:
                meta["inner_idx"] = np.nonzero(host.node_count == 0)[0].astype(np.int64)
                meta["node_right"] = host.node_right

        max_leaf = self.cfg.bvh_max_leaf

        def refit(tri_pos, tri_nrm, scene, bvh):
            from nebulae_tpu.core import math as nmath

            e1 = tri_pos[:, 1] - tri_pos[:, 0]
            e2 = tri_pos[:, 2] - tri_pos[:, 0]
            fn = nmath.normalize(jnp.cross(e1, e2))
            nrm = scene["tri_nrm"] if tri_nrm is None else tri_nrm
            # Geometric normals follow the average shading normal's side
            # (core.scene.face_normals semantics).
            flip = (fn * nrm.mean(axis=1)).sum(-1) < 0.0
            fn = jnp.where(flip[:, None], -fn, fn)
            tri_geom = scene["tri_geom"]
            tri_geom = tri_geom.at[:, 0:3].set(tri_pos[:, 0])
            tri_geom = tri_geom.at[:, 3:6].set(e1)
            tri_geom = tri_geom.at[:, 6:9].set(e2)
            tri_fast = scene["tri_fast"].at[:, 9:12].set(fn)
            if tri_nrm is not None:
                t = tri_pos.shape[0]
                tri_geom = tri_geom.at[:, 9:18].set(tri_nrm.reshape(t, 9))
                tri_fast = tri_fast.at[:, 0:9].set(tri_nrm.reshape(t, 9))
            s_up = {
                "tri_pos": tri_pos,
                "tri_face_nrm": fn,
                "tri_geom": tri_geom,
                "tri_fast": tri_fast,
            }
            if tri_nrm is not None:
                s_up["tri_nrm"] = tri_nrm
            b_up = {}
            if bvh is not None:
                lo, hi = refit_bvh(bvh, tri_pos, meta["levels"], max_leaf=max_leaf)
                b_up = {"node_lo": lo, "node_hi": hi}
                if "tris" in bvh:
                    b_up["tris"] = repack_pallas_tris(bvh["tris"], tri_pos, meta["slot_tri"])
                if "fat4nodes" in bvh:
                    b_up["fat4nodes"] = repack_pallas_fat4_bounds(
                        bvh["fat4nodes"], lo, hi, meta["fat4_slots"]
                    )
                elif "fatnodes" in bvh:
                    b_up["fatnodes"] = repack_pallas_fat_bounds(
                        bvh["fatnodes"], lo, hi, meta["inner_idx"], meta["node_right"]
                    )
                elif "nodes" in bvh:
                    b_up["nodes"] = repack_pallas_bounds(bvh["nodes"], lo, hi)
            return {"scene": s_up, "bvh": b_up}

        return jax.jit(refit)

    def render(self, camera: Camera, sun: SunLight | None = None):
        # Camera-motion detection, mirroring the reference's BeginFrame check
        # (DeferredRenderer.cpp:133-148).  With temporal reprojection enabled
        # the history survives motion (warped); without it, motion resets.
        fingerprint = (
            tuple(np.asarray(camera.eye, np.float32).tolist())
            + tuple(np.asarray(camera.target, np.float32).tolist())
            + (float(camera.fov_y_deg),)
        )
        moved = getattr(self, "_last_cam", None) is not None and fingerprint != self._last_cam
        if moved and not self.cfg.svgf_reproject:
            self.reset_history()
        self._last_cam = fingerprint
        cam = make_camera_arrays(camera, self.cfg.width, self.cfg.height)
        outputs, self.state = self._frame_jit()(
            self.scene, self.bvh, sun if sun is not None else self.sun, cam, self.state
        )
        self._frames_rendered = getattr(self, "_frames_rendered", 0) + 1
        return outputs
