"""Configuration system.

Two layers, mirroring the reference's split between the static CLI `Config`
store (/root/reference/src/common/Configuration.h:41-69) and the runtime
ImGui-mutable state (DeferredRenderer.h:111-125):

  * ``RenderConfig`` -- static, hashable compile-time options (resolution,
    sample counts, bounce depth, toggles). Changing one re-jits, like the
    reference's shader-reload path.
  * ``SunLight`` -- a differentiable pytree of lighting parameters (sun
    direction/radiance/angular size, sky color). These are *inputs* to the
    jitted frame so they can be adjusted every frame and differentiated.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

try:  # flax.struct gives us a frozen pytree dataclass for traced params
    from flax import struct
except ImportError:  # pragma: no cover
    struct = None


@dataclass(frozen=True)
class RenderConfig:
    """Static render options (hashable -> usable as a jit static arg)."""

    width: int = 256
    height: int = 256
    spp: int = 1
    # Path depth: reference default 8, UI range 1-32 (DeferredRenderer.h:118-125)
    max_bounces: int = 8
    # Russian-roulette-style throughput cutoff (reference UI "throughput threshold")
    throughput_threshold: float = 0.0
    # Feature toggles
    enable_gi: bool = True
    enable_svgf: bool = True
    enable_nrc: bool = False
    enable_tonemap: bool = True
    # Lat-long environment-map sky (IBL) instead of the constant sky color;
    # requires scene["env_map"] [H, W, 3] f32
    enable_envmap: bool = False
    jitter_primary: bool = False
    # SVGF (constants from SVGFDenoiser.h:76-92)
    svgf_temporal_alpha: float = 0.9
    svgf_depth_sigma: float = 0.002
    svgf_variance_eps: float = 1e-4
    # NOTE deviation: the reference hardcodes phiColor = 4/255
    # (SVGFDenoiser.h:85-92), an 8-bit-scale constant -- against HDR
    # luminance differences that makes wl = exp(-|dY|/(phi_c*sqrt(var)))
    # collapse to the center tap, i.e. the a-trous filter barely filters
    # (measured: max pixel change 0.012 on a noisy Cornell GI frame).  We use
    # the SVGF paper's sigma_c = 4, which actually denoises; set 4/255 to
    # reproduce the reference behaviour bit-for-bit.
    svgf_phi_color: float = 4.0
    svgf_phi_normal: float = 128.0
    svgf_phi_depth: float = 0.002
    svgf_atrous_passes: int = 4
    svgf_pallas: bool = True  # fused Pallas stencils on TPU (XLA elsewhere)
    # Motion-vector temporal reprojection (beyond the reference, which skips
    # SVGF entirely while the camera moves)
    svgf_reproject: bool = True
    # NRC
    nrc_max_path_vertices: int = 8
    # Training schedule (DeferredRenderer.cpp:110, 229-234 + NrcCommon.h:293-305):
    # each frame runs `nrc_train_iterations` adam steps on
    # `nrc_records_per_iteration`-record batches; the training-pass resolution
    # is sized so the pass generates about iterations x records records
    # (ComputeIdealTrainingDimensions analogue, passes.nrc_pathtrace).
    nrc_train_iterations: int = 4
    nrc_records_per_iteration: int = 16384
    nrc_self_training: bool = True
    nrc_learning_rate: float = 1e-2
    nrc_terminate_threshold: float = 0.01  # spread-ratio termination c
    # Training-path termination (Nrc.hlsli:410): training paths also stop by
    # the spread heuristic, handing their suffix to a self-training cache
    # query -- except a pseudorandom "unbiased" subset traced to full length
    # (NrcCommon.h:281-282, proportionUnbiased = 1/16), which anchors the
    # cache against self-training feedback collapse.
    nrc_train_terminate_threshold: float = 0.01
    nrc_unbiased_fraction: float = 0.0625
    # learnIrradiance protocol (the reference's live configuration,
    # DeferredRenderer.cpp:105-106 + NrcCommon.h:126-131): the cache learns
    # albedo/specular-demodulated radiance -- training targets are divided by
    # the record vertex's (F0 + diffuse reflectance) and queries re-modulate
    # by the query vertex's factor (Nrc.hlsli:452).  Texture/material color
    # factors out of the MLP instead of being memorized.  False = learn raw
    # outgoing radiance (A/B knob).
    nrc_learn_irradiance: bool = True
    # Query-pass resolve placement: True = query the cache inline at the
    # handoff vertex inside the bounce scan (round-3 design); False = carry
    # a 17-channel query record through the scan and resolve once after it
    # (the reference's literal structure: query records are buffered and
    # resolved post-trace, radiance_resolve.hlsl:24-32).  Same values up to
    # float add order; the knob exists because the two shapes stress XLA's
    # VMEM memory-space assignment differently (docs/PERFORMANCE.md round 4).
    nrc_inline_resolve: bool = True
    # Unroll the query pass's bounce loop (a Python loop instead of
    # lax.scan).  Tried against the round-4 NRC gather regression: no win
    # (XLA's memory-space assignment declined the tri_fast pin with or
    # without the while loop; the compact-domain reconstruct made it moot).
    # Kept as a knob; costs compile time proportional to max_bounces,
    # identical values.
    nrc_unroll_query: bool = False
    # NRC debug resolve modes, mirroring the reference's visual-inspection
    # views (NrcStructures.h:186-245): None | "bounce_heatmap" (path vertex
    # count) | "query_bounce" (bounce index of cache handoff, -1 = never) |
    # "cache_view" (raw cache prediction at the primary vertex).  Adds an
    # 'nrc_debug' buffer to the frame outputs (ignored under lean_outputs).
    nrc_debug: str | None = None
    # Production/present mode: emit only the displayable image (plus scalar
    # diagnostics) from the jitted frame instead of every G-buffer/debug
    # target -- the reference likewise presents only the backbuffer; debug
    # UAVs are an opt-in (DeferredRenderer.cpp:1301-1361).
    lean_outputs: bool = False
    # Tracer selection: "auto" | "bruteforce" | "bvh" | "pallas"
    tracer: str = "auto"
    # Sort bounce rays by (octant, origin-morton) before traversal -- restores
    # packet coherence for diffuse bounces (tracer/sorting.py)
    sort_rays: bool = True
    # Segment-local sorting/compaction: sorts, compaction gathers, and
    # unsorts run within N/sort_segments-lane segments instead of globally.
    # With segments aligned to a row-sharded device mesh (dist.runner sets
    # sort_segments = mesh size) the whole per-bounce block partitions
    # SHARD-LOCALLY -- no wavefront all-gathers (the scaling hazard
    # dist/stats.py detects for global sorts).  1 = global (single-chip
    # default; the shared per-segment bucket covers the busiest segment, so
    # imbalanced liveness wastes tiles when segmented).
    sort_segments: int = 1
    # Frame-lagged compaction-bucket scheduling (the reference's
    # ComputeIdealTrainingDimensions trick, DeferredRenderer.cpp:110, applied
    # to wavefront compaction): instead of an in-graph live-count lax.switch
    # picking each bounce's compaction bucket (whose conditional
    # serialization costs ~20 ms/bounce at 1080p -- docs/PERFORMANCE.md
    # round 4), the engine reads the PREVIOUS frame's live-lane counts
    # (carried in the frame state) on the host and bakes a static per-vertex
    # bucket schedule into the program.  A schedule change swaps the jitted
    # program (cached per schedule; steady-state frames reuse one program).
    # Buckets are chosen with headroom (engine.renderer SCHEDULE_MARGIN); if
    # the wavefront still outgrows a bucket, the overflowing live lanes read
    # as misses until the NEXT periodic count check re-derives the schedule
    # -- up to bucket_check_every frames of bounded bias (lower it for
    # fast-changing scenes; the reference accepts the same frame-lagged
    # error in its training dims).  Exactness-critical runs (tests,
    # goldens) keep this off.
    bucket_scheduling: bool = False
    # Explicit static schedule (advanced / derived by the engine): one
    # compaction-fraction divisor per path vertex -- entries 0..max_bounces-2
    # for the bounce loop, entry max_bounces-1 for the final NEE shadow
    # trace.  1 = full width (always exact).  None = live-count switch.
    bucket_schedule: tuple | None = None
    # How often (frames) the adaptive scheduler reads the live counts back
    # to the host.  Every readback is a device->host transfer that costs
    # fixed per-call latency on a tunneled runtime (measured ~25 ms/frame
    # when read every frame on v5e-over-tunnel); liveness drifts slowly, so
    # the schedule is re-derived periodically and reused in between.
    bucket_check_every: int = 8
    # Secondary bounces shade with face normals + texture-averaged material
    # values (no per-hit texture fetches) -- large speedup, tiny GI bias
    fast_bounce_shading: bool = False
    # Texture mip selection in the PRIMARY pass from screen-space UV
    # derivatives (core.surface.mip_level_from_uv) -- the raster G-buffer's
    # hardware mips (deferred_gbuffers.hlsl:72-90).  Secondary bounces stay
    # level 0, like the reference's SampleLevel(0) ray-traced fetches.
    texture_mips: bool = True
    # Brute force is faster below this triangle count (whole scene fits VMEM)
    bruteforce_max_tris: int = 4096
    # BVH leaf size: bigger leaves trade sync-heavy node visits for dense
    # packet triangle tests in the Pallas kernel (max 15, encoding limit).
    # Measured on TPU v5e under jit (tools/microbench.py) WITH tri grouping
    # (bvh_tri_group=8): leaf 15 wins (sorted bounce 112 ms vs 148 at the
    # old leaf-4/ungrouped default); without grouping leaf 4 is best.
    bvh_max_leaf: int = 15
    # Triangles per tri-table slot: the leaf loop fetches G triangles per
    # iteration in one wide row (lane-select cost is per total row either
    # way; per-fetch overhead and loop trip count divide by G).  Max leaf
    # count is bvh_tri_group * 15 (slot-count encoding limit).
    bvh_tri_group: int = 8
    # (A second, coarser any-hit tree was measured ~30% faster on synthetic
    # sorted shadow packets but frame-neutral on the bench scene -- in-frame
    # shadow packets are coherent and partially dead -- so the feature was
    # removed; occlusion rays share the closest-hit BVH.)
    # Fat-node width for the Pallas traversal tables: 2 = children-at-parent
    # (one BVH level per visit), 4 = grandchildren-at-node (two levels per
    # visit, ~2x fewer while-loop iterations at slightly more total slab
    # tests).  Applies to the main tree, the any-hit tree, and chunks.
    # Measured on TPU v5e (2M rays, 139k tris, jitted): fat4 beats fat2 on
    # every ray class -- primary closest 69 vs 77 ms, sorted bounce 156 vs
    # 182, sorted shadow any 42 vs 47, fused shadow+bounce 178 vs 206.
    bvh_wide: int = 4
    # The single-table gate is byte-accurate (round 3): past a 160k-tri
    # quick filter the packed fat4 tables are measured against the
    # SINGLE_TABLE_MAX_BYTES budget (80 MB; v5e has 128 MB physical VMEM and
    # _packed_call raises Mosaic's scoped limit when tables need it).  At
    # ~53 B/tri (tri_group=8) that is ~1.5M tris resident -- real Sponza's
    # 262k included.  Beyond it the tables no longer fit VMEM; strategies
    # (all exact, pixels bit-identical on the 247k- and 990k-tri probe
    # scenes):
    #   "subtree": independent VMEM-sized subtree chunks chained with
    #       tightening t caps (pack_bvh_chunks) -- one re-walk per chunk.
    #   "paged": ONE full fat4 table; triangles stay in HBM behind a
    #       demand-paged VMEM cache in the kernel (_tri_groups_paged) --
    #       one walk total, no VMEM size ceiling.
    #   "tri": whole-tree fat4 nodes resident every pass, VMEM-sized
    #       TRIANGLE chunks with static slot-range leaf gating
    #       (pack_bvh_tri_chunks) -- one true-tree walk per chunk.
    #   "auto" (default): subtree when the scene needs <= 3 chunks, paged
    #       beyond.  Measured on TPU v5e 1080p frames: 247k tris (2 chunks)
    #       subtree 395 ms < paged 415 < tri 460; 990k tris (16 chunks)
    #       paged 462 ms < subtree 552.  Chunk re-walk cost scales with the
    #       chunk count while paged pays one walk + miss DMAs, so paged
    #       wins once the table is a few times the VMEM budget.
    chunk_mode: str = "auto"


if struct is not None:

    @struct.dataclass
    class SunLight:
        """Differentiable lighting parameters (a JAX pytree)."""

        direction: object  # [3] unit vector toward the sun
        radiance: object  # [3] W/sr/m^2
        tan_half_angle: object  # scalar, sun disk angular radius
        sky_color: object  # [3] constant sky radiance

        @staticmethod
        def default(xp=np):
            d = xp.asarray([0.35, 0.8, 0.45], xp.float32)
            d = d / xp.sqrt((d * d).sum())
            return SunLight(
                direction=d,
                radiance=xp.asarray([10.0, 9.5, 9.0], xp.float32),
                tan_half_angle=xp.asarray(0.00465, xp.float32),  # ~0.53 deg sun
                sky_color=xp.asarray([0.3, 0.45, 0.7], xp.float32),
            )

else:  # pragma: no cover

    @dataclass
    class SunLight:
        direction: np.ndarray = field(default_factory=lambda: np.array([0.35, 0.8, 0.45]))
        radiance: np.ndarray = field(default_factory=lambda: np.array([10.0, 9.5, 9.0]))
        tan_half_angle: float = 0.00465
        sky_color: np.ndarray = field(default_factory=lambda: np.array([0.3, 0.45, 0.7]))
