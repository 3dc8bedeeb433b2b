"""Frame-lagged compaction-bucket scheduling (engine.renderer).

The scheduled program pins each path vertex's compaction bucket statically
(no live-count lax.switch).  Exactness contract: when the scheduled bucket
covers the live count, pixels are bit-identical to the switch program
(the bucket only determines how much dead tail is dispatched; traversal is
per-lane exact) -- pinned here against the default renderer.
"""

from __future__ import annotations

import numpy as np
import pytest

from nebulae_tpu.config import RenderConfig


def _cornell_cam(scene):
    from nebulae_tpu.core.camera import Camera

    lo, hi = scene.flat.aabb_min, scene.flat.aabb_max
    center = (lo + hi) * 0.5
    return Camera(
        eye=center + np.array([0, 0, 2.6 * float((hi - lo).max())], np.float32),
        target=center,
    )


BASE = dict(
    width=64, height=64, max_bounces=4, enable_svgf=False,
    enable_tonemap=False, tracer="bvh",
)


def test_derive_bucket_schedule_margins():
    from nebulae_tpu.engine.renderer import derive_bucket_schedule
    from nebulae_tpu.tracer.sorting import _frac_to_bucket

    n = 1 << 20
    # tiny counts -> smallest bucket (n/64); near-full -> full width
    sched = derive_bucket_schedule([100, n // 6, n // 2, n], n)
    assert sched[0] == 64
    assert sched[1] == 4  # n/6 fits n/4 with margin
    assert sched[2] == 1 and sched[3] == 1
    # margin: a count just above SCHEDULE_MARGIN * bucket must bump a size
    from nebulae_tpu.engine.renderer import SCHEDULE_MARGIN

    b16 = _frac_to_bucket(16, n)
    assert derive_bucket_schedule([int(SCHEDULE_MARGIN * b16) + 1], n)[0] == 4
    assert derive_bucket_schedule([int(SCHEDULE_MARGIN * b16) - 1], n)[0] == 16
    # segment-local: fractions apply to the per-segment lane count
    assert derive_bucket_schedule([100], n, segments=4)[0] == 64


def test_scheduled_matches_exact(cornell_scene):
    """Adaptive scheduling: frame 0 (full-width bootstrap) and frame 1+
    (derived schedule) are bit-identical to the switch program's frames."""
    from nebulae_tpu.engine.renderer import Renderer

    cam = _cornell_cam(cornell_scene)
    r_exact = Renderer(cornell_scene.flat, RenderConfig(**BASE))
    r_sched = Renderer(
        cornell_scene.flat, RenderConfig(**BASE, bucket_scheduling=True)
    )
    for frame in range(3):
        a = np.asarray(r_exact.render(cam)["hdr"])
        b = np.asarray(r_sched.render(cam)["hdr"])
        np.testing.assert_array_equal(a, b, err_msg=f"frame {frame}")
    counts = np.asarray(r_sched.state["live_counts"])
    assert counts.shape == (4,) and counts[0] > 0
    # steady state reuses one scheduled program (bootstrap + 1)
    assert len(r_sched._sched_jits) == 2


def test_scheduled_segmented_matches(cornell_scene):
    """Scheduling composes with segment-local sorting (the sharded config):
    pixels match the unscheduled segmented render."""
    from nebulae_tpu.engine.renderer import Renderer

    cam = _cornell_cam(cornell_scene)
    cfg = RenderConfig(**BASE, sort_segments=4)
    r_exact = Renderer(cornell_scene.flat, cfg)
    from dataclasses import replace

    r_sched = Renderer(cornell_scene.flat, replace(cfg, bucket_scheduling=True))
    for _ in range(2):
        a = np.asarray(r_exact.render(cam)["hdr"])
        b = np.asarray(r_sched.render(cam)["hdr"])
        np.testing.assert_array_equal(a, b)


def test_scheduled_nrc_query(cornell_scene):
    """The NRC query pass honors the schedule: NRC frames match the exact
    NRC renderer and report live counts."""
    from nebulae_tpu.engine.renderer import Renderer

    cam = _cornell_cam(cornell_scene)
    cfg = RenderConfig(**BASE, enable_nrc=True, nrc_max_path_vertices=4)
    r_exact = Renderer(cornell_scene.flat, cfg)
    from dataclasses import replace

    r_sched = Renderer(cornell_scene.flat, replace(cfg, bucket_scheduling=True))
    for _ in range(3):
        a = np.asarray(r_exact.render(cam)["hdr"])
        b = np.asarray(r_sched.render(cam)["hdr"])
        np.testing.assert_array_equal(a, b)
    assert np.asarray(r_sched.state["live_counts"]).sum() > 0


def test_explicit_schedule_overflow_is_bounded(cornell_scene):
    """A deliberately undersized static bucket drops overflowing live lanes
    to miss records -- the image stays finite and differs boundedly (the
    one-frame-lag failure mode the margin exists to avoid)."""
    from nebulae_tpu.engine.renderer import Renderer

    cam = _cornell_cam(cornell_scene)
    r_exact = Renderer(cornell_scene.flat, RenderConfig(**BASE))
    exact = np.asarray(r_exact.render(cam)["hdr"])
    # 64x64 = 4096 lanes; bucket floor is 1024 lanes so fraction 64 -> 1024.
    # Bounce-0 liveness in the Cornell interior (~600 of 4096) FITS 1024, so
    # even this aggressive schedule stays exact here; assert finite + close.
    r_forced = Renderer(
        cornell_scene.flat,
        RenderConfig(**BASE, bucket_schedule=(64, 64, 64, 64)),
    )
    forced = np.asarray(r_forced.render(cam)["hdr"])
    assert np.isfinite(forced).all()
    np.testing.assert_array_equal(forced, exact)


def test_update_config_toggles_scheduling(cornell_scene):
    from dataclasses import replace

    from nebulae_tpu.engine.renderer import Renderer

    cam = _cornell_cam(cornell_scene)
    r = Renderer(cornell_scene.flat, RenderConfig(**BASE))
    r.render(cam)
    r.update_config(replace(r.cfg, bucket_scheduling=True))
    assert "live_counts" in r.state
    out = r.render(cam)
    assert np.isfinite(np.asarray(out["hdr"])).all()
    r.update_config(replace(r.cfg, bucket_scheduling=False))
    assert "live_counts" not in r.state
    out = r.render(cam)
    assert np.isfinite(np.asarray(out["hdr"])).all()
